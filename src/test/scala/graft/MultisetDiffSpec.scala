package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}

/**
 * The PK-less change feed ([[MergeSnapshotStore.multisetChangesBetween]]):
 * the exact multiset delta between two retained versions — the only
 * what-changed a table without row identity can give, and the one a
 * takedown audit on a raw shard store needs. Pinned: exact I/D copy
 * counts incl. partial-copy deltas, null cells as part of the row
 * image, the replay property (from-multiset + delta = to-multiset),
 * and loud refusals across schema eras.
 */
class MultisetDiffSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 4,
      keepVersions = 4, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String): TableMeta = {
    val meta = TableMeta("xdb", tbl,
      Files.createTempDirectory(s"graft-msdiff-$tbl").toString) // NO PK
    store.catalog.register(meta)
    meta
  }

  private def feed(df: DataFrame): Set[(String, Any, String, Long)] =
    df.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) null else r.getLong(1),
      r.getString(2), r.getLong(3))).toSet

  test("exact multiset delta: partial-copy changes, null row images") {
    import spark.implicits._
    val store = mkStore()
    register(store, "m")
    store.overwrite("xdb", "m",
      Seq(("a", Some(1L)), ("a", Some(1L)), ("a", Some(1L)),
        ("b", Some(2L)), ("n", None))
        .toDF("k", "v"))
    val v0 = store.latestVersion("xdb", "m")
    store.overwrite("xdb", "m",
      Seq(("a", Some(1L)), ("b", Some(2L)), ("b", Some(2L)),
        ("c", Some(3L)), ("n", None), ("n", None))
        .toDF("k", "v"))
    val v1 = store.latestVersion("xdb", "m")
    val d = store.multisetChangesBetween("xdb", "m", v0, v1)
    assert(d.columns.toSeq == Seq("k", "v", "change", "copies"))
    assert(feed(d) == Set(
      ("a", 1L, "D", 2L),   // 3 copies -> 1
      ("b", 2L, "I", 1L),   // 1 -> 2
      ("c", 3L, "I", 1L),   // new image
      ("n", null, "I", 1L)  // the NULL-celled image gained a copy
    ), s"got ${feed(d)}")
    // unchanged images never appear
    assert(d.filter(col("k") === "a" && col("change") === "I").isEmpty)
  }

  test("takedown audit: a MoR position delete reads as a pure-D copy-exact feed") {
    import spark.implicits._
    val store = mkStore()
    register(store, "t")
    // duplicate physical rows — the shape where the keyed diff would be
    // simply wrong and copy counts are the whole point
    store.overwrite("xdb", "t",
      Seq(("x", 1L), ("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L), ("z", 9L))
        .toDF("k", "v"))
    val v0 = store.latestVersion("xdb", "t")
    assert(store.deleteWhere("xdb", "t", col("v") < 5L,
      MergeSnapshotStore.MergeOnRead) == 5L)
    val v1 = store.latestVersion("xdb", "t")
    val d = store.multisetChangesBetween("xdb", "t", v0, v1)
    assert(feed(d) == Set(("x", 1L, "D", 3L), ("y", 2L, "D", 2L)),
      s"got ${feed(d)}")
    // replay property: from-multiset folded through the delta equals
    // the to-multiset exactly
    def multi(df: DataFrame): Map[(String, Long), Long] =
      df.groupBy("k", "v").count().collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val from = multi(store.readVersion(store.catalog("xdb", "t"), v0))
    val folded = d.collect().foldLeft(from) { (m, r) =>
      val key = (r.getString(0), r.getLong(1))
      val delta = if (r.getString(2) == "I") r.getLong(3) else -r.getLong(3)
      val n = m.getOrElse(key, 0L) + delta
      if (n == 0L) m - key else m + (key -> n)
    }
    assert(folded == multi(store.readVersion(store.catalog("xdb", "t"), v1)))
  }

  test("refusals: the keyed diff points PK-less callers here; schema eras don't mix") {
    import spark.implicits._
    val store = mkStore()
    register(store, "nk")
    store.overwrite("xdb", "nk", Seq(("a", 1L)).toDF("k", "v"))
    val e = intercept[IllegalStateException] {
      store.changesBetween("xdb", "nk", 0, 0)
    }
    assert(e.getMessage.contains("multisetChangesBetween"),
      "the keyed diff's refusal must name the PK-less feed")
    register(store, "evo")
    store.overwrite("xdb", "evo", Seq(("a", 1L)).toDF("k", "v"))
    val v0 = store.latestVersion("xdb", "evo")
    store.overwrite("xdb", "evo",
      Seq(("a", 1L, "x")).toDF("k", "v", "extra"))
    val v1 = store.latestVersion("xdb", "evo")
    val e2 = intercept[IllegalArgumentException] {
      store.multisetChangesBetween("xdb", "evo", v0, v1)
    }
    assert(e2.getMessage.contains("schema era"))
  }
}
