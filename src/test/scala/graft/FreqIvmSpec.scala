package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}
import graft.operators.{Ivm, Scd}

/**
 * Frequent-items sketch maintenance: per-group heavy hitters with
 * maxMapSize-bounded state, exact while no purge has happened,
 * NO_FALSE_NEGATIVES with deterministic count bounds past it, U/D
 * refusal — the third maintained-dashboard sketch beside HLL and KLL.
 */
class FreqIvmSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 4,
      keepVersions = 2, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String,
                       pk: String): Unit =
    store.catalog.register(TableMeta("fdb", tbl,
      Files.createTempDirectory(s"graft-freq-$tbl").toString,
      primaryKey = Seq(pk)))

  /** Skewed items: item w<j> appears with multiplicity tied to j, so
   * the exact per-group counts are hand-derivable. */
  private def snap(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"g${i % 2}", s"w${(i * i) % 7}"))
      .toDF("id", "grp_in", "item")
  }

  private def canon(df: DataFrame): Set[(String, String, Long)] =
    df.select("grp", "item", "est").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  private def exact(df: DataFrame): Set[(String, String, Long)] =
    df.groupBy(col("grp_in").as("grp"), col("item"))
      .agg(count(lit(1)).as("est")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("append-only commits: maintained == rebuild == exact counts (no purge)") {
    val store = mkStore()
    register(store, "ev", "id")
    register(store, "ev_fi", "grp")
    val m = new Ivm.MaintainedAggregates(store, "fdb", "ev",
      Seq(Ivm.freqItemsSpec("ev_fi", col("grp_in"), col("item"),
        maxMapSize = 64)))
    m.seed(snap(50))
    var prev = 50
    for (n <- Seq(120, 240)) {
      m.commit(Scd.snapshotDiff(snap(prev), snap(n), Seq("id")))
      prev = n
      val base = store.read("fdb", "ev")
      val rebuilt = Ivm.freqItemsSpec("x", col("grp_in"), col("item"),
        maxMapSize = 64).seed(base)
      assert(canon(Ivm.freqTopItems(m.read("ev_fi"))) ==
        canon(Ivm.freqTopItems(rebuilt)),
        "maintained heavy hitters drifted from a scratch rebuild")
      assert(canon(Ivm.freqTopItems(m.read("ev_fi"))) == exact(base),
        "exact-regime estimates must BE the per-group item counts")
    }
  }

  test("a changelog with U/D rows refuses loudly; insert-only folds fine") {
    import spark.implicits._
    val spec = Ivm.freqItemsSpec("t", col("grp_in"), col("item"))
    val agg0 = spec.seed(snap(20))
    val bad = Seq(("D", 3L, "g0", "w1"), ("I", 99L, "g1", "w2"))
      .toDF("change", "id", "grp_in", "item")
    // detection rides the delta aggregation (no separate probe action),
    // so standalone the refusal surfaces when the fold is ACTED on
    val err = intercept[Exception] {
      spec.fold(agg0, snap(20), snap(20), bad, Seq("id")).collect()
    }
    assert(chainMessages(err).contains("APPEND-ONLY"))
    val ok = Seq(("I", 99L, "g9", "w0"), ("I", 100L, "g9", "w0"))
      .toDF("change", "id", "grp_in", "item")
    val folded = spec.fold(agg0, snap(20), snap(20), ok, Seq("id"))
    val tops = canon(Ivm.freqTopItems(folded))
    assert(tops.contains(("g9", "w0", 2L)), s"new group must adopt: $tops")
    assert(canon(Ivm.freqTopItems(folded.filter(col("grp") =!= "g9"))) ==
      canon(Ivm.freqTopItems(agg0)),
      "untouched groups must keep their sketches verbatim")
  }

  test("past the purge point: no false negatives and bounds contain the truth") {
    import spark.implicits._
    // 600 distinct items at maxMapSize=64 forces purges; one true heavy
    // hitter (20% of the stream) must survive with lb <= true <= ub
    val rows = (0 until 50000).map { i =>
      val item = if (i % 5 == 0) "HOT" else s"cold${i % 600}"
      (i.toLong, "g", item)
    }.toDF("id", "grp_in", "item")
    val spec = Ivm.freqItemsSpec("t", col("grp_in"), col("item"),
      maxMapSize = 64)
    val got = Ivm.freqTopItems(spec.seed(rows))
      .filter(col("item") === "HOT").collect()
    assert(got.length == 1, "the 20% item can never be purged to zero")
    val (est, lb, ub) = (got.head.getAs[Long]("est"),
      got.head.getAs[Long]("lb"), got.head.getAs[Long]("ub"))
    assert(lb <= 10000L && 10000L <= ub && est >= lb && est <= ub,
      s"bounds must contain the true count 10000: est=$est lb=$lb ub=$ub")
  }

  test("shard roll-up: merged shard sketches match the one-pass sketch (exact regime)") {
    import spark.implicits._
    import graft.functions.FreqSketchExpressions.{freqAgg, freqItems, freqMergeAgg}
    val corpus = (0 until 400).map(i => (i % 4, s"w${i % 9}"))
      .toDF("shard", "item")
    val rolled = corpus.groupBy("shard")
      .agg(freqAgg(col("item"), 64).as("sk"))
      .agg(freqMergeAgg(col("sk"), 64).as("sk"))
      .select(explode(freqItems(col("sk"))).as("r"))
      .select("r.item", "r.est").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = corpus.agg(freqAgg(col("item"), 64).as("sk"))
      .select(explode(freqItems(col("sk"))).as("r"))
      .select("r.item", "r.est").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rolled == direct, s"roll-up drifted: $rolled vs $direct")
  }
}
