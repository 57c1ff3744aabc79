package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}
import graft.operators.QueryRunner

/**
 * RESTORE ([[MergeSnapshotStore.restore]]): rewind a table to a
 * committed-and-retained version as a NEW metadata-only commit — the
 * Delta `RESTORE TABLE` / Iceberg rollback story. Pins: the restored
 * read equals the target version's read; the commit republishes the
 * target's file references VERBATIM (no data job, no new data dir);
 * the rewind is itself history (the change feed across it is the undo
 * delta, and restore-to-head is a no-op); expired targets and racing
 * commits refuse loudly; restoring across a rebucket rewinds the
 * bucket count; merge-on-read state (sidecars) restores with the
 * manifest. The SQL dialect statement routes through
 * [[QueryRunner.dml]].
 */
class RestoreSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(keep: Int = 10): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 4,
      keepVersions = keep, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String,
                       pk: Seq[String] = Seq("id")): TableMeta = {
    val meta = TableMeta("rdb", tbl,
      Files.createTempDirectory(s"graft-restore-$tbl").toString,
      primaryKey = pk)
    store.catalog.register(meta)
    meta
  }

  private def frame(n: Int = 96): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i.toLong, s"c${i % 4}"))
      .toDF("id", "v", "cls")
  }

  private def assertExact(got: DataFrame, want: DataFrame): Unit =
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0, "result drifted")

  test("restore rewinds to the target snapshot as a new metadata-only commit") {
    val store = mkStore()
    register(store, "t")
    store.overwrite("rdb", "t", frame())
    val v0 = store.latestVersion("rdb", "t")
    val want = store.read("rdb", "t").collect().toSeq
    store.deleteWhere("rdb", "t", col("cls") === "c1")
    store.updateWhere("rdb", "t", col("cls") === "c2",
      Map("v" -> lit(-1L)))
    val head = store.latestVersion("rdb", "t")
    assert(head == v0 + 2)
    val restored = store.restore("rdb", "t", v0)
    assert(restored == head + 1, "the rewind is itself a commit")
    assert(store.read("rdb", "t").collect().toSeq.sortBy(_.getLong(0)) ==
      want.sortBy(_.getLong(0)))
    // METADATA-ONLY: the restored manifest re-references the target's
    // data directories verbatim — no new data dir was written
    assert(store.manifestEntries("rdb", "t", restored) ==
      store.manifestEntries("rdb", "t", v0),
      "restore must republish the target's file references, not rewrite")
    // the rewind closes the loop in the change feed: snapshot(restored)
    // == snapshot(v0), so the diff across the pair is empty…
    assert(store.changesBetween("rdb", "t", v0, restored).isEmpty)
    // …and the feed across the undone span is the exact undo delta
    val undo = store.changesBetween("rdb", "t", head, restored)
    assert(undo.filter(col("change") === "I").count() > 0,
      "undoing a delete re-inserts the deleted keys")
  }

  test("restore to the current head is a no-op (no version consumed)") {
    val store = mkStore()
    register(store, "t")
    store.overwrite("rdb", "t", frame())
    store.deleteWhere("rdb", "t", col("cls") === "c3")
    val head = store.latestVersion("rdb", "t")
    assert(store.restore("rdb", "t", head) == head)
    assert(store.latestVersion("rdb", "t") == head)
  }

  test("restore refuses an expired (vacuumed) target loudly") {
    val store = mkStore(keep = 2)
    register(store, "t")
    store.overwrite("rdb", "t", frame())
    val v0 = store.latestVersion("rdb", "t")
    store.overwrite("rdb", "t", frame().filter(col("id") < 50))
    store.overwrite("rdb", "t", frame().filter(col("id") < 25))
    store.overwrite("rdb", "t", frame().filter(col("id") < 10))
    val ex = intercept[IllegalArgumentException] {
      store.restore("rdb", "t", v0)
    }
    assert(ex.getMessage.contains("not committed/retained"),
      s"wanted the retention refusal, got: ${ex.getMessage}")
  }

  test("restore refuses rather than clobber a racing commit") {
    val store = mkStore()
    register(store, "t")
    store.overwrite("rdb", "t", frame())
    val v0 = store.latestVersion("rdb", "t")
    store.deleteWhere("rdb", "t", col("cls") === "c0")
    // a writer lands between the restore's read and its publish
    store.beforePublish = () =>
      store.updateWhere("rdb", "t", col("id") === 7L, Map("v" -> lit(777L)))
    intercept[java.util.ConcurrentModificationException] {
      store.restore("rdb", "t", v0)
    }
    // the racing commit survives untouched
    assert(store.read("rdb", "t").filter(col("id") === 7L)
      .select("v").head().getLong(0) == 777L)
    // and a re-run against the new head succeeds
    val again = store.restore("rdb", "t", v0)
    assert(store.read("rdb", "t").count() == 96)
    assert(again == store.latestVersion("rdb", "t"))
  }

  test("restore across a rebucket rewinds the bucket count with the data") {
    val store = mkStore()
    register(store, "t")
    store.overwrite("rdb", "t", frame())
    val v0 = store.latestVersion("rdb", "t")
    store.rebucket("rdb", "t", 8)
    val want = frame().collect().toSeq.sortBy(_.getLong(0))
    val restored = store.restore("rdb", "t", v0)
    assert(store.read("rdb", "t").collect().toSeq.sortBy(_.getLong(0)) == want)
    assert(store.manifestEntries("rdb", "t", restored).size == 4,
      "the restored manifest carries the pre-rebucket modulus")
    // the catalog property followed the rewind: a row-level write under
    // the restored modulus works (it would refuse on a count mismatch)
    store.deleteWhere("rdb", "t", col("id") === 0L)
    assert(store.read("rdb", "t").count() == 95)
  }

  test("merge-on-read state restores with the manifest") {
    val store = mkStore()
    register(store, "t")
    store.overwrite("rdb", "t", frame())
    store.deleteWhere("rdb", "t", col("cls") === "c1",
      MergeSnapshotStore.MergeOnRead)
    val vMor = store.latestVersion("rdb", "t")
    val wantMasked = store.read("rdb", "t").collect().toSeq
      .sortBy(_.getLong(0))
    // a compact clears the sidecar; the restore brings it back
    store.compact("rdb", "t", targetFiles = 2)
    assert(store.manifestDeletes("rdb", "t",
      store.latestVersion("rdb", "t")).isEmpty)
    val restored = store.restore("rdb", "t", vMor)
    assert(store.manifestDeletes("rdb", "t", restored).size == 1,
      "the restored manifest carries the sidecar line")
    assert(store.read("rdb", "t").collect().toSeq.sortBy(_.getLong(0)) ==
      wantMasked, "the sidecar must mask after the rewind exactly as at " +
        "the target version")
  }

  test("RESTORE TABLE / OPTIMIZE statements dispatch through dml") {
    val store = mkStore()
    val runner = new QueryRunner(store)
    register(store, "t")
    store.overwrite("rdb", "t", frame())
    val v0 = store.latestVersion("rdb", "t")
    val want = store.read("rdb", "t").collect().toSeq.sortBy(_.getLong(0))
    runner.dml("rdb", "DELETE FROM t WHERE cls = 'c2'")
    val got = runner.dml("rdb", s"RESTORE TABLE t TO VERSION AS OF $v0")
    assert(got == store.latestVersion("rdb", "t").toLong,
      "RESTORE returns the new head version")
    assert(store.read("rdb", "t").collect().toSeq.sortBy(_.getLong(0)) == want)
    // OPTIMIZE bin-packs without changing answers; ZORDER BY clusters
    val vOpt = runner.dml("rdb", "OPTIMIZE t")
    assert(vOpt == store.latestVersion("rdb", "t").toLong)
    assert(store.read("rdb", "t").collect().toSeq.sortBy(_.getLong(0)) == want)
    val vZ = runner.dml("rdb", "OPTIMIZE rdb.t ZORDER BY (v)")
    assert(vZ == vOpt + 1)
    assert(store.read("rdb", "t").collect().toSeq.sortBy(_.getLong(0)) == want)
    // a db-qualified name bound to the wrong db refuses
    intercept[IllegalArgumentException] {
      runner.dml("rdb", s"RESTORE TABLE other.t TO VERSION AS OF $v0")
    }
  }
}
