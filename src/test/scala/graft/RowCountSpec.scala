package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}

/**
 * Manifest row counts ([[MergeSnapshotStore.countRows]] /
 * `manifestRowCount`): per-file counts ride the stats lift, so
 * `count(*)` is a driver-side sum — ZERO Spark jobs — whenever the
 * manifest can answer exactly. Pins: parity with the real count across
 * overwrite / CoW delete / scoped merge / clone; the fast path runs
 * job-free; merge-on-read sidecars force the honest scan fallback
 * (masked counts are not safely subtractable) until a fold clears
 * them; stats-disabled tables fall back; a version pin counts the
 * pinned snapshot.
 */
class RowCountSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 4,
      keepVersions = 8, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String,
                       props: Map[String, String] = Map.empty): TableMeta = {
    val meta = TableMeta("ndb", tbl,
      Files.createTempDirectory(s"graft-cnt-$tbl").toString,
      primaryKey = Seq("id"), properties = props)
    store.catalog.register(meta)
    meta
  }

  private def frame(n: Int = 96): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i.toLong, s"c${i % 4}"))
      .toDF("id", "v", "cls")
  }

  private def jobFree[A](body: => A): A = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val sc = spark.sparkContext
    org.apache.spark.GraftListenerBusAccess.waitUntilEmpty(sc)
    sc.addSparkListener(l)
    try {
      val out = body
      org.apache.spark.GraftListenerBusAccess.waitUntilEmpty(sc)
      assert(jobs.get() == 0,
        s"the manifest count fast path launched ${jobs.get()} Spark job(s)")
      out
    } finally sc.removeSparkListener(l)
  }

  test("count(*) is a job-free manifest sum across the commit paths") {
    val store = mkStore()
    register(store, "t")
    store.overwrite("ndb", "t", frame())
    assert(jobFree(store.countRows("ndb", "t")) == 96L)
    val v0 = store.latestVersion("ndb", "t")
    // CoW delete: touched buckets re-counted at their rewrite
    store.deleteWhere("ndb", "t", col("cls") === "c1")
    assert(jobFree(store.countRows("ndb", "t")) == 72L)
    // scoped merge: carried files keep their lines, the rewritten
    // bucket's fresh files record theirs
    store.mergeScoped("ndb", "t",
      frame().filter(col("id") < 2).select("id")) { old =>
      old.withColumn("v", col("v") + 1L)
    }
    assert(jobFree(store.countRows("ndb", "t")) == 72L)
    assert(store.countRows("ndb", "t") == store.read("ndb", "t").count())
    // a version pin counts the pinned snapshot
    assert(jobFree(store.countRows("ndb", "t", Some(v0))) == 96L)
  }

  test("merge-on-read debt: the fresh-takedown window subtracts job-free") {
    val store = mkStore()
    register(store, "t")
    store.overwrite("ndb", "t", frame())
    store.deleteWhere("ndb", "t", col("cls") === "c2",
      MergeSnapshotStore.MergeOnRead)
    // the takedown-heavy table's common state — fresh sidecar, nothing
    // else since — answers count(*) by subtracting the recorded masked
    // counts, still without a job
    assert(store.manifestRowCount("ndb", "t").contains(72L),
      "a fresh sidecar window is provably subtractable")
    assert(jobFree(store.countRows("ndb", "t")) == 72L)
    // a second stacked takedown stays in the window (finds ran on the
    // logical view, so the counts are disjoint)
    store.deleteWhere("ndb", "t", col("id") === 0L,
      MergeSnapshotStore.MergeOnRead)
    assert(jobFree(store.countRows("ndb", "t")) == 71L)
    // …but a scoped REWRITE after the sidecars closes it: new files
    // postdate the sidecars (re-inserted keys would be exempt, dropped
    // masked rows would double-subtract), so the honest scan takes over
    store.deleteWhere("ndb", "t", col("id") === 1L) // CoW: one bucket
    assert(store.manifestRowCount("ndb", "t").isEmpty,
      "past the window the manifest count must refuse")
    assert(store.countRows("ndb", "t") == 70L, "the fallback is exact")
    store.compactDebt("ndb", "t")
    assert(jobFree(store.countRows("ndb", "t")) == 70L,
      "folding the debt restores the unconditional fast path")
  }

  test("a clone's borrowed files keep their counts") {
    val store = mkStore()
    register(store, "src")
    store.overwrite("ndb", "src", frame())
    store.cloneTable("ndb", "src", "ndb", "dst",
      Files.createTempDirectory("graft-cnt-clone").toString + "/t")
    assert(jobFree(store.countRows("ndb", "dst")) == 96L)
  }

  test("the files metadata table describes exactly what a scan would read") {
    val store = mkStore()
    val src = register(store, "src")
    store.overwrite("ndb", "src", frame())
    store.deleteWhere("ndb", "src", col("cls") === "c0")
    val files = store.filesOf("ndb", "src")
    // recorded rows sum to the manifest count; every file is native
    assert(files.agg(sum("rows")).head().getLong(0) ==
      store.countRows("ndb", "src"))
    assert(files.filter(col("borrowed") || col("carried")).count() == 0)
    assert(files.filter(col("bytes") <= 0L).count() == 0)
    // a clone's view marks every file borrowed…
    store.cloneTable("ndb", "src", "ndb", "dst",
      Files.createTempDirectory("graft-cnt-files").toString + "/t")
    val cloneFiles = store.filesOf("ndb", "dst")
    assert(cloneFiles.count() == files.count() &&
      cloneFiles.filter(!col("borrowed")).count() == 0)
    // …until a scoped write lands native files for the touched bucket
    store.deleteWhere("ndb", "dst", col("id") === 3L)
    val after = store.filesOf("ndb", "dst")
    assert(after.filter(!col("borrowed")).count() > 0 &&
      after.filter(col("borrowed")).count() > 0)
    assert(after.agg(sum("rows")).head().getLong(0) ==
      store.countRows("ndb", "dst"))
    // a partial debt fold's survivors surface as carried file lines
    val meta2 = TableMeta("ndb", "pkless",
      Files.createTempDirectory("graft-cnt-fold").toString)
    store.catalog.register(meta2)
    store.overwrite("ndb", "pkless",
      frame().repartitionByRange(4, col("v")))
    store.deleteWhere("ndb", "pkless", col("v") < 8L,
      MergeSnapshotStore.MergeOnRead)
    store.compactDebt("ndb", "pkless")
    assert(store.filesOf("ndb", "pkless")
      .filter(col("carried")).count() > 0)
  }

  test("stats-disabled tables fall back to the scan, exactly") {
    val store = mkStore()
    register(store, "t", props = Map(MergeSnapshotStore.StatsProp -> "false"))
    store.overwrite("ndb", "t", frame())
    assert(store.manifestRowCount("ndb", "t").isEmpty)
    assert(store.countRows("ndb", "t") == 96L)
  }
}
