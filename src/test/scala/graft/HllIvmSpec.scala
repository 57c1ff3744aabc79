package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}
import graft.operators.{Ivm, Scd}

/**
 * HLL-sketch maintained distinct counts: per-group state is one sketch
 * (never value-cardinality rows), the fold is a delta-sized sketch
 * union, maintained estimates equal rebuild estimates exactly (union is
 * per-register max — state depends only on the value SET), and a
 * changelog carrying U/D rows refuses loudly because no HLL can
 * subtract.
 */
class HllIvmSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 4,
      keepVersions = 2, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String,
                       pk: String): Unit =
    store.catalog.register(TableMeta("hdb", tbl,
      Files.createTempDirectory(s"graft-hll-$tbl").toString,
      primaryKey = Seq(pk)))

  private def snap(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"g${i % 3}", (i * 7 % 97).toLong))
      .toDF("id", "grp_in", "v")
  }

  private def canon(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("append-only commits: maintained == rebuild == exact (coupon regime)") {
    val store = mkStore()
    register(store, "ev", "id")
    register(store, "ev_hll", "grp")
    val m = new Ivm.MaintainedAggregates(store, "hdb", "ev",
      Seq(Ivm.hllDistinctSpec("ev_hll", col("grp_in"), col("v"))))
    m.seed(snap(40))
    var prev = 40
    for (n <- Seq(80, 120)) {
      m.commit(Scd.snapshotDiff(snap(prev), snap(n), Seq("id")))
      prev = n
      val base = store.read("hdb", "ev")
      val rebuilt = Ivm.hllDistinctSpec("x", col("grp_in"), col("v"))
        .seed(base)
      assert(canon(Ivm.hllDistinctCount(m.read("ev_hll"))) ==
        canon(Ivm.hllDistinctCount(rebuilt)),
        "maintained sketch estimates drifted from a scratch rebuild")
      // <=97 distinct per group: the sketch is still coupon-exact, so
      // the estimates ARE the exact distinct counts
      val exact = base.groupBy("grp_in")
        .agg(countDistinct(col("v")).as("dcnt"))
      assert(canon(Ivm.hllDistinctCount(m.read("ev_hll"))) == canon(exact))
    }
  }

  test("a changelog with U/D rows refuses loudly; base sketch untouched") {
    import spark.implicits._
    val spec = Ivm.hllDistinctSpec("t", col("grp_in"), col("v"))
    assert(spec.appendOnly, "sketch specs must declare append-only so the " +
      "registry can refuse U/D batches before anything commits")
    val agg0 = spec.seed(snap(10))
    val bad = Seq(("D", 3L, "g0", 21L), ("I", 99L, "g1", 5L))
      .toDF("change", "id", "grp_in", "v")
    // detection rides the delta aggregation (no separate probe action),
    // so standalone the refusal surfaces when the fold is ACTED on
    val err = intercept[Exception] {
      spec.fold(agg0, snap(10), snap(10), bad, Seq("id")).collect()
    }
    assert(chainMessages(err).contains("APPEND-ONLY"))
    // column pruning must not bypass it: a consumer keeping only the
    // group keys still trips the refusal (it rides the JOIN KEY, which
    // no projection can prune)
    val err2 = intercept[Exception] {
      spec.fold(agg0, snap(10), snap(10), bad, Seq("id"))
        .select("grp").collect()
    }
    assert(chainMessages(err2).contains("APPEND-ONLY"))
    // insert-only folds fine and the new group appears
    val ok = Seq(("I", 99L, "g9", 5L)).toDF("change", "id", "grp_in", "v")
    val folded = spec.fold(agg0, snap(10), snap(10), ok, Seq("id"))
    val cnt = canon(Ivm.hllDistinctCount(folded))
    assert(cnt("g9") == 1L)
  }

  test("sketch folds are pure plan builders: zero Spark jobs launched") {
    // The U/D refusal must ride the delta aggregation itself — the old
    // shape ran a separate limit(1)-probe ACTION per sketch per batch,
    // which at N maintained sketches is N extra jobs every micro-batch.
    // Pin the contract: invoking all three sketch folds builds plans
    // and launches NOTHING; the refusal (previous test) then fires with
    // the fold's own materializing action.
    import spark.implicits._
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
      val base = snap(10)
      val chg = Seq(("I", 99L, "g9", 5L)).toDF("change", "id", "grp_in", "v")
      val specs = Seq(
        Ivm.hllDistinctSpec("t", col("grp_in"), col("v")),
        Ivm.kllQuantileSpec("t", col("grp_in"), col("v").cast("double")),
        Ivm.freqItemsSpec("t", col("grp_in"), col("v")))
      val folded = specs.map { s =>
        s.fold(s.seed(base), base, base, chg, Seq("id"))
      }
      org.apache.spark.GraftListenerBusAccess.waitUntilEmpty(sc)
      assert(jobs.get() == 0,
        s"building ${specs.size} sketch folds launched ${jobs.get()} " +
          "Spark job(s) — a per-sketch probe action is back")
      // the plans are real: each materializes cleanly in its own action
      folded.foreach(f => assert(f.count() > 0))
    } finally sc.removeSparkListener(l)
  }

  test("registry refuses a U/D batch up front — before the base commits") {
    import spark.implicits._
    val store = mkStore()
    register(store, "ev2", "id")
    register(store, "ev2_hll", "grp")
    val m = new Ivm.MaintainedAggregates(store, "hdb", "ev2",
      Seq(Ivm.hllDistinctSpec("ev2_hll", col("grp_in"), col("v"))))
    m.seed(snap(10))
    val v0 = store.latestVersion("hdb", "ev2")
    val bad = Seq(("D", 3L, "g0", 21L)).toDF("change", "id", "grp_in", "v")
    // the shared pre-check (riding the digest pass — no extra action)
    // fires as a plain eager exception, and the base never moves: the
    // inline fold refusal alone would fire only AFTER the base commit,
    // forcing the marker machinery into a sketch rebuild
    val err = intercept[IllegalArgumentException] { m.commit(bad) }
    assert(err.getMessage.contains("APPEND-ONLY"))
    assert(store.latestVersion("hdb", "ev2") == v0,
      "refusal must land before the base table moves")
    // the registry still accepts the next clean batch
    m.commit(Seq(("I", 99L, "g9", 5L)).toDF("change", "id", "grp_in", "v"))
    assert(canon(Ivm.hllDistinctCount(m.read("ev2_hll")))("g9") == 1L)
  }

  test("estimates stay within DataSketches error past the coupon regime") {
    import spark.implicits._
    val spec = Ivm.hllDistinctSpec("t", col("g"), col("v"))
    val agg = spec.seed((0 until 20000).map(i => ("one", i.toLong))
      .toDF("g", "v"))
    val est = canon(Ivm.hllDistinctCount(agg))("one").toDouble
    assert(math.abs(est - 20000.0) / 20000.0 < 0.03,
      s"lgK=12 estimate off by more than 3%: $est")
    intercept[IllegalArgumentException] {
      Ivm.hllDistinctSpec("t", col("g"), col("v"), lgK = 2)
    }
  }
}
