package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}
import graft.operators.{Ivm, Scd}

/**
 * KLL-sketch maintained quantiles: per-group state is one k-bounded
 * sketch, the fold is a delta-sized sketch aggregate plus a group-keyed
 * pairwise merge, maintained quantiles equal rebuild quantiles equal
 * the EXACT order statistics while every group is in the sketch's exact
 * regime (n <= k), and a changelog carrying U/D rows refuses loudly —
 * no quantile sketch can subtract.
 */
class KllIvmSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 4,
      keepVersions = 2, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String,
                       pk: String): Unit =
    store.catalog.register(TableMeta("kdb", tbl,
      Files.createTempDirectory(s"graft-kll-$tbl").toString,
      primaryKey = Seq(pk)))

  /** Values are a deterministic permutation-ish spread per group so the
   * exact order statistics are easy to mirror on the driver. */
  private def snap(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"g${i % 3}", (i * 37 % 1009).toDouble))
      .toDF("id", "grp_in", "v")
  }

  /** Driver-side INCLUSIVE-rank order statistic — the independent
   * arithmetic the sketch's exact regime must reproduce: the smallest
   * value whose rank (fraction of items <= it) reaches `rank`. */
  private def exactQuantile(vs: Seq[Double], rank: Double): Double = {
    val sorted = vs.sorted
    val need = math.ceil(rank * sorted.size).max(1).toInt
    sorted(need - 1)
  }

  private def quantiles(agg: DataFrame, ranks: Seq[Double])
      : Map[String, Seq[Double]] =
    Ivm.kllQuantiles(agg, ranks).collect()
      .map(r => r.getString(0) -> ranks.indices.map(i => r.getDouble(1 + i)))
      .toMap

  private val Ranks = Seq(0.1, 0.5, 0.9, 0.99)

  test("append-only commits: maintained == rebuild == exact order statistics") {
    val store = mkStore()
    register(store, "ev", "id")
    register(store, "ev_kll", "grp")
    val m = new Ivm.MaintainedAggregates(store, "kdb", "ev",
      Seq(Ivm.kllQuantileSpec("ev_kll", col("grp_in"), col("v"))))
    m.seed(snap(60))
    var prev = 60
    for (n <- Seq(150, 300)) {
      m.commit(Scd.snapshotDiff(snap(prev), snap(n), Seq("id")))
      prev = n
      val base = store.read("kdb", "ev")
      val rebuilt = Ivm.kllQuantileSpec("x", col("grp_in"), col("v"))
        .seed(base)
      assert(quantiles(m.read("ev_kll"), Ranks) == quantiles(rebuilt, Ranks),
        "maintained quantiles drifted from a scratch rebuild")
      // <= 100 values per group at n=300 with k=200: exact regime —
      // every quantile IS the exact order statistic
      val byGroup = base.collect()
        .groupBy(_.getString(1)).view
        .mapValues(_.map(_.getDouble(2)).toSeq).toMap
      val want = byGroup.map { case (g, vs) =>
        g -> Ranks.map(exactQuantile(vs, _)) }
      assert(quantiles(m.read("ev_kll"), Ranks) == want,
        "exact-regime quantiles must be the exact order statistics")
    }
  }

  test("a changelog with U/D rows refuses loudly; insert-only folds fine") {
    import spark.implicits._
    val spec = Ivm.kllQuantileSpec("t", col("grp_in"), col("v"))
    val agg0 = spec.seed(snap(12))
    val bad = Seq(("U", 3L, "g0", 21.0), ("I", 99L, "g1", 5.0))
      .toDF("change", "id", "grp_in", "v")
    // detection rides the delta aggregation (no separate probe action),
    // so standalone the refusal surfaces when the fold is ACTED on
    val err = intercept[Exception] {
      spec.fold(agg0, snap(12), snap(12), bad, Seq("id")).collect()
    }
    assert(chainMessages(err).contains("APPEND-ONLY"))
    // insert-only folds fine; a brand-new group adopts the delta sketch
    // and untouched groups keep their history verbatim
    val ok = Seq(("I", 99L, "g9", 5.0), ("I", 100L, "g9", 15.0))
      .toDF("change", "id", "grp_in", "v")
    val folded = spec.fold(agg0, snap(12), snap(12), ok, Seq("id"))
    val q = quantiles(folded, Seq(0.5))
    assert(q("g9") == Seq(5.0), s"new group median drifted: ${q("g9")}")
    val before = quantiles(agg0, Ranks)
    assert(quantiles(folded.filter(col("grp") =!= "g9"), Ranks) == before,
      "untouched groups must keep their quantiles verbatim")
  }

  test("past the exact regime the DataSketches rank-error bound holds") {
    import spark.implicits._
    // one group, 20k values 0..19999: far past k=200, compaction has
    // happened; the INCLUSIVE quantile's TRUE rank must sit within the
    // published ~1.65% normalized rank error (3% asserted for slack)
    val big = (0 until 20000).map(i => (i.toLong, "g", i.toDouble))
      .toDF("id", "grp_in", "v")
    val spec = Ivm.kllQuantileSpec("t", col("grp_in"), col("v"))
    val agg = spec.seed(big)
    val got = quantiles(agg, Ranks)("g")
    Ranks.zip(got).foreach { case (r, est) =>
      val trueRank = (est + 1.0) / 20000.0 // values ARE their own ranks
      assert(math.abs(trueRank - r) <= 0.03,
        s"rank $r estimated $est (true rank $trueRank) — outside 3%")
    }
  }

  test("null values never update a sketch; an all-null group reads NULL quantiles") {
    import spark.implicits._
    val spec = Ivm.kllQuantileSpec("t", col("grp_in"), col("v"))
    val agg = spec.seed(Seq(
      (1L, "a", Some(5.0)), (2L, "a", None), (3L, "b", None))
      .toDF("id", "grp_in", "v"))
    val rows = Ivm.kllQuantiles(agg, Seq(0.5)).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows("a") == Some(5.0), "nulls must not perturb the sketch")
    assert(rows("b") == None, "an all-null group has no quantile")
  }

  test("value-type discipline: non-double input refuses at analysis") {
    // update() casts to Double, so a wrong-typed column must fail as an
    // analysis error (like the Theta/Freq siblings) — not surface as an
    // executor-side ClassCastException deep inside a running fold
    import spark.implicits._
    import graft.functions.KllSketchExpressions.kllAgg
    val bad = Seq((1L, "not-a-double")).toDF("g", "v")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      bad.groupBy("g").agg(kllAgg(col("v")).as("kll")).collect()
    }
    assert(err.getMessage.contains("DOUBLE"),
      s"expected the deliberate-cast message, got: ${err.getMessage}")
    // the spec helper casts for the caller, so the ergonomic path stays
    // open for any numeric input
    val ok = Ivm.kllQuantileSpec("t", col("grp_in"), col("v"))
      .seed(Seq((1L, "a", 5)).toDF("id", "grp_in", "v"))
    assert(Ivm.kllQuantiles(ok, Seq(0.5)).collect().head.getDouble(1) == 5.0)
  }
}
