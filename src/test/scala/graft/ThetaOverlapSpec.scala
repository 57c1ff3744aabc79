package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/**
 * Theta-sketch corpus-overlap audit: per-group |A|, |B|, |A∩B|, |A\B|,
 * |B\A| from one sketch per (group, side) — no cross-corpus join.
 * Exact while each side retains under 2^lgK entries; bounded-error
 * past it; a group absent from one side reads as the empty set.
 */
class ThetaOverlapSpec extends AnyFunSuite with SparkFixture {

  private def frame(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i % 3, i)).toDF("g", "v")
  }

  private def collectOverlap(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("grp").collect().map(r => (r.getLong(0),
      r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5))).toSeq

  test("exact regime: the estimates ARE the set sizes, per group") {
    val a = frame(0L until 300L)           // per group: 100 ids
    val b = frame(150L until 450L)         // overlap 150..299 (50/group)
    val got = collectOverlap(
      Similarity.corpusOverlapSketch(a, b, col("g"), col("v")))
    assert(got == Seq(
      (0L, 100.0, 100.0, 50.0, 50.0, 50.0),
      (1L, 100.0, 100.0, 50.0, 50.0, 50.0),
      (2L, 100.0, 100.0, 50.0, 50.0, 50.0)), s"drifted: $got")
  }

  test("a group absent from one side is the empty set: zero overlap, all 'only'") {
    import spark.implicits._
    val a = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("g", "v")
    val b = Seq((1L, 10L), (3L, 30L)).toDF("g", "v")
    val got = collectOverlap(
      Similarity.corpusOverlapSketch(a, b, col("g"), col("v")))
    assert(got == Seq(
      (1L, 2.0, 1.0, 1.0, 1.0, 0.0),
      (2L, 1.0, 0.0, 0.0, 1.0, 0.0),
      (3L, 0.0, 1.0, 0.0, 0.0, 1.0)), s"drifted: $got")
  }

  test("shard roll-up: merged shard sketches equal the direct corpus sketch") {
    import spark.implicits._
    import graft.functions.ThetaSketchExpressions.{thetaAgg, thetaEstimate, thetaMergeAgg}
    val corpus = (0L until 900L).map(i => (i % 4, i)).toDF("shard", "v")
    // per-shard sketches, then merged across shards
    val rolled = corpus.groupBy("shard").agg(thetaAgg(col("v")).as("sk"))
      .agg(thetaMergeAgg(col("sk")).as("sk"))
      .select(thetaEstimate(col("sk"))).head().getDouble(0)
    val direct = corpus.agg(thetaAgg(col("v")).as("sk"))
      .select(thetaEstimate(col("sk"))).head().getDouble(0)
    assert(rolled == direct && direct == 900.0,
      s"roll-up must equal the one-pass sketch: $rolled vs $direct")
  }

  test("past the exact regime the relative error stays inside the theta bound") {
    import spark.implicits._
    // 60k vs 60k with 30k shared at lgK=12 (k=4096): sampling engaged;
    // theta's ~1.6% bound, asserted at 5% for slack (intersections
    // compound the error of both sides)
    val a = (0L until 60000L).map(i => (0L, i)).toDF("g", "v")
    val b = (30000L until 90000L).map(i => (0L, i)).toDF("g", "v")
    val got = collectOverlap(
      Similarity.corpusOverlapSketch(a, b, col("g"), col("v"))).head
    def rel(est: Double, truth: Double) = math.abs(est - truth) / truth
    assert(rel(got._2, 60000.0) < 0.05, s"est_a ${got._2}")
    assert(rel(got._3, 60000.0) < 0.05, s"est_b ${got._3}")
    assert(rel(got._4, 30000.0) < 0.05, s"est_overlap ${got._4}")
  }

  test("value-type discipline: unsupported types refuse at analysis") {
    import spark.implicits._
    val bad = Seq((1L, Array[Byte](1, 2))).toDF("g", "v")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Similarity.corpusOverlapSketch(bad, bad, col("g"), col("v")).collect()
    }
    assert(err.getMessage.contains("theta_sketch_agg"))
    intercept[IllegalArgumentException] {
      Similarity.corpusOverlapSketch(bad, bad, col("g"), col("v"), lgK = 2)
    }
  }
}
