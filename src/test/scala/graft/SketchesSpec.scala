package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Approximate aggregates: error bounds pinned against exact answers. */
class SketchesSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.01"
  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("approx distinct within 4x rsd of exact per group") {
    val approx = Sketches.approxDistinct(li, Seq("l_returnflag"), "l_orderkey",
        rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val rel = math.abs(approx(k) - n).toDouble / n
      assert(rel <= 0.08, s"group $k: approx=${approx(k)} exact=$n rel=$rel")
    }
  }

  test("approx quantiles within the sketch's rank-error guarantee") {
    // percentile_approx guarantees RANK error (~1/accuracy), not value
    // error: check the rank of each sketch answer in the sorted data
    val approx = Sketches.approxQuantiles(li, "l_returnflag", "l_extendedprice",
        Seq(0.5, 0.9), accuracy = 10000)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val values = li.select("l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { case (k, qs) =>
      val sorted = values(k)
      qs.zip(Seq(0.5, 0.9)).foreach { case (a, target) =>
        val rank = sorted.count(_ <= a).toDouble / sorted.length
        assert(math.abs(rank - target) <= 0.01,
          s"group $k target=$target approx=$a rank=$rank")
      }
    }
  }

  test("frequent items finds the true modal value") {
    val top = li.groupBy("l_returnflag").count()
      .orderBy(col("count").desc).limit(1)
      .collect().head.getString(0)
    val freq = Sketches.frequentItems(li, Seq("l_returnflag"), support = 0.1)
      .collect().head.getSeq[String](0)
    assert(freq.contains(top))
  }
}
