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

  test("approx quantiles within tight rank error of exact percentiles") {
    val approx = Sketches.approxQuantiles(li, "l_returnflag", "l_extendedprice",
        Seq(0.5, 0.9), accuracy = 10000)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (k, qs) =>
      qs.zip(approx(k)).foreach { case (e, a) =>
        assert(math.abs(a - e) / e <= 0.02, s"group $k exact=$e approx=$a")
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
