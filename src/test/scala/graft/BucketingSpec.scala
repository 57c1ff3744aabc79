package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Bucketing

/** Co-located bucketed joins must plan with zero shuffle exchanges. */
class BucketingSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed tables join with no shuffle and the exact join result") {
    val tmp = Files.createTempDirectory("graft-buckets").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    Bucketing.writeBucketed(li, "li_b", s"$tmp/li", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_b", s"$tmp/ord", "o_orderkey", 8)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Bucketing.colocatedJoin(spark, "li_b", "ord_b",
        "l_orderkey", "o_orderkey")
      assert(joined.count() == li.count()) // every line has its order
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      // and the result matches the plain join
      val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      assert(joined.exceptAll(plain).count() == 0)
      assert(plain.exceptAll(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
