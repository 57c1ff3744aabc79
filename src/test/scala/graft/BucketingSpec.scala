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

  test("bucketed fingerprint store: incremental dedup never shuffles the store") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    val tmp = Files.createTempDirectory("graft-fp-store").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val batch = docs.filter(col("doc_id") % 4 === 0)
    // the store is the corpus-scale side — lay it out bucketed on the
    // join key so growing the corpus only ever shuffles the batch
    Bucketing.writeBucketed(
      Dedup.exact(corpus, "doc_id", "text").select("fingerprint"),
      "fp_store", s"$tmp/fp", "fingerprint", 8)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val accepted = Dedup.exactIncremental(batch, "doc_id", "text",
        spark.table("fp_store"))
      // values: identical to the plain (unbucketed) store path
      val plain = Dedup.exactIncremental(batch, "doc_id", "text",
        Dedup.exact(corpus, "doc_id", "text").select("fingerprint"))
      assert(accepted.exceptAll(plain).count() == 0)
      assert(plain.exceptAll(accepted).count() == 0)
      assert(accepted.count() > 0)
      // plan: the store scan reads its buckets in place — the anti-join's
      // STORE side carries no shuffle of any kind, only the bucketed scan
      accepted.collect()
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      val ex = accepted.queryExecution.executedPlan
      val smj = deepCollect(ex) { case j: SortMergeJoinExec => j }.headOption
      assert(smj.nonEmpty, s"expected a sort-merge anti-join:\n$ex")
      val storeSide = smj.get.right
      assert(deepCollect(storeSide) {
          case n if n.nodeName.contains("Exchange") ||
            n.nodeName.contains("ShuffleQueryStage") => n
        }.isEmpty,
        s"a shuffle feeds the bucketed store:\n$storeSide")
      assert(deepCollect(storeSide) {
          case f: FileSourceScanExec if f.bucketedScan => f
        }.nonEmpty,
        s"store scan lost its bucket layout:\n$storeSide")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS fp_store")
    }
  }
}
