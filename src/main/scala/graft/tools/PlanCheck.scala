// scratch: dump formatted plans + phase timings for slow queries
package graft.tools

import org.apache.spark.sql.SparkSession

object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq else Seq("d03_dedup_simhash", "d04_ngram_jaccard")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sf)
      val t0 = System.nanoTime()
      df.count()
      println(f"== $n cold: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      df.count()
      println(f"== $n warm: ${(System.nanoTime() - t1) / 1e9}%.2f s")
      // drive df's OWN QueryExecution (a writer/count would wrap the
      // logical plan in a new one and leave this AQE plan unfinalized)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      val scans = plan.linesIterator.count(_.contains("FileScan"))
      println(s"== $n exchanges=$exchanges reused=$reused filescans=$scans")
    }
    spark.stop()
  }
}
