package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** TEMP perf probe — per-query timing + stage breakdown. Delete after use. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer[(Int, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        stages += ((si.stageId, ms, si.numTasks))
      }
    })
    for (name <- args) {
      try { SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count() }
      catch { case e: Throwable => println(s"warm $name: $e") }
      graft.operators.Materialize.releaseAll()
      for (i <- 1 to 2) {
        stages.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.Materialize.releaseAll()
        println(f"[probe] $name pass$i $dt%.3f s")
        if (i == 2) {
          val top = stages.sortBy(-_._2).take(8)
          top.foreach { case (id, ms, nt) =>
            println(f"[probe]   stage $id%4d ${ms / 1000.0}%7.3f s  tasks=$nt")
          }
          println(f"[probe]   sum-of-stages ${stages.map(_._2).sum / 1000.0}%.3f s over ${stages.size} stages")
        }
      }
    }
    spark.stop()
  }
}
