package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A query that fails is
  * recorded under "errors" with its timing excluded from the total — a
  * broken query must never bench as a fast success. A warm-up pass at
  * sf0.001 JIT-compiles the codegen/shuffle/scan paths first so the timed
  * numbers measure the plans, not first-query session warm-up. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }

    // two timed executions per query, report the min: steady-state plan
    // cost, robust to one-off JIT/GC/noisy-neighbor hiccups (the warm-up
    // pass above already compiled the codegen paths)
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val (t1, e1) = once()
      if (e1.isDefined) (name, t1, e1)
      else { val (t2, e2) = once(); (name, math.min(t1, t2), e2.orElse(None)) }
    }
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }
    val qs = results.map { case (k, v, _) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":\"${esc(e)}\"" }
    val total = results.collect { case (_, v, None) => v }.sum
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":2,"agg":"min","queries":$qs$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
