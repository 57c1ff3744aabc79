package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan dump for declared queries.
 *
 * `runMain graft.tools.Explain q01_scan_project ...` prints the plan's
 * load-bearing lines (scans, joins, exchanges, pushed filters).
 *
 * `SPARK_GRAFT_EXPLAIN_OUT=plans/r21 SPARK_GRAFT_EXPLAIN_TAG=after
 *  runMain graft.tools.Explain ...` additionally writes each query's
 * FULL `.explain("formatted")` output (post-execution, so AQE's final
 * plan) to `<out>/<query>_<tag>.txt` — the optimization rounds' plan
 * evidence files. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    LocalIo.tuneLocalFs(spark)
    val sf = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SF", "/root/testdata/sf0.1")
    val out = sys.env.get("SPARK_GRAFT_EXPLAIN_OUT")
    val tag = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_TAG", "plan")
    out.foreach(d => new java.io.File(d).mkdirs())
    args.foreach { n =>
      println(s"======== $n")
      graft.operators.Materialize.scoped {
        val df = graft.SparkEntry.queries(n)(spark, sf)
        // drive df's OWN QueryExecution (a writer/count would wrap the
        // logical plan in a new one and leave this AQE plan unfinalized)
        df.queryExecution.toRdd.count()
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        out.foreach { d =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$d/${n}_$tag.txt"),
            (s"== $n ($tag, executed at $sf) ==\n" + formatted).getBytes("UTF-8"))
        }
        println(df.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Scan") || l.contains("Join") || l.contains("Exchange")
            || l.contains("PushedFilters") || l.contains("WholeStageCodegen"))
          .map(_.take(220)).mkString("\n"))
      }
    }
    spark.stop()
  }
}
