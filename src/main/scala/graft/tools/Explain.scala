package graft.tools
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    args.foreach { n =>
      println(s"======== $n")
      val df = graft.SparkEntry.queries(n)(spark, sf)
      // drive df's OWN QueryExecution (a writer/count would wrap the
      // logical plan in a new one and leave this AQE plan unfinalized)
      df.queryExecution.toRdd.count()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Scan") || l.contains("Join") || l.contains("Exchange")
          || l.contains("PushedFilters") || l.contains("WholeStageCodegen"))
        .map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}
