package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites — mirrors the reference's pytest
 * fixture (tests/fixtures/spark_session.py: local master, UTC,
 * case-insensitive). */
object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkFixture {
  lazy val spark: SparkSession = SparkFixture.session
  val RefData = "/root/reference/tests/data/dummy"
}
