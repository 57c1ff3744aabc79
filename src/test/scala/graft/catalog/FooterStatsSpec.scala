package graft.catalog

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/**
 * Footer-lifted stats on the hostile chunk shapes the driver loop and
 * the distributed job both feed through [[MergeSnapshotStore.footerBounds]]:
 * parquet-mr's read path converts a NaN float/double min/max into a
 * bound-less Statistics (hasNonNullValue=false, num_nulls still set), so
 * a multi-row-group file whose NaN chunk hides in-range finite rows must
 * NOT publish bounds built from its clean chunks alone — that would
 * wrongly prune the file. Genuinely all-null chunks (num_nulls ==
 * value count) stay transparent.
 */
class FooterStatsSpec extends AnyFunSuite with SparkFixture {
  import scala.jdk.CollectionConverters._

  /** Writes df as ONE parquet file with tiny row groups; returns the
   * file path and its row-group count. */
  private def writeSmallGroups(df: org.apache.spark.sql.DataFrame): (org.apache.hadoop.fs.Path, Int) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-footer").toString
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "2048")
      .option("parquet.page.size", "512")
      // force a row-group size check every few records so the tiny
      // block size actually cuts groups
      .option("parquet.block.size.row.check.min", "10")
      .option("parquet.block.size.row.check.max", "10")
      .parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(conf, p)
    val nGroups = try reader.getFooter.getBlocks.size finally reader.close()
    (p, nGroups)
  }

  test("NaN-tainted chunk in a multi-row-group file poisons the column's bounds") {
    import spark.implicits._
    // rows arrive ordered: the first chunk(s) carry NaN plus IN-RANGE
    // finite values (v=5.0); later chunks are far out of range. Under
    // the bug, bounds built from the clean chunks alone ([1000, ...])
    // would wrongly prune a readRange over [4, 6].
    val rows = (0 until 2000).map { i =>
      val v = if (i < 400) { if (i % 7 == 0) Double.NaN else 5.0 }
              else 1000.0 + i
      (i.toLong, v)
    }
    val (file, nGroups) = writeSmallGroups(rows.toDF("id", "v"))
    assert(nGroups >= 2, s"fixture needs multiple row groups, got $nGroups")
    val conf = spark.sparkContext.hadoopConfiguration
    // precondition that makes the test non-vacuous: at least one chunk
    // must be bound-less-but-not-all-null (the parquet-mr NaN shape)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(conf, file)
    val nanShaped = try {
      reader.getFooter.getBlocks.asScala.exists { b =>
        b.getColumns.asScala.filter(_.getPath.toDotString == "v").exists { cc =>
          val st = cc.getStatistics
          st != null && !st.isEmpty && !st.hasNonNullValue &&
            !(st.isNumNullsSet && st.getNumNulls == cc.getValueCount)
        }
      }
    } finally reader.close()
    assert(nanShaped,
      "fixture did not produce a bound-less non-all-null (NaN) chunk")
    val bounds = MergeSnapshotStore.footerBounds(conf, file, Seq("id", "v"))
    assert(!bounds.exists(_._1 == "v"),
      s"NaN-tainted column published bounds (would wrongly prune): $bounds")
    // the untainted column still gets exact bounds
    assert(bounds.exists(b => b._1 == "id" && b._2 == 0.0 && b._3 == 1999.0),
      s"clean column lost its bounds: $bounds")
  }

  test("provably-all-null chunks stay transparent; NULLs never fake a NaN shape") {
    import spark.implicits._
    // first 400 rows NULL, rest finite: the all-null chunks must
    // contribute nothing while the finite chunks' bounds survive
    val df = spark.range(2000).select(col("id"),
      when(col("id") < 400, lit(null))
        .otherwise(col("id").cast("double") + 0.5).as("w"))
    val (file, nGroups) = writeSmallGroups(df)
    assert(nGroups >= 2, s"fixture needs multiple row groups, got $nGroups")
    val conf = spark.sparkContext.hadoopConfiguration
    val bounds = MergeSnapshotStore.footerBounds(conf, file, Seq("w"))
    assert(bounds == Seq(("w", 400.5, 1999.5)),
      s"all-null chunks should be skipped, finite bounds kept: $bounds")
  }

  test("store end-to-end: a NaN-chunk file is never pruned away from an in-range read") {
    import spark.implicits._
    val cat = new InMemoryCatalog
    cat.register(TableMeta("fdb", "nan",
      java.nio.file.Files.createTempDirectory("graft-footer-store").toString))
    val store = new MergeSnapshotStore(spark, cat, nBuckets = 4)
    val hconf = spark.sparkContext.hadoopConfiguration
    val prior = Map(
      "parquet.block.size" -> Option(hconf.get("parquet.block.size")),
      "parquet.page.size" -> Option(hconf.get("parquet.page.size")),
      "parquet.block.size.row.check.min" ->
        Option(hconf.get("parquet.block.size.row.check.min")),
      "parquet.block.size.row.check.max" ->
        Option(hconf.get("parquet.block.size.row.check.max")))
    try {
      hconf.set("parquet.block.size", "2048")
      hconf.set("parquet.page.size", "512")
      hconf.set("parquet.block.size.row.check.min", "10")
      hconf.set("parquet.block.size.row.check.max", "10")
      val rows = (0 until 2000).map { i =>
        val v = if (i < 400) { if (i % 7 == 0) Double.NaN else 5.0 }
                else 1000.0 + i
        (i.toLong, v)
      }
      store.overwrite("fdb", "nan", rows.toDF("id", "v").coalesce(1))
    } finally prior.foreach {
      case (k, Some(v)) => hconf.set(k, v)
      case (k, None)    => hconf.unset(k)
    }
    // the finite v=5.0 rows hide behind the NaN chunk — the file must
    // survive stats pruning and the read must return them all
    val got = store.readRange("fdb", "nan", Map("v" -> ((4.0, 6.0))))
    assert(got.count() == 400 - 400 / 7 - 1,
      s"NaN-tainted file wrongly pruned: ${got.count()} rows")
  }
}
