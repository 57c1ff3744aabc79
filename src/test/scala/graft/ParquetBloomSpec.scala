package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}

/**
 * Parquet-native bloom filters (`graft.bloom`): the HIGH-cardinality
 * complement to value-set stats — opted columns get per-row-group
 * blooms written INTO every data file, so the reader's pushed equality
 * predicate can skip row groups probabilistically; the manifest carries
 * nothing. Verified at the footer level (the bloom is physically
 * there), at the plan level (the equality predicate reaches the scan as
 * a pushed filter), and for exactness.
 */
class ParquetBloomSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 2,
      keepVersions = 2, vacuumRetentionMs = 0L)

  test("opted columns carry footer blooms; equality reads stay exact") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val store = mkStore()
    store.catalog.register(TableMeta("bdb", "t",
      Files.createTempDirectory("graft-bloom").toString,
      primaryKey = Seq("id"),
      properties = Map(MergeSnapshotStore.BloomProp -> "uid:1024")))
    store.overwrite("bdb", "t",
      (0 until 512).map(i => (i.toLong, s"u$i", i.toDouble))
        .toDF("id", "uid", "v"))
    val full = store.read("bdb", "t")
    val files = full.inputFiles
    assert(files.nonEmpty)
    val conf = spark.sparkContext.hadoopConfiguration
    files.foreach { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        conf, new Path(f))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        assert(blocks.nonEmpty)
        blocks.foreach { b =>
          val uid = b.getColumns.asScala
            .find(_.getPath.toDotString == "uid").get
          assert(uid.getBloomFilterOffset >= 0,
            s"uid must carry a bloom in $f")
          val v = b.getColumns.asScala
            .find(_.getPath.toDotString == "v").get
          assert(v.getBloomFilterOffset < 0,
            s"un-opted v must NOT carry a bloom in $f")
        }
      } finally reader.close()
    }
    // the equality probe reaches the scan pushed (bloom evaluation
    // happens inside parquet-mr row-group filtering) and stays exact
    val got = full.filter(col("uid") === "u77")
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(uid,u77)") || plan.contains("uid = u77"),
      s"equality must push into the scan:\n$plan")
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((77L, "u77")))
  }

  test("blooms survive a scoped merge and misconfiguration fails loudly") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val store = mkStore()
    store.catalog.register(TableMeta("bdb", "m",
      Files.createTempDirectory("graft-bloom-m").toString,
      primaryKey = Seq("id"),
      properties = Map(MergeSnapshotStore.BloomProp -> "uid:1024")))
    store.overwrite("bdb", "m",
      (0 until 128).map(i => (i.toLong, s"u$i")).toDF("id", "uid"))
    store.mergeScoped("bdb", "m", Seq(7L).toDF("id")) { old =>
      old.withColumn("uid",
        when(col("id") === 7L, lit("u7777")).otherwise(col("uid")))
    }
    val conf = spark.sparkContext.hadoopConfiguration
    store.read("bdb", "m").inputFiles.foreach { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        conf, new Path(f))
      try reader.getFooter.getBlocks.asScala.foreach { b =>
        assert(b.getColumns.asScala.find(_.getPath.toDotString == "uid")
          .get.getBloomFilterOffset >= 0,
          s"merge-rewritten files must keep writing blooms: $f")
      } finally reader.close()
    }
    assert(store.read("bdb", "m").filter(col("uid") === "u7777")
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    // loud misconfig: unknown column, malformed entry, non-parquet
    store.catalog.register(TableMeta("bdb", "bad",
      Files.createTempDirectory("graft-bloom-bad").toString,
      properties = Map(MergeSnapshotStore.BloomProp -> "nope")))
    val err = intercept[IllegalArgumentException] {
      store.overwrite("bdb", "bad", Seq((1L, "a")).toDF("id", "uid"))
    }
    assert(err.getMessage.contains("nope"))
    intercept[IllegalArgumentException] {
      MergeSnapshotStore.parseBloomProp("uid:abc")
    }
    // a trailing colon is a truncated NDV, not the default — split's
    // trailing-empty removal must not silently accept it
    intercept[IllegalArgumentException] {
      MergeSnapshotStore.parseBloomProp("uid:")
    }
    intercept[IllegalArgumentException] {
      MergeSnapshotStore.parseBloomProp(":1024")
    }
    assert(MergeSnapshotStore.parseBloomProp("uid:1024, url") ==
      Seq("uid" -> 1024L, "url" -> MergeSnapshotStore.BloomDefaultNdv))
    store.catalog.register(TableMeta("bdb", "badfmt",
      Files.createTempDirectory("graft-bloom-bf").toString, format = "json",
      properties = Map(MergeSnapshotStore.BloomProp -> "uid")))
    val ferr = intercept[IllegalArgumentException] {
      store.overwrite("bdb", "badfmt", Seq((1L, "a")).toDF("id", "uid"))
    }
    assert(ferr.getMessage.contains("parquet-native"))
  }
}
