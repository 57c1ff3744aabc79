package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}
import graft.streaming.ChangeFeed

/**
 * Feed-family scale readout (`sbt "runMain graft.tools.FeedScale
 * <sfDir> [tag]"`): the q86 shape — build an orders store, take a
 * takedown + a correction, EXPORT the combined delta with
 * [[ChangeFeed.advance]], then CONSUME it with a real AvailableNow
 * streaming query into a parquet sink — timed per phase, one JSON line
 * out. Run against sf0.1 and a ScaleUp-derived sf1 back-to-back: the
 * export phase must track the CHANGE volume and the consumer the
 * DELTA volume, while only the build phase is corpus-sized — the
 * adjudication SCALE.md records.
 */
object FeedScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FeedScale <sfDir> [tag]")
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else sfDir.split('/').last
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val work = Files.createTempDirectory("graft-feedscale").toString
    val cat = new InMemoryCatalog
    cat.register(TableMeta("fs", "orders", s"$work/orders",
      primaryKey = Seq("o_orderkey")))
    val store = new MergeSnapshotStore(spark, cat, nBuckets = 8,
      keepVersions = 8)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val (_, buildS) = timed {
      store.overwrite("fs", "orders", orders)
    }
    val feed = s"$work/feed"
    val (_, exportS) = timed {
      require(ChangeFeed.advance(store, "fs", "orders", feed).isEmpty)
      store.deleteWhere("fs", "orders", col("o_totalprice") < 30000.0)
      store.updateWhere("fs", "orders", expr("o_orderstatus = 'P'"),
        Map("o_orderstatus" -> lit("X")))
      require(ChangeFeed.advance(store, "fs", "orders", feed).isDefined)
    }
    val sink = s"$work/sink"
    val ((), consumeS) = timed {
      val q = ChangeFeed.readStream(spark, feed)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val consumed = spark.read.parquet(sink).count()
    def n(v: Double) = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    println(s"""{"tool":"FeedScale","tag":"$tag","build":${n(buildS)},""" +
      s""""export":${n(exportS)},"consume":${n(consumeS)},""" +
      s""""delta_rows":$consumed}""")
    spark.stop()
  }
}
