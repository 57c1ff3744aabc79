package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalable exact prefix aggregation (running totals) over a total order.
 *
 * Spark plans `Window.orderBy(...)` with no partitionBy as a SINGLE
 * partition: on a 100 TB input the whole table funnels through one task
 * — the classic global-window bottleneck. The distributed-scan answer:
 *
 *  1. range-partition by the order key (the only full shuffle — every
 *     bucket holds a contiguous key range);
 *  2. per-bucket prefix sums with a window PARTITIONED by the bucket id
 *     — all buckets scan in parallel;
 *  3. per-bucket totals are one tiny aggregate (`buckets` rows — driver
 *     loop-control scale); their exclusive prefix sums broadcast back
 *     as offsets.
 *
 * For integral values the result is bit-identical to the
 * single-partition window (long addition is associative — spec-proven);
 * floating-point values reassociate like any distributed sum.
 *
 * The primary consumer is token-budget shard packing ([[packShards]]):
 * assigning documents to contiguous fixed-token training shards needs
 * exactly a global running token count.
 */
object PrefixScan {

  /**
   * `df` plus `outCol` = inclusive running sum of `valueCol` in
   * `orderCol` order. The order key must be unique — with duplicate
   * keys the intra-tie order (and so the running value) is undefined,
   * in the single-partition window plan too.
   *
   * `buckets` defaults to the session's shuffle parallelism. The
   * range-partitioned, bucket-id-stamped frame is [[Materialize]]d:
   * range partitioning SAMPLES its input to pick boundaries, so without
   * the cut the totals aggregate and the cumsum pass could recompute
   * DIFFERENT bucket assignments and silently mis-offset — callers
   * release the cut after their terminal action like any other.
   */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
                   outCol: String = "running_total",
                   buckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
    require(Set[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(valueCol).dataType),
      s"$valueCol must be integral — a floating sum is not associative, so " +
        "bucketed offsets would not reproduce the sequential total")
    val n =
      if (buckets > 0) buckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = Materialize(
      df.repartitionByRange(n, col(orderCol))
        .withColumn("__bucket", spark_partition_id()))
    val w = Window.partitionBy(col("__bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // bucket totals -> exclusive prefix offsets (tiny: one row per bucket)
    val totals = ranged.groupBy(col("__bucket"))
      .agg(sum(col(valueCol)).as("__total"))
      .collect().map(r => r.getInt(0) -> r.getAs[Number](1).longValue())
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (b, t)) =>
      (b, acc + t)
    }.init.zip(totals).map { case ((_, off), (b, _)) => (b, off) }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("__bucket", "__offset")
    ranged
      .join(broadcast(offsetDf), Seq("__bucket"))
      .withColumn(outCol, sum(col(valueCol)).over(w) + col("__offset"))
      .drop("__bucket", "__offset")
  }

  /**
   * Token-budget shard packing: assign each document (in `orderCol`
   * order) to the contiguous training shard its running token count
   * falls in — `shard = floor((running - own) / budget)`, i.e. a shard
   * closes once it has accumulated `budget` tokens and the next doc
   * starts the next one. The running count comes from [[runningTotal]],
   * so the whole operator is one range shuffle + parallel bucket scans
   * — no single-task window at any input size.
   */
  def packShards(df: DataFrame, orderCol: String, tokenCol: String,
                 budget: Long, buckets: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    runningTotal(df, orderCol, tokenCol, "cum_tokens", buckets)
      .withColumn("shard",
        floor((col("cum_tokens") - col(tokenCol)) / budget).cast("long"))
  }
}
