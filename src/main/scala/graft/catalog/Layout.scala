package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout: Z-order (Morton) clustering.
 *
 * A table range-partitioned on one column prunes scans that filter on
 * that column and nothing else; a 100 TB fact table queried by boxes
 * over two or more columns (time x entity, lat x lon) needs file and
 * row-group statistics that are tight on ALL of them. Interleaving the
 * bits of the dimensions' bucket ranks gives one sort key whose locality
 * is shared across dimensions — rows close in z-value are close in every
 * dimension, so parquet min/max stats per file/row-group stay narrow and
 * a 2-D box skips most of the data (the Delta/Iceberg OPTIMIZE ZORDER
 * pattern, built here from plain expressions).
 *
 * Dimensions are first clipped to an [lo, hi] range (caller supplies it,
 * e.g. from approx quantiles, so outliers cannot flatten the buckets)
 * and bucketized with `width_bucket` — one codegen'd expression per
 * dimension, no shuffle. The interleave is a fixed chain of shift/or
 * expressions. The only shuffle in [[cluster]] is the range partition by
 * z-value that also gives one tight file per output partition.
 */
object Layout {

  /** 2^bits-bucket rank of `c` clipped to [lo, hi] — 0..2^bits-1. */
  def bucketRank(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, "bits must be in [1, 16]")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val n = 1 << bits
    // width_bucket maps v == hi to bucket n+1; the least() caps the top
    // edge back into the last rank so every output fits in `bits` bits
    least(width_bucket(least(greatest(c.cast("double"), lit(lo)), lit(hi)),
      lit(lo), lit(hi), lit(n)) - 1, lit(n - 1)).cast("long")
  }

  /** Morton interleave of two bucket ranks (a gets the odd bits). */
  def interleave2(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val ai = shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i + 1)
      val bi = shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i)
      ai.bitwiseOR(bi)
    }.reduce[Column](_.bitwiseOR(_))

  /** The z-value column for two dimensions with clip ranges. */
  def zValue(a: Column, aRange: (Double, Double),
             b: Column, bRange: (Double, Double), bits: Int = 8): Column =
    interleave2(bucketRank(a, aRange._1, aRange._2, bits),
      bucketRank(b, bRange._1, bRange._2, bits), bits)

  /**
   * Cluster `df` into `files` range partitions by z-value of the two
   * dimensions, each sorted within — written as parquet, every file and
   * row group carries tight min/max on BOTH dimensions. Ranges default
   * to the columns' actual min/max (two tiny aggregates; pass explicit
   * ranges to skip the scan or clip outliers).
   */
  def cluster(df: DataFrame, aCol: String, bCol: String, files: Int,
              aRange: Option[(Double, Double)] = None,
              bRange: Option[(Double, Double)] = None,
              bits: Int = 8): DataFrame = {
    val (ra, rb) = (aRange, bRange) match {
      case (Some(a), Some(b)) => (a, b)
      case _ =>
        // one combined scan covers both columns' bounds
        val r = df.agg(
          min(col(aCol).cast("double")), max(col(aCol).cast("double")),
          min(col(bCol).cast("double")), max(col(bCol).cast("double"))).head()
        require(!r.anyNull,
          s"cannot infer clip ranges for ($aCol, $bCol): input is empty or a " +
            "column is all-null — pass aRange/bRange explicitly")
        (aRange.getOrElse((r.getDouble(0), r.getDouble(1))),
          bRange.getOrElse((r.getDouble(2), r.getDouble(3))))
    }
    val z = zValue(col(aCol), ra, col(bCol), rb, bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
