package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Approximate aggregates — the sketch forms that replace exact
 * distinct/quantile/top-k at 100 TB, where the exact versions mean a
 * full shuffle (distinct) or a full sort (percentile) of the fact table.
 * All single-pass, mergeable, map-side-combining Spark built-ins:
 * HyperLogLog++ for distinct counts, a positional compaction sketch for
 * quantiles, and the Karp-Papadimitriou-Shenker single-pass heavy-hitter
 * pass behind `freqItems`. Accuracy knobs trade sketch memory for error;
 * the specs pin the error bounds against the exact answers.
 */
object Sketches {

  /** HLL++ distinct values of `valueCol` per group (relative error rsd). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Approximate quantiles of `valueCol` per group; higher `accuracy`
   * = more sketch memory, tighter rank error (1/accuracy). */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      qs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol),
        array(qs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Single-pass heavy hitters with frequency > `support`. */
  def frequentItems(df: DataFrame, cols: Seq[String],
                    support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols.toArray, support)
}
