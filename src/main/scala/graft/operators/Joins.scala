package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Join utilities for skewed data. Spark's AQE splits moderately skewed
 * partitions on its own (`spark.sql.adaptive.skewJoin`); explicit salting
 * is the tool for pathological hot keys (one key = 10% of a 100 TB fact
 * table) where a single reducer would still drown.
 */
object Joins {

  private val LeftLike =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")

  /**
   * Skew-safe equi-join: every big-side row gets a uniform salt in
   * [0, salt); the small side is replicated once per salt value; the join
   * key becomes (key, salt). A hot key's rows fan out over `salt` reducers
   * instead of one, at the cost of `salt`x the (broadcast-sized) small
   * side. Salt values never affect matching, so the result is EXACTLY the
   * plain equi-join — only inner/left-shaped joins are allowed (a
   * right/full join would see the replicated unmatched small rows).
   */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
                     smallKey: String, salt: Int,
                     joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    require(LeftLike.contains(joinType.toLowerCase),
      s"salting preserves only inner/left-shaped joins, not $joinType")
    // Aliased for the same reason as [[bandJoin]]: if both sides derive
    // from one parent, dataset-id disambiguation is best-effort.
    val b = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
      .alias("__sj_b")
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
      .alias("__sj_s")
    b.join(s, col(s"__sj_b.$bigKey") === col(s"__sj_s.$smallKey") &&
        col("__sj_b.__salt") === col("__sj_s.__salt"), joinType)
      .drop("__salt")
  }

  /**
   * Band (range) join: all (left, right) pairs of the same key whose
   * times differ by at most `toleranceSec`. The naive form is an
   * inequality join — a broadcast nested loop at scale. This buckets time
   * into tolerance-wide chunks: a qualifying pair's buckets differ by at
   * most one, so the left side probes its own and both adjacent buckets
   * through an ordinary equi-join on (key, bucket), then the exact band
   * predicate filters. Each pair meets exactly once (the right bucket is
   * unique and left probes are distinct). Cost: 3x left fan-out into a
   * hash join — shuffle-bound, never cross-product.
   */
  def bandJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               toleranceSec: Long): DataFrame = {
    require(toleranceSec > 0, "tolerance must be positive")
    val lEpoch = col(leftTime).cast("long")
    val rEpoch = col(rightTime).cast("long")
    // Both sides often derive from the SAME parent (self-join of two
    // filters), where dataset-id disambiguation of `l(key) === r(key)` is
    // best-effort and can silently collapse to a trivially-true predicate.
    // Explicit aliases make resolution positional, never heuristic.
    val l = left.withColumn("__le", lEpoch)
      .withColumn("__bucket",
        explode(array(Seq(-1, 0, 1).map(d => floor(lEpoch / toleranceSec) + d): _*)))
      .alias("__bj_l")
    val r = right.withColumn("__re", rEpoch)
      .withColumn("__bucket", floor(rEpoch / toleranceSec))
      .alias("__bj_r")
    l.join(r, col(s"__bj_l.$key") === col(s"__bj_r.$key") &&
        col("__bj_l.__bucket") === col("__bj_r.__bucket"))
      .filter(abs(col("__le") - col("__re")) <= toleranceSec)
      .drop("__bucket", "__le", "__re")
      .drop(col(s"__bj_r.$key"))
  }

  /**
   * As-of (left) join: for each left row, the latest right row of the same
   * key with rightTime <= leftTime (inclusive). Spark has no native as-of
   * join; the naive form (range join + argmax) explodes to O(|L|·|R|) per
   * key. This is the scalable composition: tag both sides, union, one
   * window shuffle keyed by `key` ordered by (time, side), and
   * forward-fill the right columns with `last(ignoreNulls)` — right rows
   * sort before left rows at equal times, so the inclusive match is exact.
   * Cost: one shuffle of |L|+|R|, memory O(1) per row (running frame).
   *
   * `right` must have at most one row per (key, rightTime) — pre-aggregate
   * otherwise (forward-fill would pick an arbitrary one of the ties);
   * `rightCols` must not collide with left column names. Unmatched left
   * rows keep NULL right columns; the matched right time is returned as
   * `matchedTimeCol`.
   */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String, rightCols: Seq[String],
               matchedTimeCol: String = "matched_time"): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name the columns to carry over")
    require(!left.columns.map(_.toLowerCase)
        .exists((rightCols :+ matchedTimeCol).map(_.toLowerCase).toSet),
      "rightCols/matchedTimeCol must not collide with left columns")
    val l = left
      .withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    // the carried right values travel as ONE struct so the forward fill is
    // atomic — per-column fills would tear a row whose value is NULL
    // (filling the value from an older row than the matched time)
    val r = right.select((key +: rightTime +: rightCols).map(col): _*)
      .withColumn("__rrow", struct((rightCols.map(col) :+
        col(rightTime).as(matchedTimeCol)): _*))
      .select(col(key), col(rightTime).as("__t"), col("__rrow"))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__rrow", last(col("__rrow"), ignoreNulls = true).over(w))
    val unpacked = (rightCols :+ matchedTimeCol).foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("__rrow").getField(c))
    }
    unpacked.filter(col("__side") === 1).drop("__t", "__side", "__rrow")
  }
}
