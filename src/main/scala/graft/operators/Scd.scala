package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Warehouse history operators: slowly-changing-dimension (type 2)
 * interval build, and snapshot reconciliation (diff two table versions
 * into an applyable changelog).
 *
 * These complete the CDC story the reference opens
 * (`apply_change_log_to_delta.py` APPLIES an upstream changelog — see
 * reference src/apply_change_log_to_delta.py:531-660): [[Scd.scd2]]
 * turns a raw event stream into queryable validity intervals, and
 * [[Scd.snapshotDiff]] DERIVES a changelog from two snapshots when no
 * upstream CDC feed exists — the inverse of the apply fold, producing
 * exactly the `I`/`U`/`D` actions [[ChangeLogApplier]] consumes.
 *
 * Scale shape: scd2 is one hash exchange on the entity key; the
 * change-collapse lag and the validity lead share the SAME window
 * partitioning and ordering, so Catalyst plans a single Exchange + a
 * single Sort for both (pinned by spec). snapshotDiff is one
 * sort-merge full-outer join on the key — the standard reconciliation
 * shape; AQE's skew split handles hot keys, and the null-safe struct
 * compare is one narrow projection on each side (no second scan of
 * either snapshot).
 */
object Scd {

  /**
   * Build SCD type-2 validity intervals from a change stream: one row
   * per (key, attribute-state) RUN, with `valid_from` / `valid_to` /
   * `is_current`. Consecutive rows whose tracked `attrs` are unchanged
   * (null-safely) are collapsed into the run's first row — the defining
   * SCD2 compression — and `valid_to` is the NEXT run's `valid_from`
   * (half-open intervals, null for the current run).
   *
   * `orderCols` must be a deterministic total order within a key (pass
   * a unique tie-breaker last); `orderCols.head` is the validity
   * timestamp column.
   */
  def scd2(df: DataFrame, key: String, orderCols: Seq[String],
           attrs: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty && attrs.nonEmpty,
      "scd2 needs ordering columns and tracked attributes")
    val w = Window.partitionBy(col(key)).orderBy(orderCols.map(col): _*)
    val state = struct(attrs.map(col): _*)
    val validFrom = orderCols.head
    df.withColumn("__changed", !(state <=> lag(state, 1).over(w)))
      .filter(col("__changed"))
      .drop("__changed")
      // same partitioning AND ordering as `w`: no second exchange/sort
      .withColumn("valid_to", lead(col(validFrom), 1).over(w))
      .withColumnRenamed(validFrom, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(key) +: attrs.map(col)) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /**
   * Diff two snapshots of the same table into a changelog: full-outer
   * join on `keys`, classify each key as `I` (only in `newDf`), `D`
   * (only in `oldDf`), or `U` (present in both with any shared
   * non-key column differing, null-safely); unchanged keys are
   * dropped. Output carries the keys, `change`, and the NEW side of
   * every shared non-key column (null for `D`) — an applyable
   * changelog, the inverse of the CDC apply fold.
   */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   changeOut: String = "change"): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs join keys")
    val shared = oldDf.columns.toSeq.filter(newDf.columns.contains)
      .filterNot(keys.contains)
    require(shared.nonEmpty, "snapshots share no non-key columns to compare")
    val o = oldDf.select((keys ++ shared).map(col): _*)
      .withColumn("__old", struct(shared.map(col): _*))
      .select(keys.map(col) :+ col("__old"): _*)
    val n = newDf.select((keys ++ shared).map(col): _*)
      .withColumn("__new", struct(shared.map(col): _*))
      .select(keys.map(col) :+ col("__new"): _*)
    o.join(n, keys, "full_outer")
      .withColumn(changeOut,
        when(col("__old").isNull, lit("I"))
          .when(col("__new").isNull, lit("D"))
          .when(!(col("__old") <=> col("__new")), lit("U")))
      .filter(col(changeOut).isNotNull)
      .select(keys.map(col) ++ Seq(col(changeOut)) ++
        shared.map(c => col(s"__new.$c").as(c)): _*)
  }
}
