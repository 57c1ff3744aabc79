package graft.operators

import org.apache.spark.sql.DataFrame
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
    val b = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"), joinType)
      .drop("__salt")
  }
}
