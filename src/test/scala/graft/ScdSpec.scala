package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Scd

/** SCD2 interval build and snapshot-diff changelog derivation —
 * hand-computed fixtures plus the one-exchange plan pin that makes
 * scd2's two windows a single shuffle. */
class ScdSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // (key, ts, seq, state) — key 1 has runs A,A,B,A (collapses to A,B,A);
  // key 2 has a null state run (null, null, C) exercising the null-safe
  // collapse; key 3 is a single row.
  private def changes = Seq(
    (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
    (1L, 40L, 4L, "A"),
    (2L, 10L, 5L, null), (2L, 20L, 6L, null), (2L, 30L, 7L, "C"),
    (3L, 50L, 8L, "Z")
  ).toDF("k", "ts", "seq", "state")

  test("scd2 collapses unchanged runs and builds half-open intervals") {
    val got = Scd.scd2(changes, "k", Seq("ts", "seq"), Seq("state"))
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "A", 10L, 30L, false),
      (1L, "B", 30L, 40L, false),
      (1L, "A", 40L, -1L, true), // A resurfaces: a NEW run, not merged
      (2L, null, 10L, 30L, false), // null==null collapses (null-safe)
      (2L, "C", 30L, -1L, true),
      (3L, "Z", 50L, -1L, true)),
      s"got ${got.toSeq}")
    // key 2's current run
    val k2 = Scd.scd2(changes, "k", Seq("ts", "seq"), Seq("state"))
      .filter(col("k") === 2L && col("is_current")).collect()
    assert(k2.length == 1 && k2(0).getString(1) == "C")
  }

  test("scd2 tracks multi-attribute state null-safely") {
    val df = Seq(
      (1L, 1L, "A", Some(5)), (1L, 2L, "A", None),
      (1L, 3L, "A", None), (1L, 4L, "A", Some(5))
    ).toDF("k", "ts", "s1", "s2")
    val got = Scd.scd2(df, "k", Seq("ts"), Seq("s1", "s2"))
      .orderBy("valid_from").collect()
    // (A,5) -> (A,null) [run of 2 collapses] -> (A,5)
    assert(got.length == 3)
    // columns: k, s1, s2, valid_from, ... — valid_from is index 3
    assert(got.map(_.getLong(3)).toSeq == Seq(1L, 2L, 4L))
  }

  test("scd2 plans ONE exchange: collapse lag and validity lead share a window") {
    val df = Scd.scd2(changes, "k", Seq("ts", "seq"), Seq("state"))
    df.collect()
    // the FINAL adaptive plan only — executedPlan.toString on an AQE root
    // prints the initial plan too, double-counting every operator
    val ex = df.queryExecution.executedPlan
    val p = ex.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
    }.headOption.getOrElse(ex.toString)
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected one window exchange, got $n:\n$p")
    // and one sort serving both windows
    val sorts = p.linesIterator.count(_.contains("Sort ["))
    assert(sorts == 1, s"expected one shared window sort, got $sorts:\n$p")
  }

  test("snapshotDiff classifies I/U/D, drops unchanged, carries the new side") {
    val oldDf = Seq(
      (1L, "a", Some(1.0)), (2L, "b", Some(2.0)),
      (3L, "c", None), (4L, "d", Some(4.0))
    ).toDF("k", "s", "v")
    val newDf = Seq(
      (1L, "a", Some(1.0)), // unchanged -> dropped
      (2L, "B", Some(2.0)), // string changed -> U
      (3L, "c", Some(3.0)), // null -> value, null-safe U
      (5L, "e", Some(5.0))  // new key -> I; key 4 missing -> D
    ).toDF("k", "s", "v")
    val got = Scd.snapshotDiff(oldDf, newDf, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((2L, "U"), (3L, "U"), (4L, "D"), (5L, "I")))
    // U/I carry the new values; D carries nulls
    assert(got(0)._3 == "B" && got(1)._4 == 3.0 && got(3)._3 == "e")
    assert(got(2)._3 == null && got(2)._4.isNaN)
  }

  test("snapshotDiff output replays through an apply fold to the new snapshot") {
    // the changelog contract: old + diff == new (I/U upsert, D delete)
    val oldDf = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val newDf = Seq((1L, 10.0), (2L, 21.0), (4L, 40.0)).toDF("k", "v")
    val diff = Scd.snapshotDiff(oldDf, newDf, Seq("k"))
    val applied = oldDf.join(diff.select(col("k")), Seq("k"), "left_anti")
      .unionByName(diff.filter(col("change") =!= "D").select("k", "v"))
    val a = applied.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val n = newDf.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == n.toSeq)
  }
}
