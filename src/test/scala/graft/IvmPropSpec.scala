package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivm, Scd}

/**
 * Property-style tests for the IVM family: against randomly generated
 * snapshot pairs (seeded — reproducible), each maintained aggregate must
 * equal its from-scratch recompute over the new snapshot — the family's
 * one contract, exercised across random mixes of inserts, deletes,
 * in-place updates, group moves, NULL groups, NULL values, duplicated
 * values, emptied groups, and created groups, which hand-written cases
 * can only sample.
 */
class IvmPropSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // a snapshot: keys 1..n with random (group, value); ~1/7 NULL group,
  // ~1/6 NULL value, values drawn from a SMALL range so duplicates and
  // shared extrema are common (the regimes that break naive maintenance)
  private def snap(rnd: Random, keys: Seq[Long]): Seq[(Long, Option[String], Option[Long])] =
    keys.map { k =>
      val g = if (rnd.nextInt(7) == 0) None else Some(("g" + rnd.nextInt(4)))
      val v = if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(9).toLong)
      (k, g, v)
    }

  private def df(rows: Seq[(Long, Option[String], Option[Long])]): DataFrame =
    rows.toDF("k", "grp_in", "v")

  private def canon(d: DataFrame): Set[String] =
    d.collect().map(_.toString).toSet

  test("count/sum, min/max, and distinct maintenance equal recompute on 25 random logs") {
    val rnd = new Random(1234)
    for (trial <- 1 to 25) {
      val oldKeys = (1L to (20 + rnd.nextInt(30))).filter(_ => rnd.nextInt(5) > 0)
      val oldRows = snap(rnd, oldKeys)
      // new snapshot: drop ~1/4 of keys, rewrite ~1/3 (new group/value),
      // insert a few fresh keys — every change regime with one dial
      val kept = oldRows.filter(_ => rnd.nextInt(4) > 0)
      val rewritten = kept.map { case (k, g, v) =>
        if (rnd.nextInt(3) == 0) snap(rnd, Seq(k)).head else (k, g, v)
      }
      val inserts = snap(rnd, (1000L to (1000L + rnd.nextInt(6))))
      val newRows = rewritten ++ inserts
      val oldDf = df(oldRows)
      val newDf = df(newRows)
      val changes = Scd.snapshotDiff(oldDf, newDf, Seq("k"))

      val cs = Ivm.applyCountSumDelta(
        Ivm.countSumAgg(oldDf, col("grp_in"), col("v")),
        oldDf, changes, Seq("k"), col("grp_in"), col("v"))
      assert(canon(cs) == canon(Ivm.countSumAgg(newDf, col("grp_in"), col("v"))),
        s"count/sum drifted on trial $trial")

      val mm = Ivm.applyMinMaxDelta(
        Ivm.minMaxAgg(oldDf, col("grp_in"), col("v")),
        oldDf, newDf, changes, Seq("k"), col("grp_in"), col("v"))
      assert(canon(mm) == canon(Ivm.minMaxAgg(newDf, col("grp_in"), col("v"))),
        s"min/max drifted on trial $trial")

      val aux = Ivm.applyDistinctAuxDelta(
        Ivm.distinctAux(oldDf, col("grp_in"), col("v")),
        oldDf, changes, Seq("k"), col("grp_in"), col("v"))
      assert(canon(aux) == canon(Ivm.distinctAux(newDf, col("grp_in"), col("v"))),
        s"distinct aux view drifted on trial $trial")
    }
  }

  test("snapshotDiff replay reconstructs the new snapshot on 25 random pairs") {
    // the changelog's defining property: old MINUS changed keys PLUS the
    // changelog's new images == new, for any random mix of regimes —
    // the contract every IVM fold and the store CDF lean on
    val rnd = new Random(777)
    for (trial <- 1 to 25) {
      val oldRows = snap(rnd, (1L to (15 + rnd.nextInt(25))).filter(_ => rnd.nextInt(5) > 0))
      val newRows = oldRows.filter(_ => rnd.nextInt(4) > 0).map { case r @ (k, _, _) =>
        if (rnd.nextInt(3) == 0) snap(rnd, Seq(k)).head else r
      } ++ snap(rnd, 500L to (500L + rnd.nextInt(5)))
      val (oldDf, newDf) = (df(oldRows), df(newRows))
      val changes = Scd.snapshotDiff(oldDf, newDf, Seq("k"))
      val replayed = oldDf
        .join(changes.filter(col("change").isin("U", "D")).select("k"),
          Seq("k"), "left_anti")
        .unionByName(changes.filter(col("change").isin("I", "U"))
          .select("k", "grp_in", "v"))
      assert(canon(replayed) == canon(newDf), s"replay drifted on trial $trial")
      // and the changelog is minimal: unchanged rows never appear
      val changedKeys = changes.select("k").collect().map(_.getLong(0)).toSet
      val sameBoth = oldRows.toSet.intersect(newRows.toSet).map(_._1)
      assert(changedKeys.intersect(sameBoth).isEmpty,
        s"changelog carried unchanged rows on trial $trial")
    }
  }

  test("two-step maintenance composes on 10 random three-snapshot chains") {
    val rnd = new Random(99)
    for (trial <- 1 to 10) {
      val s0 = snap(rnd, 1L to 25L)
      val s1 = s0.filter(_ => rnd.nextInt(4) > 0).map { case r @ (k, _, _) =>
        if (rnd.nextInt(3) == 0) snap(rnd, Seq(k)).head else r
      } ++ snap(rnd, 100L to (100L + rnd.nextInt(4)))
      val s2 = s1.filter(_ => rnd.nextInt(4) > 0).map { case r @ (k, _, _) =>
        if (rnd.nextInt(3) == 0) snap(rnd, Seq(k)).head else r
      } ++ snap(rnd, 200L to (200L + rnd.nextInt(4)))
      val (d0, d1, d2) = (df(s0), df(s1), df(s2))
      val c01 = Scd.snapshotDiff(d0, d1, Seq("k"))
      val c12 = Scd.snapshotDiff(d1, d2, Seq("k"))
      val step1 = Ivm.applyMinMaxDelta(
        Ivm.minMaxAgg(d0, col("grp_in"), col("v")), d0, d1, c01,
        Seq("k"), col("grp_in"), col("v"))
      val step2 = Ivm.applyMinMaxDelta(step1, d1, d2, c12,
        Seq("k"), col("grp_in"), col("v"))
      assert(canon(step2) == canon(Ivm.minMaxAgg(d2, col("grp_in"), col("v"))),
        s"composed min/max drifted on trial $trial")
    }
  }
}
