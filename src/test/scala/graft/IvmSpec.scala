package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivm, Scd}

/** Incremental view maintenance: folding a changelog into a count/sum
 * aggregate must equal the from-scratch recompute over the new snapshot
 * — including updates that MOVE a row between groups, deletes that empty
 * a group, and inserts that create one. */
class IvmSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // old snapshot: (key, group, integer value)
  private lazy val oldSnap = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L))
    .toDF("k", "grp_in", "v")
  // new snapshot: 1 updated in place, 2 MOVED a->b, 3 unchanged,
  // 4 deleted (group c empties), 5/6 inserted (6 creates group d)
  private lazy val newSnap = Seq(
    (1L, "a", 11L), (2L, "b", 20L), (3L, "b", 30L), (5L, "a", 50L),
    (6L, "d", 60L))
    .toDF("k", "grp_in", "v")

  private def aggMap(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("delta application equals the from-scratch recompute") {
    val base = Ivm.countSumAgg(oldSnap, col("grp_in"), col("v"))
    assert(aggMap(base) == Map("a" -> ((2L, 30L)), "b" -> ((1L, 30L)),
      "c" -> ((1L, 40L))))
    val changes = Scd.snapshotDiff(oldSnap, newSnap, Seq("k"))
    val got = Ivm.applyCountSumDelta(base, oldSnap, changes, Seq("k"),
      col("grp_in"), col("v"))
    val scratch = Ivm.countSumAgg(newSnap, col("grp_in"), col("v"))
    assert(aggMap(got) == aggMap(scratch))
    // group c is GONE (count 0 dropped), d was created
    assert(aggMap(got) == Map("a" -> ((2L, 61L)), "b" -> ((2L, 50L)),
      "d" -> ((1L, 60L))))
  }

  test("empty changelog is a no-op; identical snapshots diff to empty") {
    val base = Ivm.countSumAgg(oldSnap, col("grp_in"), col("v"))
    val noChanges = Scd.snapshotDiff(oldSnap, oldSnap, Seq("k"))
    assert(noChanges.isEmpty)
    val got = Ivm.applyCountSumDelta(base, oldSnap, noChanges, Seq("k"),
      col("grp_in"), col("v"))
    assert(aggMap(got) == aggMap(base))
  }

  test("maintenance composes: two delta steps equal one recompute") {
    // step 1: old -> new; step 2: new -> newer (5 deleted, 1 moves a->d)
    val newer = Seq(
      (1L, "d", 11L), (2L, "b", 20L), (3L, "b", 30L), (6L, "d", 60L))
      .toDF("k", "grp_in", "v")
    val base = Ivm.countSumAgg(oldSnap, col("grp_in"), col("v"))
    val step1 = Ivm.applyCountSumDelta(base, oldSnap,
      Scd.snapshotDiff(oldSnap, newSnap, Seq("k")), Seq("k"),
      col("grp_in"), col("v"))
    val step2 = Ivm.applyCountSumDelta(step1, newSnap,
      Scd.snapshotDiff(newSnap, newer, Seq("k")), Seq("k"),
      col("grp_in"), col("v"))
    assert(aggMap(step2) ==
      aggMap(Ivm.countSumAgg(newer, col("grp_in"), col("v"))))
  }

  test("all-NULL-value groups round-trip as NULL sums, not 0") {
    // group "n" has only NULL values: from-scratch sum is NULL. A
    // maintained (cnt, sum)-only state could not distinguish that from
    // a sum of 0 — the nnv column exists precisely for this.
    val oldN = Seq((1L, "a", Some(10L)), (2L, "n", None), (7L, "a", None))
      .toDF("k", "grp_in", "v")
    // 2 updated (still NULL), 8 inserts a second all-NULL row into n,
    // 9 creates all-NULL group m, 7's NULL value becomes non-NULL
    val newN = Seq((1L, "a", Some(10L)), (2L, "n", None), (8L, "n", None),
      (9L, "m", None), (7L, "a", Some(5L)))
      .toDF("k", "grp_in", "v")
    val base = Ivm.countSumAgg(oldN, col("grp_in"), col("v"))
    val got = Ivm.applyCountSumDelta(base, oldN,
      Scd.snapshotDiff(oldN, newN, Seq("k")), Seq("k"),
      col("grp_in"), col("v"))
    def full(df: DataFrame): Map[String, (Long, Option[Long], Long)] =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3)))).toMap
    val scratch = Ivm.countSumAgg(newN, col("grp_in"), col("v"))
    assert(full(got) == full(scratch))
    assert(full(got)("n") == ((2L, None, 0L)))
    assert(full(got)("m") == ((1L, None, 0L)))
    assert(full(got)("a") == ((2L, Some(15L), 2L)))
  }

  test("shape guard: a base without countSumAgg's columns is rejected") {
    intercept[IllegalArgumentException] {
      Ivm.applyCountSumDelta(oldSnap, oldSnap,
        Scd.snapshotDiff(oldSnap, newSnap, Seq("k")), Seq("k"),
        col("grp_in"), col("v"))
    }
  }

  // ---- min/max maintenance (not self-maintainable under deletion) ----

  // a: delete of the unique max (10); b: delete of ONE copy of the
  // duplicated min (20); c: its only row MOVES to group a (c empties);
  // e: all-NULL group gains a value via update; f: a strictly interior
  // value deleted (extrema untouched); g: created by insert
  private lazy val mmOld = Seq(
    (1L, "a", Some(10L)), (2L, "a", Some(5L)), (3L, "a", Some(5L)),
    (4L, "b", Some(30L)), (5L, "b", Some(20L)), (6L, "b", Some(20L)),
    (7L, "c", Some(40L)),
    (8L, "e", None), (9L, "e", None),
    (10L, "f", Some(7L)), (11L, "f", Some(8L)), (12L, "f", Some(9L)))
    .toDF("k", "grp_in", "v")
  private lazy val mmNew = Seq(
    (2L, "a", Some(5L)), (3L, "a", Some(5L)), (14L, "a", Some(6L)),
    (7L, "a", Some(41L)),
    (4L, "b", Some(30L)), (5L, "b", Some(20L)),
    (8L, "e", Some(3L)), (9L, "e", None),
    (10L, "f", Some(7L)), (12L, "f", Some(9L)),
    (15L, "g", Some(100L)))
    .toDF("k", "grp_in", "v")

  private def mmMap(df: DataFrame): Map[String, (Long, Option[Long], Option[Long])] =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap

  test("min/max delta equals the recompute across every removal regime") {
    val base = Ivm.minMaxAgg(mmOld, col("grp_in"), col("v"))
    assert(mmMap(base) == Map(
      "a" -> ((3L, Some(5L), Some(10L))), "b" -> ((3L, Some(20L), Some(30L))),
      "c" -> ((1L, Some(40L), Some(40L))), "e" -> ((2L, None, None)),
      "f" -> ((3L, Some(7L), Some(9L)))))
    val changes = Scd.snapshotDiff(mmOld, mmNew, Seq("k"))
    val got = Ivm.applyMinMaxDelta(base, mmOld, mmNew, changes, Seq("k"),
      col("grp_in"), col("v"))
    val scratch = Ivm.minMaxAgg(mmNew, col("grp_in"), col("v"))
    assert(mmMap(got) == mmMap(scratch))
    assert(mmMap(got) == Map(
      "a" -> ((4L, Some(5L), Some(41L))), // max rescued by rescan + move-in
      "b" -> ((2L, Some(20L), Some(30L))), // duplicated min survives its copy
      "e" -> ((2L, Some(3L), Some(3L))),   // NULL extrema narrow via insert side
      "f" -> ((2L, Some(7L), Some(9L))),   // interior delete folds, no rescan
      "g" -> ((1L, Some(100L), Some(100L))))) // new group, insert-side extrema
    // c is gone: its extremum removal triggered a rescan that found nothing
    assert(!mmMap(got).contains("c"))
  }

  test("min/max rescan targets exactly the extremum-touched groups") {
    val base = Ivm.minMaxAgg(mmOld, col("grp_in"), col("v"))
    val changes = Scd.snapshotDiff(mmOld, mmNew, Seq("k"))
    val trig = Ivm.minMaxRescanGroups(base, mmOld, changes, Seq("k"),
        col("grp_in"), col("v"), "grp", "min_units", "max_units", "change")
      .collect().map(_.getString(0)).toSet
    // a (max deleted), b (a min copy deleted), c (only row moved away);
    // NOT f (interior delete), NOT e (removed value was NULL), NOT g (new)
    assert(trig == Set("a", "b", "c"))
  }

  test("min/max maintenance composes: two delta steps equal one recompute") {
    val mid = mmNew
    val fin = Seq(
      (2L, "a", Some(5L)), (14L, "a", Some(6L)), // 3 deleted (a min copy), 7 deleted (a max)
      (4L, "b", Some(30L)), (5L, "b", Some(20L)),
      (8L, "e", Some(3L)), (9L, "e", None),
      (10L, "f", Some(7L)), (12L, "f", Some(9L)),
      (15L, "g", Some(99L))) // g's single value updated DOWN (max shrinks)
      .toDF("k", "grp_in", "v")
    val base = Ivm.minMaxAgg(mmOld, col("grp_in"), col("v"))
    val step1 = Ivm.applyMinMaxDelta(base, mmOld,
      mid, Scd.snapshotDiff(mmOld, mid, Seq("k")), Seq("k"),
      col("grp_in"), col("v"))
    val step2 = Ivm.applyMinMaxDelta(step1, mid,
      fin, Scd.snapshotDiff(mid, fin, Seq("k")), Seq("k"),
      col("grp_in"), col("v"))
    assert(mmMap(step2) == mmMap(Ivm.minMaxAgg(fin, col("grp_in"), col("v"))))
  }

  // ---- distinct-count maintenance (auxiliary multiplicity view) ----

  // a: value 5 duplicated (keys 2,3) — deleting ONE copy must not move
  // the count, deleting the max 10 must; b: value moves 20 -> 21 via
  // update; c: group empties; e: NULL values (never counted, but their
  // multiplicity must round-trip so deletes work); g: new group
  private lazy val dcOld = Seq(
    (1L, "a", Some(10L)), (2L, "a", Some(5L)), (3L, "a", Some(5L)),
    (4L, "b", Some(30L)), (5L, "b", Some(20L)),
    (7L, "c", Some(40L)),
    (8L, "e", None), (9L, "e", Some(2L)))
    .toDF("k", "grp_in", "v")
  private lazy val dcNew = Seq(
    (2L, "a", Some(5L)), (3L, "a", Some(5L)),     // 1 (the 10) deleted
    (4L, "b", Some(30L)), (5L, "b", Some(21L)),   // 20 -> 21
    (8L, "e", None), (9L, "e", Some(2L)),
    (15L, "g", Some(100L)), (16L, "g", Some(100L)))
    .toDF("k", "grp_in", "v")

  test("distinct-count delta equals the recompute; aux view is exact") {
    val aux = Ivm.distinctAux(dcOld, col("grp_in"), col("v"))
    val changes = Scd.snapshotDiff(dcOld, dcNew, Seq("k"))
    val newAux = Ivm.applyDistinctAuxDelta(aux, dcOld, changes, Seq("k"),
      col("grp_in"), col("v"))
    // the STRONG check: the maintained view equals the from-scratch view
    val scratch = Ivm.distinctAux(dcNew, col("grp_in"), col("v"))
    assert(newAux.exceptAll(scratch).count() == 0 &&
      scratch.exceptAll(newAux).count() == 0)
    // and the aggregate read off it matches count(DISTINCT) semantics
    val got = Ivm.distinctCount(newAux)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 2L, "e" -> 1L, "g" -> 1L))
    // a: dup 5 survives its copies, the deleted 10 is gone (2 -> 1);
    // e: NULL never counted; c: emptied group absent; g: two rows, one value
    assert(!got.contains("c"))
  }

  test("distinct-count maintenance composes across two delta steps") {
    val fin = Seq(
      (3L, "a", Some(5L)),                        // 2 deleted: LAST copy of 5 stays via key 3
      (4L, "b", Some(30L)), (5L, "b", Some(21L)),
      (9L, "e", Some(3L)),                        // 8 (NULL) deleted, 9's value 2 -> 3
      (15L, "g", Some(100L)))                     // 16 deleted: dup 100 -> one copy
      .toDF("k", "grp_in", "v")
    val aux0 = Ivm.distinctAux(dcOld, col("grp_in"), col("v"))
    val aux1 = Ivm.applyDistinctAuxDelta(aux0, dcOld,
      Scd.snapshotDiff(dcOld, dcNew, Seq("k")), Seq("k"), col("grp_in"), col("v"))
    val aux2 = Ivm.applyDistinctAuxDelta(aux1, dcNew,
      Scd.snapshotDiff(dcNew, fin, Seq("k")), Seq("k"), col("grp_in"), col("v"))
    val scratch = Ivm.distinctAux(fin, col("grp_in"), col("v"))
    assert(aux2.exceptAll(scratch).count() == 0 &&
      scratch.exceptAll(aux2).count() == 0)
    val got = Ivm.distinctCount(aux2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 2L, "e" -> 1L, "g" -> 1L))
  }

  test("NULL group keys maintain exactly — count/sum, min/max, and rescan") {
    // NULL is a real group to groupBy; every base/delta merge must be
    // null-safe or the NULL group's base row survives unmatched next to
    // a fresh delta row (stale aggregate, duplicated group)
    val nOld = Seq((1L, Option.empty[String], Some(5L)),
      (2L, Option.empty[String], Some(10L)), (3L, Some("a"), Some(7L)))
      .toDF("k", "grp_in", "v")
    val nNew = Seq((1L, Option.empty[String], Some(5L)),
      (3L, Some("a"), Some(7L)), (4L, Option.empty[String], Some(6L)))
      .toDF("k", "grp_in", "v") // NULL group: max 10 deleted, 6 inserted
    val changes = Scd.snapshotDiff(nOld, nNew, Seq("k"))
    // count/sum
    val cs = Ivm.applyCountSumDelta(
      Ivm.countSumAgg(nOld, col("grp_in"), col("v")), nOld, changes,
      Seq("k"), col("grp_in"), col("v"))
    def csMap(df: DataFrame) = df.collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(csMap(cs) == csMap(Ivm.countSumAgg(nNew, col("grp_in"), col("v"))))
    assert(csMap(cs)(None) == ((2L, 11L)))
    assert(cs.filter(col("grp").isNull).count() == 1, "NULL group must merge, not duplicate")
    // min/max: the deleted 10 was the NULL group's max — rescan path
    val base = Ivm.minMaxAgg(nOld, col("grp_in"), col("v"))
    val trig = Ivm.minMaxRescanGroups(base, nOld, changes, Seq("k"),
        col("grp_in"), col("v"), "grp", "min_units", "max_units", "change")
      .collect().map(r => Option(r.getString(0))).toSet
    assert(trig == Set(None), "NULL group's extremum removal must trigger its rescan")
    val mm = Ivm.applyMinMaxDelta(base, nOld, nNew, changes, Seq("k"),
      col("grp_in"), col("v"))
    def nmmMap(df: DataFrame) = df.collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(nmmMap(mm) == nmmMap(Ivm.minMaxAgg(nNew, col("grp_in"), col("v"))))
    assert(nmmMap(mm)(None) == ((2L, 5L, 6L)))
  }

  test("distinctCount keeps an all-NULL-value group at 0, like count(DISTINCT)") {
    val rows = Seq((1L, "a", Some(5L)), (2L, "n", Option.empty[Long]),
      (3L, "n", Option.empty[Long])).toDF("k", "grp_in", "v")
    val got = Ivm.distinctCount(Ivm.distinctAux(rows, col("grp_in"), col("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // SQL: SELECT grp, count(DISTINCT v) yields ('n', 0) — the group
    // EXISTS with a zero count; dropping it would make "no distinct
    // values" indistinguishable from "no such group"
    assert(got == Map("a" -> 1L, "n" -> 0L))
  }

  test("min/max shape guard rejects a countSumAgg-shaped base") {
    intercept[IllegalArgumentException] {
      Ivm.applyMinMaxDelta(Ivm.countSumAgg(mmOld, col("grp_in"), col("v")),
        mmOld, mmNew, Scd.snapshotDiff(mmOld, mmNew, Seq("k")), Seq("k"),
        col("grp_in"), col("v"))
    }
  }
}
