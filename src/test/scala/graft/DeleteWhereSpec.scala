package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}

/**
 * Expression-derived data skipping ([[MergeSnapshotStore.readWhere]])
 * and the predicate-scoped copy-on-write DELETE built on it
 * ([[MergeSnapshotStore.deleteWhere]]). readWhere walks an arbitrary
 * Column predicate against every file's manifest stats (numeric/
 * temporal bounds, truncated string bounds, value sets) and plans only
 * the files that may hold a TRUE row — unsupported shapes degrade to a
 * conservative keep, never to a wrong prune. deleteWhere finds matches
 * through the same pruning, rewrites only the buckets owning a matched
 * file, and carries everything else by reference.
 */
class DeleteWhereSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(nBuckets: Int = 4): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = nBuckets,
      keepVersions = 2, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String,
                       pk: Seq[String] = Seq("id"),
                       props: Map[String, String] = Map.empty): TableMeta = {
    val meta = TableMeta("wdb", tbl,
      Files.createTempDirectory(s"graft-where-$tbl").toString,
      primaryKey = pk, properties = props)
    store.catalog.register(meta)
    meta
  }

  /** Rows range-split by `v` so each file carries a tight disjoint
   * numeric range AND a tight name range — the layout where stats
   * bite. cls cycles 4 values inside each file (ranges can't separate
   * it; value sets can when opted in). */
  private def rangedFrame(n: Int = 256): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, i.toLong, f"name$i%05d", s"c${i % 4}")
    }.toDF("id", "v", "nm", "cls").repartitionByRange(4, col("v"))
  }

  private def assertExact(got: DataFrame, want: DataFrame): Unit =
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0, "result drifted from full scan")

  // ------------------------------------------------------------ readWhere

  test("readWhere: AND of supported comparisons prunes to the overlapping files") {
    val store = mkStore(nBuckets = 1)
    register(store, "rw", pk = Nil)
    store.overwrite("wdb", "rw", rangedFrame())
    val full = store.read("wdb", "rw")
    val total = full.inputFiles.length
    assert(total >= 3, s"fixture needs range-split files, got $total")
    val pred = col("v") >= 70L && col("v") < 80L && col("nm") =!= "nope"
    val got = store.readWhere("wdb", "rw", pred)
    assert(got.inputFiles.length < total,
      s"a one-slice band must prune: ${got.inputFiles.length}/$total")
    assertExact(got, full.filter(pred))
  }

  test("readWhere: OR keeps the union of branch files; a dead OR branch adds nothing") {
    val store = mkStore(nBuckets = 1)
    register(store, "or", pk = Nil)
    store.overwrite("wdb", "or", rangedFrame())
    val full = store.read("wdb", "or")
    val total = full.inputFiles.length
    val dead = col("v") > 100000L // beyond every file's max
    val live = col("v") <= 5L
    val got = store.readWhere("wdb", "or", dead || live)
    assert(got.inputFiles.length < total, "dead-OR-live must still prune")
    assertExact(got, full.filter(dead || live))
    // both branches dead: nothing planned, empty result with the schema
    val none = store.readWhere("wdb", "or", dead || col("v") < -1L)
    assert(none.inputFiles.isEmpty && none.count() == 0)
  }

  test("readWhere: string bounds, prefixes and IN prune; value sets sharpen equality") {
    val store = mkStore(nBuckets = 1)
    register(store, "str", pk = Nil,
      props = Map(MergeSnapshotStore.SetStatsProp -> "cls"))
    store.overwrite("wdb", "str", rangedFrame())
    val full = store.read("wdb", "str")
    val total = full.inputFiles.length
    val byName = store.readWhere("wdb", "str",
      col("nm") >= "name00060" && col("nm") <= "name00070")
    assert(byName.inputFiles.length < total, "string band must prune")
    assertExact(byName,
      full.filter(col("nm") >= "name00060" && col("nm") <= "name00070"))
    val byPrefix = store.readWhere("wdb", "str",
      col("nm").startsWith("name0024"))
    assert(byPrefix.inputFiles.length < total, "prefix must prune")
    assertExact(byPrefix, full.filter(col("nm").startsWith("name0024")))
    val byIn = store.readWhere("wdb", "str",
      col("v").isin(3L, 7L) && col("cls") === "c3")
    assert(byIn.inputFiles.length < total, "IN band must prune")
    assertExact(byIn, full.filter(col("v").isin(3L, 7L) && col("cls") === "c3"))
  }

  test("readWhere: unsupported shapes and cross-type literals stay conservative AND exact") {
    val store = mkStore(nBuckets = 1)
    register(store, "cons", pk = Nil)
    store.overwrite("wdb", "cons", rangedFrame())
    val full = store.read("wdb", "cons")
    val total = full.inputFiles.length
    // function-of-column, NOT, col-to-col: no pruning, exact results
    val shapes = Seq(
      length(col("nm")) > lit(3) && col("v") < 10L, // fn AND supported: still prunes on v
      not(col("v") < 10L),                          // NOT: conservative
      col("v") === col("id"),                       // col-to-col: conservative
      col("v") === "5")                             // string literal on long col
    shapes.foreach { p =>
      assertExact(store.readWhere("wdb", "cons", p), full.filter(p))
    }
    assert(store.readWhere("wdb", "cons", not(col("v") < 10L))
      .inputFiles.length == total, "NOT must keep every file")
    assert(store.readWhere("wdb", "cons",
        length(col("nm")) > lit(3) && col("v") < 10L)
      .inputFiles.length < total,
      "the supported conjunct must still prune beside an unsupported one")
  }

  test("readWhere: NOT pushes down — De Morgan, complements, set/bound proofs") {
    import spark.implicits._
    val store = mkStore(nBuckets = 1)
    register(store, "neg", pk = Nil,
      props = Map(MergeSnapshotStore.SetStatsProp -> "cls"))
    // 4 range-split files by v; cls is CONSTANT per file (one class per
    // file), so negated equality can prove a whole file never escapes
    val df = (0 until 256).map { i =>
      (i.toLong, i.toLong, s"c${i / 64}")
    }.toDF("id", "v", "cls").repartitionByRange(4, col("v"))
    store.overwrite("wdb", "neg", df)
    val full = store.read("wdb", "neg")
    val total = full.inputFiles.length
    assert(total == 4, s"fixture wants 4 range files, got $total")
    // complement comparison: NOT(v < 64) prunes the low file
    val notLt = store.readWhere("wdb", "neg", not(col("v") < 64L))
    assert(notLt.inputFiles.length < total, "NOT(<) must prune via >=")
    assertExact(notLt, full.filter(not(col("v") < 64L)))
    // De Morgan over a band: only the strictly-inside file prunes
    val notBand = store.readWhere("wdb", "neg",
      not(col("v") >= 60L && col("v") <= 130L))
    assert(notBand.inputFiles.length == total - 1,
      s"the 64..127 file sits strictly inside the negated band: " +
        s"${notBand.inputFiles.length}/$total")
    assertExact(notBand, full.filter(not(col("v") >= 60L && col("v") <= 130L)))
    // negated equality/IN through the value sets: a one-class file
    // whose whole set is probed can never satisfy the NOT
    val ne = store.readWhere("wdb", "neg", col("cls") =!= "c1")
    assert(ne.inputFiles.length == total - 1, "!= must prune the c1 file")
    assertExact(ne, full.filter(col("cls") =!= "c1"))
    val notIn = store.readWhere("wdb", "neg",
      not(col("cls").isin("c0", "c3")))
    assert(notIn.inputFiles.length == total - 2, "NOT IN must prune both")
    assertExact(notIn, full.filter(not(col("cls").isin("c0", "c3"))))
    // double negation lands back on the positive walk
    val dbl = store.readWhere("wdb", "neg", not(not(col("v") < 10L)))
    assert(dbl.inputFiles.length == 1)
    assertExact(dbl, full.filter(col("v") < 10L))
  }

  test("readWhere: IS NOT NULL prunes a provably all-null file; IS NULL keeps") {
    import spark.implicits._
    val store = mkStore(nBuckets = 1)
    register(store, "nn", pk = Nil,
      props = Map(MergeSnapshotStore.SetStatsProp -> "cls"))
    // file 1: real classes; file 2: all-null cls (records the EMPTY set)
    val live = (0 until 32).map(i => (i.toLong, Some(s"c${i % 2}")))
    val nulls = (32 until 64).map(i => (i.toLong, None: Option[String]))
    store.overwrite("wdb", "nn",
      (live ++ nulls).toDF("id", "cls")
        .repartitionByRange(2, col("id")))
    val full = store.read("wdb", "nn")
    val total = full.inputFiles.length
    val nonNull = store.readWhere("wdb", "nn", col("cls").isNotNull)
    assert(nonNull.inputFiles.length < total,
      "the all-null file records the empty set and must prune")
    assertExact(nonNull, full.filter(col("cls").isNotNull))
    val isNull = store.readWhere("wdb", "nn", col("cls").isNull)
    assert(isNull.inputFiles.length == total,
      "no null counts in the manifest: IS NULL keeps everything")
    assertExact(isNull, full.filter(col("cls").isNull))
  }

  test("readWhere: date comparisons prune through the epoch-day space; date IN through sets") {
    import spark.implicits._
    val store = mkStore(nBuckets = 1)
    register(store, "dt", pk = Nil,
      props = Map(MergeSnapshotStore.SetStatsProp -> "d"))
    val base = java.time.LocalDate.of(2024, 1, 1)
    val df = (0 until 128).map { i =>
      (i.toLong, java.sql.Date.valueOf(base.plusDays(i.toLong)))
    }.toDF("id", "d").repartitionByRange(4, col("d"))
    store.overwrite("wdb", "dt", df)
    val full = store.read("wdb", "dt")
    val total = full.inputFiles.length
    val band = col("d") >= lit(java.sql.Date.valueOf(base.plusDays(40))) &&
      col("d") < lit(java.sql.Date.valueOf(base.plusDays(50)))
    val got = store.readWhere("wdb", "dt", band)
    assert(got.inputFiles.length < total, "a 10-day band must prune")
    assertExact(got, full.filter(band))
    // equality/IN on the date goes through BOTH the epoch-day bounds
    // and the ISO-canonical value sets
    val in = col("d").isin(java.sql.Date.valueOf(base.plusDays(3)),
      java.sql.Date.valueOf(base.plusDays(5)))
    val gotIn = store.readWhere("wdb", "dt", in)
    assert(gotIn.inputFiles.length == 1, "two near dates live in one file")
    assertExact(gotIn, full.filter(in))
  }

  test("readWhere: version pin reads the pinned snapshot") {
    import spark.implicits._
    val store = mkStore(nBuckets = 1)
    register(store, "pin", pk = Nil)
    store.overwrite("wdb", "pin", (0 until 8).map(i => (i.toLong, i.toLong))
      .toDF("id", "v"))
    val v1 = store.latestVersion("wdb", "pin")
    store.overwrite("wdb", "pin", (0 until 8).map(i => (i.toLong, i + 100L))
      .toDF("id", "v"))
    val pinned = store.readWhere("wdb", "pin", col("v") < 50L, Some(v1))
    assert(pinned.count() == 8, "the pin must see the pre-overwrite rows")
    assert(store.readWhere("wdb", "pin", col("v") < 50L).count() == 0)
  }

  // ---------------------------------------------------------- deleteWhere

  test("deleteWhere: deletes exactly the TRUE rows and reports the count") {
    val store = mkStore()
    register(store, "del")
    store.overwrite("wdb", "del", rangedFrame())
    val deleted = store.deleteWhere("wdb", "del",
      col("v") >= 100L && col("cls") === "c0")
    val expect = rangedFrame().filter(col("v") >= 100L && col("cls") === "c0")
      .count()
    assert(deleted == expect, s"count drifted: $deleted vs $expect")
    assertExact(store.read("wdb", "del"),
      rangedFrame().filter(!(col("v") >= 100L && col("cls") === "c0")))
  }

  test("deleteWhere: NULL-predicate rows survive (SQL DELETE semantics)") {
    import spark.implicits._
    val store = mkStore()
    register(store, "nul")
    store.overwrite("wdb", "nul",
      Seq((1L, Some(5L)), (2L, None), (3L, Some(50L)))
        .toDF("id", "v"))
    val deleted = store.deleteWhere("wdb", "nul", col("v") > 10L)
    assert(deleted == 1L)
    assert(store.read("wdb", "nul").select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L),
      "the NULL-v row must stay — DELETE removes only TRUE rows")
  }

  test("deleteWhere: a no-match delete commits nothing") {
    val store = mkStore()
    register(store, "nom")
    store.overwrite("wdb", "nom", rangedFrame())
    val v = store.latestVersion("wdb", "nom")
    assert(store.deleteWhere("wdb", "nom", col("v") > 100000L) == 0L)
    assert(store.latestVersion("wdb", "nom") == v,
      "a delete that matched nothing must not bump the version")
  }

  test("deleteWhere: untouched buckets carry by reference; stats keep pruning after") {
    val store = mkStore(nBuckets = 8)
    register(store, "carry")
    store.overwrite("wdb", "carry", rangedFrame())
    val v1 = store.latestVersion("wdb", "carry")
    val before = store.read("wdb", "carry").inputFiles.toSet
    // one specific row: its PK bucket rewrites, every other file must
    // survive IDENTICALLY (carried by reference, not rewritten)
    val deleted = store.deleteWhere("wdb", "carry", col("id") === 42L)
    assert(deleted == 1L)
    val after = store.read("wdb", "carry").inputFiles.toSet
    val carried = before.intersect(after)
    assert(carried.size == before.size - 1,
      s"exactly one bucket file should rewrite: ${before.size} -> carried ${carried.size}")
    assert(store.latestVersion("wdb", "carry") == v1 + 1)
    // the carried files kept their manifest stats VERBATIM (their bytes
    // were never re-read, so the measurements that described them still
    // do) — PK-hash bucketing smears v across buckets, so the right
    // assertion is stats identity, not prune counts
    val statsBefore = store.manifestStats("wdb", "carry", v1)
    val statsAfter = store.manifestStats("wdb", "carry", v1 + 1)
    val carriedRels = statsAfter.keySet.intersect(statsBefore.keySet)
    assert(carriedRels.nonEmpty, "carried files must keep manifest entries")
    carriedRels.foreach { rel =>
      assert(statsAfter(rel) == statsBefore(rel),
        s"carried file $rel must keep its measured stats")
    }
    assertExact(store.readWhere("wdb", "carry", col("v") >= 200L),
      store.read("wdb", "carry").filter(col("v") >= 200L))
  }

  test("deleteWhere: changesBetween yields the pure-D changelog of the delete") {
    val store = mkStore()
    register(store, "cdf")
    store.overwrite("wdb", "cdf", rangedFrame())
    val v1 = store.latestVersion("wdb", "cdf")
    store.deleteWhere("wdb", "cdf", col("v") < 10L)
    val v2 = store.latestVersion("wdb", "cdf")
    val log = store.changesBetween("wdb", "cdf", v1, v2).collect()
    assert(log.nonEmpty && log.forall(_.getAs[String]("change") == "D"),
      "a delete commit must surface as D rows only")
    assert(log.map(_.getAs[Long]("id")).toSet == (0L until 10L).toSet)
  }

  test("deleteWhere: nondeterministic predicates refuse loudly") {
    val store = mkStore()
    register(store, "rnd")
    store.overwrite("wdb", "rnd", rangedFrame(16))
    val err = intercept[IllegalArgumentException] {
      store.deleteWhere("wdb", "rnd", rand() > 0.5)
    }
    assert(err.getMessage.contains("deterministic"))
  }

  test("evaluation-time clocks refuse everywhere: prune, find and rewrite disagree on 'now'") {
    import spark.implicits._
    val store = mkStore()
    register(store, "clk")
    store.overwrite("wdb", "clk",
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .toDF("id", "ts"))
    type Pred = org.apache.spark.sql.Column => org.apache.spark.sql.Column
    Seq[Pred => Unit](
      p => { store.readWhere("wdb", "clk", p(col("ts"))); () },
      p => { store.deleteWhere("wdb", "clk", p(col("ts"))); () },
      p => { store.updateWhere("wdb", "clk", p(col("ts")),
        Map("ts" -> col("ts"))); () }
    ).foreach { run =>
      val err = intercept[IllegalArgumentException] {
        run(c => c < current_timestamp())
      }
      assert(err.getMessage.contains("clock"), err.getMessage)
      intercept[IllegalArgumentException] {
        run(c => c.cast("date") < current_date())
      }
    }
    // the bound-clock form works: the caller froze 'now' into a literal
    val now = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    assert(store.deleteWhere("wdb", "clk", col("ts") < lit(now)) == 1L)
  }

  test("deleteWhere: PK-less tables delete correctly (single-bucket rewrite)") {
    val store = mkStore()
    register(store, "nopk", pk = Nil)
    store.overwrite("wdb", "nopk", rangedFrame(64))
    val deleted = store.deleteWhere("wdb", "nopk", col("cls") === "c2")
    assert(deleted == 16L)
    assertExact(store.read("wdb", "nopk"),
      rangedFrame(64).filter(col("cls") =!= "c2"))
  }

  test("deleteWhere composes with IVM: the commit's changelog folds the dashboards") {
    import graft.operators.Ivm
    val store = mkStore()
    register(store, "ivm")
    store.overwrite("wdb", "ivm", rangedFrame())
    val spec = Ivm.countSumSpec("agg", col("cls"), col("v"))
    val agg0 = spec.seed(store.read("wdb", "ivm"))
    val v1 = store.latestVersion("wdb", "ivm")
    store.deleteWhere("wdb", "ivm", col("v") >= 200L)
    val v2 = store.latestVersion("wdb", "ivm")
    // a deleteWhere commit is an ordinary version transition: its
    // change feed is a fold like any CDC batch's
    val folded = spec.fold(agg0,
      store.readVersion(store.catalog("wdb", "ivm"), v1),
      store.read("wdb", "ivm"),
      store.changesBetween("wdb", "ivm", v1, v2), Seq("id"))
    val rebuilt = spec.seed(store.read("wdb", "ivm"))
    assertExact(folded, rebuilt)
  }

  // ---------------------------------------------------------- updateWhere

  test("updateWhere: matched rows take the assignments, others pass through byte-identical") {
    val store = mkStore()
    register(store, "upd")
    store.overwrite("wdb", "upd", rangedFrame())
    val n = store.updateWhere("wdb", "upd", col("cls") === "c1",
      Map("v" -> (col("v") + 1000L), "nm" -> concat(lit("x:"), col("nm"))))
    assert(n == 64L)
    val want = rangedFrame().select(col("id"),
      when(col("cls") === "c1", col("v") + 1000L).otherwise(col("v")).as("v"),
      when(col("cls") === "c1", concat(lit("x:"), col("nm")))
        .otherwise(col("nm")).as("nm"),
      col("cls"))
    assertExact(store.read("wdb", "upd"), want)
  }

  test("updateWhere: SET a = b, b = a swaps (assignments see the PRE-update row)") {
    import spark.implicits._
    val store = mkStore()
    register(store, "swap")
    store.overwrite("wdb", "swap",
      Seq((1L, 10L, 20L), (2L, 3L, 4L)).toDF("id", "a", "b"))
    assert(store.updateWhere("wdb", "swap", col("id") === 1L,
      Map("a" -> col("b"), "b" -> col("a"))) == 1L)
    val got = store.read("wdb", "swap").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 20L, 10L), (2L, 3L, 4L)))
  }

  test("updateWhere: assignments cast to the column's existing type; schema never moves") {
    val store = mkStore()
    register(store, "cast")
    store.overwrite("wdb", "cast", rangedFrame(32))
    store.updateWhere("wdb", "cast", col("id") === 1L,
      Map("v" -> lit(7))) // int literal into a LONG column
    val schema = store.read("wdb", "cast").schema
    assert(schema("v").dataType == org.apache.spark.sql.types.LongType,
      s"assignment must cast into the column's type, got $schema")
    assert(store.read("wdb", "cast").filter(col("id") === 1L)
      .head().getLong(1) == 7L)
  }

  test("updateWhere: NULL-predicate rows stay; a no-match update commits nothing") {
    import spark.implicits._
    val store = mkStore()
    register(store, "unul")
    store.overwrite("wdb", "unul",
      Seq((1L, Some(5L)), (2L, None)).toDF("id", "v"))
    assert(store.updateWhere("wdb", "unul", col("v") > 1L,
      Map("v" -> lit(0L))) == 1L)
    val got = store.read("wdb", "unul").orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got.toSeq == Seq((1L, Some(0L)), (2L, None)))
    val v = store.latestVersion("wdb", "unul")
    assert(store.updateWhere("wdb", "unul", col("v") > 100L,
      Map("v" -> lit(1L))) == 0L)
    assert(store.latestVersion("wdb", "unul") == v)
  }

  test("updateWhere: changesBetween yields the U changelog of value-changed rows") {
    val store = mkStore()
    register(store, "uchg")
    store.overwrite("wdb", "uchg", rangedFrame(64))
    val v1 = store.latestVersion("wdb", "uchg")
    store.updateWhere("wdb", "uchg", col("id") < 4L, Map("v" -> lit(-1L)))
    val log = store.changesBetween("wdb", "uchg", v1, v1 + 1).collect()
    assert(log.nonEmpty && log.forall(_.getAs[String]("change") == "U"))
    assert(log.map(_.getAs[Long]("id")).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("updateWhere: PK assignment, unknown columns and nondeterminism refuse") {
    val store = mkStore()
    register(store, "uref")
    store.overwrite("wdb", "uref", rangedFrame(16))
    assert(intercept[IllegalArgumentException] {
      store.updateWhere("wdb", "uref", col("v") > 0L, Map("id" -> lit(0L)))
    }.getMessage.contains("primary-key"))
    intercept[IllegalArgumentException] {
      store.updateWhere("wdb", "uref", col("v") > 0L, Map("nope" -> lit(0L)))
    }
    assert(intercept[IllegalArgumentException] {
      store.updateWhere("wdb", "uref", col("v") > 0L,
        Map("v" -> (rand() * 10).cast("long")))
    }.getMessage.contains("deterministic"))
    intercept[IllegalArgumentException] {
      store.updateWhere("wdb", "uref", rand() > 0.5, Map("v" -> lit(0L)))
    }
    intercept[IllegalArgumentException] {
      store.updateWhere("wdb", "uref", col("v") > 0L, Map.empty)
    }
  }

  test("deleteWhere vs concurrent commits: provably-clean rebase, may-match refusal") {
    import spark.implicits._
    // a REAL retention window: with retention 0 the racing writer's
    // vacuum reclaims this delete's written-but-unpublished dir (orphan
    // reclaim is tombstone-gated in production precisely so in-flight
    // writers finish inside the window)
    val store = new MergeSnapshotStore(spark, new InMemoryCatalog,
      nBuckets = 8, keepVersions = 2, vacuumRetentionMs = 3600000L)
    val meta = TableMeta("wdb", "race",
      Files.createTempDirectory("graft-where-race").toString,
      primaryKey = Seq("id"),
      properties = Map(MergeSnapshotStore.SetStatsProp -> "cls"))
    store.catalog.register(meta)
    def bucketOfId(id: Long): Int =
      spark.range(id, id + 1).select(store.bucketOf(Seq(col("id"))))
        .head().getInt(0)
    val ids = (0L until 64L).map(i => i -> bucketOfId(i))
    val (idA, bA) = ids.head                       // the doomed row
    val (idB, _) = ids.find(_._2 != bA).get        // a clean racer's row
    val (idC, _) = ids.tail.find(_._2 == bA).get   // same-bucket racer
    store.overwrite("wdb", "race",
      (0L until 64L).map(i =>
        (i, if (i == idA) "gone" else "keep")).toDF("id", "cls"))
    // CLEAN rebase: while the delete of the 'gone' row is between write
    // and publish, a merge rewrites idB's bucket — every row it writes
    // is 'keep', the value-set line PROVES no 'gone' row appeared, so
    // the rebase guard lets the delete carry the winner's work
    store.beforePublish = () => {
      store.mergeScoped("wdb", "race",
        Seq(idB).toDF("id"))(old => old.filter(col("id") =!= idB))
      ()
    }
    assert(store.deleteWhere("wdb", "race", col("cls") === "gone") == 1L)
    assert(store.read("wdb", "race").filter(col("id").isin(idA, idB)).count() == 0,
      "both the rebased delete and the racing merge must stand")
    // MAY-MATCH refusal (the Delta ConcurrentAppendException contract):
    // a racing merge INSERTS a row the in-flight delete's predicate
    // matches, into a bucket the delete never touched — the delete's
    // find phase never scanned it, so rebasing would let a matching
    // row survive a "successful" takedown; it must refuse instead
    val (idD, _) = ids.find(i => i._2 != bucketOfId(1000L) && i._2 != bA).get
    store.mergeScoped("wdb", "race", Seq(idD).toDF("id"))(old =>
      old.filter(col("id") =!= idD)
        .unionByName(Seq((idD, "doomed2")).toDF("id", "cls")))
    store.beforePublish = () => {
      store.mergeScoped("wdb", "race", Seq(1000L).toDF("id"))(old =>
        old.unionByName(Seq((1000L, "doomed2")).toDF("id", "cls")))
      ()
    }
    intercept[java.util.ConcurrentModificationException] {
      store.deleteWhere("wdb", "race", col("cls") === "doomed2")
    }
    store.beforePublish = () => ()
    // shared-bucket adjudication still fires first: a racer moving the
    // SAME bucket the delete touched refuses regardless of values
    store.beforePublish = () => {
      store.mergeScoped("wdb", "race", Seq(idC).toDF("id"))(old => old)
      ()
    }
    intercept[java.util.ConcurrentModificationException] {
      store.deleteWhere("wdb", "race", col("id") === idC)
    }
  }
}
