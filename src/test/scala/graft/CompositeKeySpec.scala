package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}
import graft.model.CdcModel
import graft.operators.{ChangeLogApplier, Ivm, Scd}
import graft.operators.ChangeLogApplier._

/**
 * Composite (multi-column) primary keys end-to-end. The reference's PK
 * registry is single-column (reference
 * src/apply_change_log_to_delta.py:141-150), but real GoldenGate feeds
 * routinely carry multi-column keys — the CDC apply, the store's bucketed
 * merge/lookup, the change feed, and the scoped IVM all key on the full
 * tuple here. Twin of the single-PK CDC golden tests in
 * [[ChangeLogApplierSpec]] / [[MergeStoreSpec]]; those stay untouched.
 */
class CompositeKeySpec extends AnyFunSuite with SparkFixture {

  // ---- CDC apply on a (id, region) key ----

  private val tSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("region", StringType),
    StructField("name", StringType)) ++ CdcModel.adminFields)

  private def mkTarget(rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), tSchema)

  private def targetRow(id: Int, region: String, name: String, h: Int): Row =
    Row(id, region, name, h, "0" * 20, null, null)

  /** (id, region, name, opType, pos, afterHash, beforeHash) through the
   * real expression mapper — same envelope as the single-PK fixture. */
  private def mkEvents(evs: (Int, String, String, String, String, Int, Int)*): DataFrame = {
    val payload = StructType(Seq(
      StructField("ID", IntegerType), StructField("REGION", StringType),
      StructField("NAME", StringType)))
    val schema = StructType(Seq(
      StructField("table", StringType), StructField("op_type", StringType),
      StructField("op_ts", StringType), StructField("pos", StringType),
      StructField("before", payload), StructField("after", payload),
      StructField("after_hash", IntegerType), StructField("before_hash", IntegerType)))
    val rows = evs.map { case (id, region, name, op, pos, ah, bh) =>
      val img = Row(id, region, name)
      Row("S.T", op, "2022-09-26 14:57:13.817732", pos,
        if (op == "I") null else img, if (op == "D") null else img, ah, bh)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  private val pks = Seq("id", "region")

  test("CDC twin: a D on (1,a) deletes only that tuple — (1,b) survives") {
    val t = mkTarget(
      targetRow(1, "a", "one-a", 100),
      targetRow(1, "b", "one-b", 101),
      targetRow(2, "a", "two-a", 102))
    val ev = mkEvents((1, "a", "one-a", "D", "00000000000000000001", 100, 100))
    Seq(
      applyLastWins(t, mapEvents(ev, tSchema), pks),
      applyFold(t, mapEvents(ev, tSchema), pks, chainVerified = false)
    ).foreach { out =>
      val left = out.select("id", "region").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      assert(left == Set((1, "b"), (2, "a")))
    }
  }

  test("CDC twin: fold and last-wins agree; per-tuple last event wins") {
    val t = mkTarget(targetRow(1, "a", "old-a", 100), targetRow(1, "b", "old-b", 101))
    val ev = mkEvents(
      (1, "a", "mid", "U", "00000000000000000002", 1, 0),
      (1, "a", "last", "U", "00000000000000000003", 2, 1),
      (1, "b", "only", "U", "00000000000000000002", 3, 0),
      (9, "c", "fresh", "I", "00000000000000000001", 4, 0))
    val mapped = mapEvents(ev, tSchema)
    val lw = applyLastWins(t, mapped, pks).drop(CdcModel.AdminEventTs)
    val fold = applyFold(t, mapped, pks, chainVerified = false)
      .drop(CdcModel.AdminEventTs)
    assert(lw.exceptAll(fold).count() == 0 && fold.exceptAll(lw).count() == 0)
    val names = lw.select("id", "region", "name").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getString(2)).toMap
    assert(names == Map((1, "a") -> "last", (1, "b") -> "only", (9, "c") -> "fresh"))
  }

  test("fold group keys are prefix-free: (ab,c) never aliases (a,bc)") {
    // naive string concatenation would merge both tuples into one "abc"
    // group and let the D below delete the wrong row; the length-prefixed
    // tuple key keeps them apart
    val sSchema = StructType(Seq(
      StructField("k1", StringType), StructField("k2", StringType),
      StructField("name", StringType)) ++ CdcModel.adminFields)
    val t = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("ab", "c", "first", 100, "0" * 20, null, null),
      Row("a", "bc", "second", 101, "0" * 20, null, null))), sSchema)
    val payload = StructType(Seq(
      StructField("K1", StringType), StructField("K2", StringType),
      StructField("NAME", StringType)))
    val evSchema = StructType(Seq(
      StructField("table", StringType), StructField("op_type", StringType),
      StructField("op_ts", StringType), StructField("pos", StringType),
      StructField("before", payload), StructField("after", payload),
      StructField("after_hash", IntegerType), StructField("before_hash", IntegerType)))
    val ev = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("S.T", "D", "2022-09-26 14:57:13.817732", "00000000000000000001",
        Row("ab", "c", "first"), null, 1, 1))), evSchema)
    val out = applyFold(t, mapEvents(ev, sSchema), Seq("k1", "k2"),
      chainVerified = false)
      .select("k1", "k2").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "bc")))
  }

  // ---- merge store keyed on the tuple ----

  private def mkStore(nBuckets: Int = 8): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = nBuckets,
      keepVersions = 2, vacuumRetentionMs = 0L)

  private def tupleTable(n: Int): DataFrame =
    spark.range(1, n + 1).select(
      col("id").cast("int").as("id"),
      concat(lit("r"), pmod(col("id"), lit(3)).cast("int")).as("region"),
      concat(lit("name-"), col("id")).as("name"))

  test("store: composite-PK mergeScoped upserts and deletes by tuple") {
    import spark.implicits._
    val store = mkStore()
    store.catalog.register(TableMeta("cdb", "ct",
      Files.createTempDirectory("graft-composite-ct").toString,
      primaryKey = pks))
    store.overwrite("cdb", "ct", tupleTable(100))
    // upsert (7, r1) — the OTHER (7, *) tuple must be untouched; delete (8, r2)
    val changed = Seq((7, "r1"), (8, "r2")).toDF("id", "region")
    store.mergeScoped("cdb", "ct", changed) { old =>
      old.filter(!(col("id") === 8 && col("region") === "r2"))
        .withColumn("name",
          when(col("id") === 7 && col("region") === "r1", lit("upserted"))
            .otherwise(col("name")))
    }
    val back = store.read("cdb", "ct")
    assert(back.count() == 99)
    assert(back.filter(col("id") === 8).count() == 0) // 8 mod 3 = 2 -> only (8, r2) existed
    assert(back.filter(col("id") === 7 && col("region") === "r1")
      .select("name").head().getString(0) == "upserted")
  }

  test("store: composite pointLookup equals full-scan filter and prunes to the tuples' buckets") {
    import spark.implicits._
    val store = mkStore(nBuckets = 8)
    store.catalog.register(TableMeta("cdb", "cpl",
      Files.createTempDirectory("graft-composite-cpl").toString,
      primaryKey = pks))
    store.overwrite("cdb", "cpl", tupleTable(200))
    val keys = Seq((5, "r2"), (37, "r1"), (90, "r0")).toDF("id", "region")
    val got = store.pointLookup("cdb", "cpl", keys)
    val expect = store.read("cdb", "cpl").filter(
      (col("id") === 5 && col("region") === "r2") ||
        (col("id") === 37 && col("region") === "r1") ||
        (col("id") === 90 && col("region") === "r0"))
    assert(got.exceptAll(expect).count() == 0 && expect.exceptAll(got).count() == 0)
    assert(got.count() == 3)
    // pruning: planned files live only in the tuples' hash buckets
    val wantBuckets = keys.select(store.bucketOf(
        Seq(col("id").cast("int"), col("region"))).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val gotBuckets = got.inputFiles.flatMap { f =>
      val i = f.indexOf("__b=")
      if (i < 0) None else Some(f.substring(i + 4, f.indexOf('/', i)).toInt)
    }.toSet
    assert(gotBuckets.nonEmpty && gotBuckets.subsetOf(wantBuckets),
      s"lookup scanned buckets $gotBuckets, keys hash to $wantBuckets")
    val allFiles = store.read("cdb", "cpl").inputFiles.toSet
    assert(got.inputFiles.toSet.size < allFiles.size)
    // a mixed lookup frame casts key parts to the committed types
    val castKeys = Seq((5L, "r2")).toDF("id", "region") // long vs committed int
    assert(store.pointLookup("cdb", "cpl", castKeys).count() == 1)
  }

  test("store: changesBetween diffs on the composite key") {
    import spark.implicits._
    val store = mkStore()
    store.catalog.register(TableMeta("cdb", "ccf",
      Files.createTempDirectory("graft-composite-ccf").toString,
      primaryKey = pks))
    store.overwrite("cdb", "ccf", tupleTable(20))
    store.overwrite("cdb", "ccf",
      tupleTable(21).filter(col("id") =!= 3) // (3, r0) deleted, (21, r0) inserted
        .withColumn("name",
          when(col("id") === 5, lit("renamed")).otherwise(col("name"))))
    val chg = store.changesBetween("cdb", "ccf", 0, 1)
      .select("change", "id", "region").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(chg == Set(("D", 3, "r0"), ("I", 21, "r0"), ("U", 5, "r2")))
  }

  test("scoped IVM: maintained aggregate keyed by a composite base PK") {
    import spark.implicits._
    val store = mkStore()
    Seq("cfacts" -> pks, "c_cs" -> Seq("grp")).foreach { case (t, k) =>
      store.catalog.register(TableMeta("cdb", t,
        Files.createTempDirectory(s"graft-composite-$t").toString,
        primaryKey = k))
    }
    val m = new Ivm.MaintainedAggregates(store, "cdb", "cfacts",
      Seq(Ivm.countSumSpec("c_cs", col("grp_in"), col("v"))))
    def snap(rows: Seq[(Int, String, String, Long)]) =
      rows.toDF("id", "region", "grp_in", "v")
    val s0 = Seq((1, "a", "g1", 10L), (1, "b", "g1", 5L), (2, "a", "g2", 30L))
    val s1 = Seq((1, "a", "g1", 11L), (1, "b", "g2", 5L), (3, "a", "g2", 7L))
    m.seed(snap(s0))
    m.commit(Scd.snapshotDiff(snap(s0), snap(s1), pks))
    val base = store.read("cdb", "cfacts")
    def canon(df: DataFrame) = df.collect().map(_.toString).toSet
    assert(canon(base) == canon(snap(s1)))
    assert(canon(m.read("c_cs")) ==
      canon(Ivm.countSumAgg(base, col("grp_in"), col("v"))))
  }
}
