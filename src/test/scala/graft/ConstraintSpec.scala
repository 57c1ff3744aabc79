package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}
import graft.operators.QueryRunner

/**
 * CHECK constraints ([[MergeSnapshotStore.addCheckConstraint]] +
 * writeData's in-flight guard — Delta table-constraint parity). Pins:
 * a violating write fails inside its own job naming the constraint and
 * the violating row, and consumes NO version; conforming writes pass
 * through every commit path (overwrite, scoped merge, update); SQL
 * CHECK semantics (NULL passes, only FALSE violates — so `IS NOT NULL`
 * expresses NOT NULL); ADD validates the existing snapshot first and
 * refuses with a sample row; DROP re-opens the gate; constraints clone
 * with the table; the ALTER TABLE statements dispatch through dml.
 */
class ConstraintSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 4,
      keepVersions = 8, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String): TableMeta = {
    val meta = TableMeta("kdb", tbl,
      Files.createTempDirectory(s"graft-chk-$tbl").toString,
      primaryKey = Seq("id"))
    store.catalog.register(meta)
    meta
  }

  private def frame(n: Int = 64): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i.toLong, s"c${i % 4}"))
      .toDF("id", "v", "cls")
  }

  private def rootMessage(t: Throwable): String = {
    var cur = t
    val sb = new StringBuilder(Option(cur.getMessage).getOrElse(""))
    while (cur.getCause != null && (cur.getCause ne cur)) {
      cur = cur.getCause
      sb.append(" | ").append(Option(cur.getMessage).getOrElse(""))
    }
    sb.toString
  }

  test("a violating write fails in-flight, names the row, consumes no version") {
    val store = mkStore()
    register(store, "t")
    store.addCheckConstraint("kdb", "t", "v_nonneg", "v >= 0")
    store.overwrite("kdb", "t", frame())
    val v0 = store.latestVersion("kdb", "t")
    val ex = intercept[Throwable] {
      store.overwrite("kdb", "t", frame().withColumn("v",
        when(col("id") === 7L, lit(-1L)).otherwise(col("v"))))
    }
    val msg = rootMessage(ex)
    assert(msg.contains("v_nonneg") && msg.contains("\"id\":7"),
      s"the failure must name the constraint and the row: $msg")
    assert(store.latestVersion("kdb", "t") == v0,
      "a violating write must not consume a version")
    assert(store.read("kdb", "t").count() == 64)
  }

  test("every commit path enforces: update and scoped merge included") {
    val store = mkStore()
    register(store, "t")
    store.addCheckConstraint("kdb", "t", "v_nonneg", "v >= 0")
    store.overwrite("kdb", "t", frame())
    // a conforming UPDATE passes…
    store.updateWhere("kdb", "t", col("id") === 3L, Map("v" -> lit(333L)))
    // …a violating one refuses without committing
    val v = store.latestVersion("kdb", "t")
    intercept[Throwable] {
      store.updateWhere("kdb", "t", col("id") === 3L, Map("v" -> lit(-3L)))
    }
    assert(store.latestVersion("kdb", "t") == v)
    // scoped merge: the violating arm refuses too
    intercept[Throwable] {
      store.mergeScoped("kdb", "t",
        frame().filter(col("id") < 4).select("id")) { old =>
        old.withColumn("v", lit(-9L))
      }
    }
    assert(store.latestVersion("kdb", "t") == v)
    assert(store.read("kdb", "t").filter(col("id") === 3L)
      .head().getLong(1) == 333L)
  }

  test("NULL passes (SQL CHECK); IS NOT NULL expresses NOT NULL") {
    val store = mkStore()
    register(store, "t")
    store.addCheckConstraint("kdb", "t", "cls_known", "cls IN ('c0','c1','c2','c3')")
    // a NULL cls makes the IN predicate NULL — SQL CHECK passes it
    store.overwrite("kdb", "t", frame().withColumn("cls",
      when(col("id") === 0L, lit(null).cast("string")).otherwise(col("cls"))))
    assert(store.read("kdb", "t").filter(col("cls").isNull).count() == 1)
    // NOT NULL is the explicit spelling
    store.addCheckConstraint("kdb", "t", "v_present", "v IS NOT NULL")
    intercept[Throwable] {
      store.overwrite("kdb", "t", frame().withColumn("v",
        when(col("id") === 1L, lit(null).cast("long")).otherwise(col("v"))))
    }
  }

  test("ADD validates the existing snapshot and refuses with a sample row") {
    val store = mkStore()
    register(store, "t")
    store.overwrite("kdb", "t", frame().withColumn("v",
      when(col("id") === 9L, lit(-9L)).otherwise(col("v"))))
    val ex = intercept[IllegalArgumentException] {
      store.addCheckConstraint("kdb", "t", "v_nonneg", "v >= 0")
    }
    assert(ex.getMessage.contains("existing row violates"))
    // the constraint was NOT registered: the violating state keeps writing
    store.overwrite("kdb", "t", frame().withColumn("v", lit(-1L)))
    // DROP after a successful ADD re-opens the gate
    store.overwrite("kdb", "t", frame())
    store.addCheckConstraint("kdb", "t", "v_nonneg", "v >= 0")
    store.dropCheckConstraint("kdb", "t", "v_nonneg")
    store.overwrite("kdb", "t", frame().withColumn("v", lit(-1L)))
    assert(store.read("kdb", "t").filter(col("v") < 0).count() == 64)
  }

  test("maintenance is never wedged: restore to a pre-constraint snapshot, compact still runs") {
    val store = mkStore()
    register(store, "t")
    // a violating snapshot committed BEFORE the constraint existed
    store.overwrite("kdb", "t", frame().withColumn("v",
      when(col("id") === 5L, lit(-5L)).otherwise(col("v"))))
    val vBad = store.latestVersion("kdb", "t")
    store.overwrite("kdb", "t", frame())
    store.addCheckConstraint("kdb", "t", "v_nonneg", "v >= 0")
    // RESTORE is metadata-only and never re-validates (Delta's contract)
    store.restore("kdb", "t", vBad)
    // the data-preserving rewrite must NOT refuse on the carried rows —
    // a wedged compact would leave the table unmaintainable until the
    // constraint is dropped
    store.compact("kdb", "t", targetFiles = 4)
    assert(store.read("kdb", "t").filter(col("v") < 0).count() == 1,
      "compact moves existing rows verbatim, violating or not")
    // while genuinely NEW data stays gated
    intercept[Throwable] {
      store.overwrite("kdb", "t", frame().withColumn("v", lit(-1L)))
    }
  }

  test("constraints clone with the table") {
    val store = mkStore()
    register(store, "src")
    store.addCheckConstraint("kdb", "src", "v_nonneg", "v >= 0")
    store.overwrite("kdb", "src", frame())
    store.cloneTable("kdb", "src", "kdb", "dst",
      Files.createTempDirectory("graft-chk-clone").toString + "/t")
    intercept[Throwable] {
      store.overwrite("kdb", "dst", frame().withColumn("v", lit(-1L)))
    }
    assert(store.read("kdb", "dst").count() == 64)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT statements dispatch through dml") {
    val store = mkStore()
    val runner = new QueryRunner(store)
    register(store, "t")
    store.overwrite("kdb", "t", frame())
    assert(runner.dml("kdb",
      "ALTER TABLE t ADD CONSTRAINT v_nonneg CHECK (v >= 0)") == 0L)
    intercept[Throwable] {
      store.overwrite("kdb", "t", frame().withColumn("v", lit(-1L)))
    }
    assert(runner.dml("kdb",
      "ALTER TABLE t DROP CONSTRAINT v_nonneg") == 0L)
    store.overwrite("kdb", "t", frame().withColumn("v", lit(-1L)))
    assert(store.read("kdb", "t").filter(col("v") < 0).count() == 64)
  }
}
