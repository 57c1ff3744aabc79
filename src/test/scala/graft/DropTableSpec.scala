package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, SessionCatalog, TableMeta}
import graft.operators.QueryRunner

/**
 * DROP TABLE ([[MergeSnapshotStore.dropTable]] + the statement form).
 * Pins: the metadata-only default detaches the registration and leaves
 * every byte (re-registering the same names + location re-attaches the
 * committed history unchanged); PURGE deletes the location and REFUSES
 * while shallow clones still borrow it; a purged BORROWER releases its
 * sources' space on their next vacuum (the refs vanish with the
 * manifests); both catalog implementations unregister; the parse cache
 * never serves a purged table.
 */
class DropTableSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(keep: Int = 2): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 4,
      keepVersions = keep, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String): TableMeta = {
    val meta = TableMeta("ddb", tbl,
      Files.createTempDirectory(s"graft-drop-$tbl").toString,
      primaryKey = Seq("id"))
    store.catalog.register(meta)
    meta
  }

  private def frame(n: Int = 64): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i.toLong, s"c${i % 4}"))
      .toDF("id", "v", "cls")
  }

  private def diskBytes(loc: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else f.length()
    val f = new java.io.File(loc)
    if (f.exists()) walk(f) else 0L
  }

  test("metadata-only drop detaches; re-registration re-attaches the history") {
    val store = mkStore()
    val meta = register(store, "t")
    store.overwrite("ddb", "t", frame())
    store.deleteWhere("ddb", "t", col("v") === 10L)
    val want = store.read("ddb", "t").collect().sortBy(_.getLong(0)).toSeq
    assert(!store.dropTable("ddb", "t"), "no purge -> no data deleted")
    assert(store.catalog.get("ddb", "t").isEmpty)
    intercept[NoSuchElementException] { store.read("ddb", "t") }
    assert(diskBytes(meta.location) > 0, "the location must survive")
    // re-attach: same names, same location — the history is all there
    store.catalog.register(meta)
    assert(store.read("ddb", "t").collect().sortBy(_.getLong(0)).toSeq
      == want)
    assert(store.history("ddb", "t").count() == 2)
  }

  test("PURGE deletes the bytes; the parse cache never serves the ghost") {
    val store = mkStore()
    val meta = register(store, "t")
    store.overwrite("ddb", "t", frame())
    store.read("ddb", "t").count() // warm the manifest parse cache
    assert(store.dropTable("ddb", "t", purge = true))
    assert(diskBytes(meta.location) == 0, "purge must delete every byte")
    // a re-registration of the purged location reads NOTHING (loudly) —
    // a warm cache entry would otherwise resurrect the dropped manifest
    store.catalog.register(meta)
    val ex = intercept[Exception] { store.read("ddb", "t") }
    assert(ex.getMessage.contains("manifest") ||
      ex.getMessage.contains("versions"), ex.getMessage)
  }

  test("PURGE refuses while a shallow clone borrows; severing unlocks it") {
    val store = mkStore(keep = 1)
    val src = register(store, "src")
    store.overwrite("ddb", "src", frame())
    val cloneLoc =
      Files.createTempDirectory("graft-drop-clone").toString + "/dst"
    store.cloneTable("ddb", "src", "ddb", "dst", cloneLoc)
    val cloneRows = store.read("ddb", "dst").count()
    val ex = intercept[IllegalArgumentException] {
      store.dropTable("ddb", "src", purge = true)
    }
    assert(ex.getMessage.contains("borrow"), ex.getMessage)
    assert(store.read("ddb", "dst").count() == cloneRows,
      "the refused purge must leave the borrower reading")
    // sever, let the auto-release clear the hold, then purge succeeds
    store.compact("ddb", "dst", targetFiles = 4)
    store.vacuum("ddb", "src", retainMs = Some(0L))
    assert(store.dropTable("ddb", "src", purge = true))
    assert(diskBytes(src.location) == 0)
    assert(store.read("ddb", "dst").count() == cloneRows,
      "the severed clone survives its source's purge")
  }

  test("a PURGED borrower releases the source's space on the next vacuum") {
    val store = mkStore(keep = 1)
    register(store, "src")
    store.overwrite("ddb", "src", frame())
    val cloneLoc =
      Files.createTempDirectory("graft-drop-clone2").toString + "/dst"
    store.cloneTable("ddb", "src", "ddb", "dst", cloneLoc)
    // the source rewrites everything away; the borrower's hold keeps
    // the old directories alive
    store.overwrite("ddb", "src", frame().withColumn("v", col("v") * 2))
    assert(store.vacuum("ddb", "src", retainMs = Some(0L))
      .borrowedSkipped > 0)
    // drop the borrower WITH purge: its manifests (and their absolute
    // refs) vanish, so the next source vacuum frees the space
    store.dropTable("ddb", "dst", purge = true)
    val rep = store.vacuum("ddb", "src", retainMs = Some(0L))
    assert(rep.borrowedSkipped == 0 && rep.dirsReclaimed > 0, s"$rep")
  }

  test("CREATE TABLE statement: full lifecycle from registration to DML") {
    val store = mkStore()
    val runner = new QueryRunner(store)
    val loc = Files.createTempDirectory("graft-create").toString + "/t"
    runner.dml("ddb",
      s"""CREATE TABLE t (id BIGINT, v BIGINT, cls STRING)
          USING parquet LOCATION '$loc'
          TBLPROPERTIES ('graft.pk'='id',
            '${MergeSnapshotStore.RetentionProp}'='60000')""")
    val meta = store.catalog("ddb", "t")
    assert(meta.primaryKey == Seq("id") &&
      meta.properties(MergeSnapshotStore.RetentionProp) == "60000" &&
      !meta.properties.contains("graft.pk"),
      s"the pk rides the typed registration, not the property map: $meta")
    assert(meta.schema.exists(_.fieldNames.toSeq == Seq("id", "v", "cls")))
    // the registered table is immediately a full store table
    store.overwrite("ddb", "t", frame())
    runner.dml("ddb", "DELETE FROM t WHERE v = 10")
    assert(store.read("ddb", "t").count() == 63)
    // IF NOT EXISTS no-ops on a live registration; without it, refuse
    runner.dml("ddb", s"CREATE TABLE IF NOT EXISTS t (id BIGINT) " +
      s"USING parquet LOCATION '$loc'")
    assert(store.read("ddb", "t").count() == 63, "the no-op must not clobber")
    val ex = intercept[IllegalArgumentException] {
      runner.dml("ddb",
        s"CREATE TABLE t (id BIGINT) USING parquet LOCATION '$loc'")
    }
    assert(ex.getMessage.contains("already registered"), ex.getMessage)
    // refusals: no LOCATION; a PK column the schema lacks; bucket
    // transforms; bookkeeping properties
    intercept[IllegalArgumentException] {
      runner.dml("ddb", "CREATE TABLE t2 (id BIGINT) USING parquet")
    }
    intercept[IllegalArgumentException] {
      runner.dml("ddb", s"CREATE TABLE t3 (id BIGINT) USING parquet " +
        s"LOCATION '$loc-3' TBLPROPERTIES ('graft.pk'='nope')")
    }
    intercept[IllegalArgumentException] {
      runner.dml("ddb", s"CREATE TABLE t4 (id BIGINT, d STRING) " +
        s"USING parquet PARTITIONED BY (bucket(4, id)) LOCATION '$loc-4'")
    }
    intercept[IllegalArgumentException] {
      runner.dml("ddb", s"CREATE TABLE t5 (id BIGINT) USING parquet " +
        s"LOCATION '$loc-5' TBLPROPERTIES " +
        s"('${MergeSnapshotStore.HoldsProp}'='x')")
    }
    // DROP + CREATE at the same location re-attaches (the detach story
    // through statements end to end)
    runner.dml("ddb", "DROP TABLE t")
    runner.dml("ddb",
      s"""CREATE TABLE t (id BIGINT, v BIGINT, cls STRING)
          USING parquet LOCATION '$loc'
          TBLPROPERTIES ('graft.pk'='id')""")
    assert(store.read("ddb", "t").count() == 63,
      "re-creating over the surviving location re-attaches the history")
  }

  test("DESCRIBE TABLE and SHOW CREATE TABLE; the rendered DDL re-attaches") {
    val store = mkStore()
    val runner = new QueryRunner(store)
    val loc = Files.createTempDirectory("graft-showcreate").toString + "/t"
    runner.dml("ddb",
      s"""CREATE TABLE t (id BIGINT, v BIGINT, d DECIMAL(10,2),
          cls STRING) USING parquet LOCATION '$loc'
          TBLPROPERTIES ('graft.pk'='id', 'owner2'='graft')""")
    store.overwrite("ddb", "t", frame()
      .withColumn("d", (col("v") + lit(0.5)).cast("decimal(10,2)"))
      .select("id", "v", "d", "cls"))
    // DESCRIBE: the committed head schema + registration trailer
    val desc = runner.sql("ddb", "DESCRIBE TABLE t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("d") == "decimal(10,2)" && desc("id") == "bigint")
    assert(desc("# primary key") == "id" && desc("# format") == "parquet")
    // a widen shows up in DESCRIBE immediately (manifest-head schema)
    store.alterColumnType("ddb", "t", "v",
      org.apache.spark.sql.types.DecimalType(24, 4))
    assert(runner.sql("ddb", "DESC t").collect()
      .find(_.getString(0) == "v").get.getString(1) == "decimal(24,4)")
    // SHOW CREATE renders a statement createTable accepts VERBATIM:
    // drop (detach), run the rendered DDL, the history re-attaches
    val stmt = runner.sql("ddb", "SHOW CREATE TABLE t")
      .head().getString(0)
    assert(stmt.contains("'graft.pk'='id'") && stmt.contains("owner2") &&
      stmt.contains("DECIMAL(24,4)"), stmt)
    val want = store.read("ddb", "t").count()
    runner.dml("ddb", "DROP TABLE t")
    runner.dml("ddb", stmt)
    assert(store.read("ddb", "t").count() == want &&
      store.catalog("ddb", "t").primaryKey == Seq("id") &&
      store.catalog("ddb", "t").properties("owner2") == "graft",
      "the rendered DDL must round-trip the registration")
  }

  test("the DROP TABLE statement rides the dialect; SessionCatalog unregisters") {
    val store = mkStore()
    register(store, "t")
    store.overwrite("ddb", "t", frame())
    new QueryRunner(store).dml("ddb", "DROP TABLE t")
    assert(store.catalog.get("ddb", "t").isEmpty)
    // SessionCatalog: the registration leaves the metastore
    val cat = new SessionCatalog(spark)
    val tmp = Files.createTempDirectory("graft-drop-sess").toString
    cat.register(TableMeta("dsess", "t", s"$tmp/t", primaryKey = Seq("id")))
    val sessStore = new MergeSnapshotStore(spark, cat, nBuckets = 4,
      keepVersions = 2, vacuumRetentionMs = 0L)
    sessStore.overwrite("dsess", "t", frame())
    new QueryRunner(sessStore).dml("dsess", "DROP TABLE t PURGE")
    assert(cat.get("dsess", "t").isEmpty)
    // unknown tables refuse by name, not as a silent no-op
    intercept[NoSuchElementException] {
      new QueryRunner(store).dml("ddb", "DROP TABLE nope")
    }
  }
}
