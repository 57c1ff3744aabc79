package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}
import graft.operators.QueryRunner

/**
 * `MERGE INTO` statement dispatch ([[QueryRunner.dml]] → mergeScoped):
 * the CDC apply surface as SQL. Matched/not-matched actions apply in
 * statement order first-match-wins, the commit is partition-scoped
 * (only the source keys' buckets move), the SQL cardinality rule
 * refuses multi-row sources, and everything out of the scopable
 * contract refuses loudly.
 */
class MergeIntoSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 8,
      keepVersions = 2, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String): TableMeta = {
    val meta = TableMeta("gdb", tbl,
      Files.createTempDirectory(s"graft-merge-into-$tbl").toString,
      primaryKey = Seq("id"))
    store.catalog.register(meta)
    meta
  }

  private def frame(n: Int = 64): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i.toLong, s"c${i % 4}"))
      .toDF("id", "v", "cls")
  }

  private def assertExact(got: DataFrame, want: DataFrame): Unit =
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0, "result drifted")

  test("MERGE INTO: delete/update/insert in one statement, scoped commit") {
    import spark.implicits._
    val store = mkStore()
    register(store, "t")
    store.overwrite("gdb", "t", frame())
    // source: keys 0..9 matched (0..4 doomed by the delete arm, 5..9
    // updated), keys 100..104 new (inserted)
    val src = ((0L until 10L).map(i => (i, i * 100)) ++
      (100L until 105L).map(i => (i, i * 100))).toDF("k", "nv")
    src.createOrReplaceTempView("chg")
    val vPre = store.latestVersion("gdb", "t")
    val entriesPre = store.manifestEntries("gdb", "t", vPre)
    def bucketOfId(id: Long): Int =
      spark.range(id, id + 1).select(store.bucketOf(Seq(col("id"))))
        .head().getInt(0)
    val touched = ((0L until 10L) ++ (100L until 105L))
      .map(bucketOfId).toSet

    val runner = new QueryRunner(store)
    val affected = runner.dml("gdb",
      """MERGE INTO t USING chg s ON t.id = s.k
         WHEN MATCHED AND s.k < 5 THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = s.nv, cls = 'm'
         WHEN NOT MATCHED THEN INSERT (id, v, cls) VALUES (s.k, s.nv, 'new')""")
    assert(affected == 15L, s"5 deletes + 5 updates + 5 inserts: $affected")
    val want = frame().filter(col("id") >= 10L || col("id") < 0L)
      .unionByName((5L until 10L).map(i => (i, i * 100, "m"))
        .toDF("id", "v", "cls"))
      .unionByName((100L until 105L).map(i => (i, i * 100, "new"))
        .toDF("id", "v", "cls"))
    assertExact(store.read("gdb", "t"), want)
    // scoped physics: buckets owning no source key carried verbatim
    val entriesPost = store.manifestEntries("gdb", "t",
      store.latestVersion("gdb", "t"))
    (entriesPre.keySet -- touched).foreach { b =>
      assert(entriesPost(b) == entriesPre(b),
        s"bucket $b owns no source key and must carry by reference")
    }
  }

  test("MERGE first-match-wins ordering and unclaimed rows pass through") {
    import spark.implicits._
    val store = mkStore()
    register(store, "ord")
    store.overwrite("gdb", "ord", frame(16))
    Seq((1L, 5L), (2L, 500L), (3L, 5L)).toDF("k", "nv")
      .createOrReplaceTempView("ord_chg")
    val runner = new QueryRunner(store)
    // first arm claims nv > 100 rows (update to 'big'); the second
    // would match EVERY row but only sees what the first left; a third
    // arm condition matching nothing leaves key 3 claimed by arm 2
    val n = runner.dml("gdb",
      """MERGE INTO ord USING ord_chg s ON ord.id = s.k
         WHEN MATCHED AND s.nv > 100 THEN UPDATE SET cls = 'big'
         WHEN MATCHED AND s.nv = 5 THEN UPDATE SET cls = 'small'""")
    assert(n == 3L)
    val got = store.read("gdb", "ord").filter(col("id").isin(1L, 2L, 3L))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "small", 2L -> "big", 3L -> "small"))
    // a source with no matching insert arm ignores unmatched rows
    Seq((999L, 1L)).toDF("k", "nv").createOrReplaceTempView("ord_chg2")
    assert(runner.dml("gdb",
      """MERGE INTO ord USING ord_chg2 s ON ord.id = s.k
         WHEN MATCHED THEN UPDATE SET cls = 'x'""") == 0L)
    assert(store.read("gdb", "ord").filter(col("id") === 999L).isEmpty)
  }

  test("MERGE refusals: cardinality, non-key ON, BY SOURCE, subquery source") {
    import spark.implicits._
    val store = mkStore()
    register(store, "ref")
    store.overwrite("gdb", "ref", frame(16))
    val runner = new QueryRunner(store)
    Seq((1L, 10L), (1L, 20L)).toDF("k", "nv")
      .createOrReplaceTempView("dup_chg")
    val eDup = intercept[IllegalArgumentException] {
      runner.dml("gdb",
        """MERGE INTO ref USING dup_chg s ON ref.id = s.k
           WHEN MATCHED THEN UPDATE SET v = s.nv""")
    }
    assert(eDup.getMessage.contains("cardinality"))
    Seq((1L, 10L)).toDF("k", "nv").createOrReplaceTempView("one_chg")
    val eOn = intercept[IllegalArgumentException] {
      runner.dml("gdb",
        """MERGE INTO ref USING one_chg s ON ref.v = s.nv
           WHEN MATCHED THEN DELETE""")
    }
    assert(eOn.getMessage.contains("primary key") ||
      eOn.getMessage.contains("FULL primary key"))
    val eBySrc = intercept[IllegalArgumentException] {
      runner.dml("gdb",
        """MERGE INTO ref USING one_chg s ON ref.id = s.k
           WHEN MATCHED THEN DELETE
           WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    }
    assert(eBySrc.getMessage.contains("BY SOURCE"))
    val eSub = intercept[IllegalArgumentException] {
      runner.dml("gdb",
        """MERGE INTO ref USING (SELECT 1 AS k) s ON ref.id = s.k
           WHEN MATCHED THEN DELETE""")
    }
    assert(eSub.getMessage.contains("temp view"))
    // nothing above consumed a version
    assert(store.latestVersion("gdb", "ref") == 0)
  }

  test("MERGE with a STORE-table source and star actions") {
    import spark.implicits._
    val store = mkStore()
    register(store, "tgt")
    register(store, "src_t")
    store.overwrite("gdb", "tgt", frame(16))
    store.overwrite("gdb", "src_t",
      Seq((2L, 999L, "z"), (50L, 500L, "w")).toDF("id", "v", "cls"))
    val runner = new QueryRunner(store)
    val n = runner.dml("gdb",
      """MERGE INTO tgt USING src_t ON tgt.id = src_t.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(n == 2L)
    val got = store.read("gdb", "tgt")
    assert(got.filter(col("id") === 2L).head().getLong(1) == 999L)
    assert(got.filter(col("id") === 50L).head().getString(2) == "w")
    assert(got.count() == 17L)
  }
}
