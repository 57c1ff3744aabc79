package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}

/**
 * Model-based interleaving property for the DML surface: a pseudo-random
 * sequence of CDC upserts, CDC deletes, merge-on-read deletes,
 * copy-on-write deletes, compactions, and partial debt folds
 * ([[MergeSnapshotStore.compactDebt]]) applied to BOTH the merge
 * store and a driver-side Map model — after every operation the store's
 * logical snapshot must equal the model exactly, and a stats-pruned
 * readWhere band must equal the model's filter. This is the composition
 * surface no single-op spec covers: sidecars layered over rewrites over
 * sidecars, sequence-rule exemptions from re-upserts of MoR-deleted
 * keys, dead-sidecar pruning mid-history, and compaction folding it all
 * flat.
 */
class MorPropSpec extends AnyFunSuite with SparkFixture {

  private val Mor = MergeSnapshotStore.MergeOnRead

  private def check(store: MergeSnapshotStore, tbl: String,
                    model: Map[Long, (Long, String)], at: String): Unit = {
    val got = store.read("pdb", tbl).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == model, s"store diverged from the model after $at")
  }

  test("random DML interleavings: store == model after every operation") {
    import spark.implicits._
    for (seed <- Seq(1L, 2L, 3L)) {
      val rnd = new scala.util.Random(20260815L * seed)
      val store = new MergeSnapshotStore(spark, new InMemoryCatalog,
        nBuckets = 4, keepVersions = 3, vacuumRetentionMs = 60000L)
      val tbl = s"t$seed"
      store.catalog.register(TableMeta("pdb", tbl,
        Files.createTempDirectory(s"graft-morprop-$tbl").toString,
        primaryKey = Seq("id")))
      var model: Map[Long, (Long, String)] =
        (0L until 48L).map(i => i -> ((i * 3, s"c${i % 4}"))).toMap
      def frame(m: Map[Long, (Long, String)]): DataFrame =
        m.toSeq.map { case (k, (v, c)) => (k, v, c) }.toDF("id", "v", "cls")
      store.overwrite("pdb", tbl, frame(model))
      check(store, tbl, model, "seed")

      for (step <- 1 to 10) {
        val op = rnd.nextInt(7)
        val what = op match {
          case 0 => // CDC upsert: random keys take fresh values (some new)
            val keys = (0 until 6).map(_ => rnd.nextLong(64)).distinct
            val imgs = keys.map(k => k -> ((rnd.nextLong(1000),
              s"c${rnd.nextInt(4)}")))
            val chg = imgs.map { case (k, (v, c)) => (k, v, c) }
              .toDF("id", "v", "cls")
            store.mergeScoped("pdb", tbl, chg.select("id")) { old =>
              old.join(chg.select("id"), Seq("id"), "left_anti")
                .unionByName(chg.select(old.columns.map(col).toIndexedSeq: _*))
            }
            model = model ++ imgs
            s"upsert(${keys.mkString(",")})"
          case 1 => // CDC delete of random existing keys
            val keys = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(4))
            if (keys.nonEmpty) {
              store.mergeScoped("pdb", tbl, keys.toDF("id"))(old =>
                old.filter(!col("id").isin(keys: _*)))
              model = model -- keys
            }
            s"cdcDelete(${keys.mkString(",")})"
          case 2 => // merge-on-read delete by value band
            val lo = rnd.nextLong(900)
            val hi = lo + rnd.nextLong(200)
            val n = store.deleteWhere("pdb", tbl,
              col("v") >= lo && col("v") <= hi, Mor)
            val matched = model.filter { case (_, (v, _)) => v >= lo && v <= hi }
            assert(n == matched.size, s"MoR count at [$lo,$hi]")
            model = model -- matched.keys
            s"morDelete[$lo,$hi]"
          case 3 => // copy-on-write delete by class
            val cls = s"c${rnd.nextInt(4)}"
            val n = store.deleteWhere("pdb", tbl, col("cls") === cls)
            val matched = model.filter { case (_, (_, c)) => c == cls }
            assert(n == matched.size, s"CoW count at $cls")
            model = model -- matched.keys
            s"cowDelete($cls)"
          case 4 => // compaction folds every sidecar flat
            store.compact("pdb", tbl, targetFiles = 1)
            assert(store.manifestDeletes("pdb", tbl,
              store.latestVersion("pdb", tbl)).isEmpty,
              "compaction must clear the sidecar list")
            "compact"
          case 5 => // PARTIAL debt fold: only key-owning buckets rewrite
            store.compactDebt("pdb", tbl)
            assert(store.manifestDeletes("pdb", tbl,
              store.latestVersion("pdb", tbl)).isEmpty,
              "the partial fold must clear the sidecar list")
            "compactDebt"
          case 6 => // the cron policy: smear + debt fold in one
            // clustered commit when either advisor fires (answer must
            // never move either way)
            store.maintainIfAdvised("pdb", tbl, layout = Seq("v"),
              filesPerBucket = 2, adviseAtSidecars = 1)
            "maintainIfAdvised"
        }
        check(store, tbl, model, s"seed=$seed step=$step $what")
        // the stats-pruned band read answers from the same logical view
        val band = store.readWhere("pdb", tbl,
          col("v") >= 100L && col("v") < 500L).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
        assert(band == model.filter { case (_, (v, _)) => v >= 100 && v < 500 },
          s"readWhere band diverged at seed=$seed step=$step $what")
      }
    }
  }

  test("random PK-less interleavings: position deletes == multiset model") {
    import spark.implicits._
    // PK-less tables have no row identity, so the model is a MULTISET —
    // the seed data deliberately carries duplicate rows (v collides mod
    // 40), the shape where equality semantics would be WRONG (all copies
    // die) and position semantics must erase exactly the matched
    // physical rows. Interleaves position MoR deletes, copy-on-write
    // deletes, compactions, and partial debt folds (file-granular
    // carry); after every op the store's logical snapshot equals the
    // model's multiset exactly.
    for (seed <- Seq(1L, 2L, 3L)) {
      val rnd = new scala.util.Random(20260815L * seed + 7)
      val store = new MergeSnapshotStore(spark, new InMemoryCatalog,
        nBuckets = 4, keepVersions = 3, vacuumRetentionMs = 60000L)
      val tbl = s"p$seed"
      store.catalog.register(TableMeta("pdb", tbl,
        Files.createTempDirectory(s"graft-morprop-$tbl").toString))
      var model: Seq[(Long, String)] =
        (0L until 48L).map(i => (i * 3 % 40, s"c${i % 4}"))
      store.overwrite("pdb", tbl,
        model.toDF("v", "cls").repartition(4, col("v")))
      def check(at: String): Unit = {
        val got = store.read("pdb", tbl).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
        assert(got == model.sorted, s"store diverged from the model after $at")
      }
      check("seed")
      for (step <- 1 to 8) {
        val what = rnd.nextInt(5) match {
          case 0 => // position MoR delete by value band
            val lo = rnd.nextLong(40)
            val hi = lo + rnd.nextLong(15)
            val n = store.deleteWhere("pdb", tbl,
              col("v") >= lo && col("v") <= hi, Mor)
            val (dead, live) = model.partition { case (v, _) => v >= lo && v <= hi }
            assert(n == dead.size,
              s"pos count at [$lo,$hi]: got $n want ${dead.size}")
            model = live
            s"posDelete[$lo,$hi]"
          case 1 => // copy-on-write delete by class (single-bucket rewrite)
            val cls = s"c${rnd.nextInt(4)}"
            val n = store.deleteWhere("pdb", tbl, col("cls") === cls)
            val (dead, live) = model.partition(_._2 == cls)
            assert(n == dead.size, s"CoW count at $cls")
            model = live
            s"cowDelete($cls)"
          case 2 => // compaction folds position sidecars flat
            store.compact("pdb", tbl, targetFiles = 2)
            assert(store.manifestDeletes("pdb", tbl,
              store.latestVersion("pdb", tbl)).isEmpty,
              "compaction must clear the position sidecar list")
            "compact"
          case 3 => // PARTIAL debt fold: only addressed files rewrite,
            // the rest carry as file-granular manifest lines
            store.compactDebt("pdb", tbl)
            assert(store.manifestDeletes("pdb", tbl,
              store.latestVersion("pdb", tbl)).isEmpty,
              "the partial fold must clear the position sidecar list")
            "compactDebt"
          case 4 => // the PK-less cron policy: file-scoped clustered
            // fold of smear + addressed files in one commit
            store.maintainIfAdvised("pdb", tbl, layout = Seq("v"),
              filesPerBucket = 2, adviseAtSidecars = 1)
            "maintainIfAdvised"
        }
        check(s"seed=$seed step=$step $what")
      }
    }
  }
}
