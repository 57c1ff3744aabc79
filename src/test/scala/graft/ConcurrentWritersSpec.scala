package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}

/**
 * REAL thread-level contention over the commit CAS ([[MorPropSpec]]
 * model-checks sequential interleavings; this spec races actual
 * threads): four writers with DISJOINT key ranges fire mixed DML
 * (upsert merges, CoW and MoR deletes, updates) at one shared 4-bucket
 * table — disjoint keys, shared buckets, so scoped commits genuinely
 * collide and must rebase or refuse — while a maintenance thread
 * compacts with retry. Pins: with retry-on-refusal, every writer's ops
 * all land; the final table equals the union of each writer's
 * sequential expectation (a writer's semantics are never corrupted by
 * a racing commit — lost updates impossible); the version log is
 * contiguous with one operation stamp per commit; maintenance changed
 * no answer.
 */
class ConcurrentWritersSpec extends AnyFunSuite with SparkFixture {

  private val Threads = 4
  private val KeysPerThread = 32
  private val OpsPerThread = 6

  private def withRetry[A](what: String)(body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case _: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > 100) fail(s"$what still refused after $attempt attempts")
          Thread.sleep(10L * scala.util.Random.nextInt(5))
      }
    }
    sys.error("unreachable")
  }

  test("racing writers with disjoint keys: all ops land, answers exact") {
    // a REAL retention window: with vacuumRetentionMs = 0 the
    // pinned-reader promise is explicitly void (a racing vacuum may
    // reclaim a just-renamed dir before its publish lands), which is
    // exactly the out-of-contract configuration for concurrent writers
    val store = new MergeSnapshotStore(spark, new InMemoryCatalog,
      nBuckets = 4, keepVersions = 64, vacuumRetentionMs = 600000L)
    store.catalog.register(TableMeta("cdb", "t",
      Files.createTempDirectory("graft-race").toString,
      primaryKey = Seq("id")))
    import spark.implicits._
    val keys = (0 until Threads * KeysPerThread).map(_.toLong)
    store.overwrite("cdb", "t",
      keys.map(k => (k, k)).toDF("id", "v"))

    // each thread's model: its own keys only (None = deleted)
    def runWriter(t: Int): Map[Long, Long] = {
      val rnd = new scala.util.Random(42 + t)
      val base = t.toLong * KeysPerThread
      val model = scala.collection.mutable.Map[Long, Long](
        (base until base + KeysPerThread).map(k => k -> k): _*)
      (0 until OpsPerThread).foreach { i =>
        rnd.nextInt(4) match {
          case 0 => // upsert merge: bump some keys, insert a fresh one
            val bump = model.keys.toSeq.sorted.take(4)
            val fresh = base + 1000L + i
            val rows = (bump.map(k => (k, model(k) + 100L)) :+
              ((fresh, fresh))).toDF("id", "v")
            withRetry(s"t$t merge $i") {
              store.mergeScoped("cdb", "t", rows.select("id")) { old =>
                old.join(rows.withColumnRenamed("v", "__nv"),
                    Seq("id"), "full_outer")
                  .select(col("id"),
                    coalesce(col("__nv"), col("v")).as("v"))
              }
            }
            bump.foreach(k => model(k) = model(k) + 100L)
            model(fresh) = fresh
          case 1 => // CoW point delete
            model.keys.toSeq.sorted.headOption.foreach { k =>
              withRetry(s"t$t cow-del $i") {
                store.deleteWhere("cdb", "t", col("id") === k)
              }
              model.remove(k)
            }
          case 2 => // MoR point delete (sidecar rides reads)
            model.keys.toSeq.sorted.lastOption.foreach { k =>
              withRetry(s"t$t mor-del $i") {
                store.deleteWhere("cdb", "t", col("id") === k,
                  MergeSnapshotStore.MergeOnRead)
              }
              model.remove(k)
            }
          case 3 => // guarded update
            val tgt = model.keys.toSeq.sorted.drop(2).headOption
            tgt.foreach { k =>
              withRetry(s"t$t update $i") {
                store.updateWhere("cdb", "t", col("id") === k,
                  Map("v" -> lit(-k)))
              }
              model(k) = -k
            }
        }
      }
      model.toMap
    }

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintainer = new Thread(() => {
      while (!stop.get()) {
        try store.compact("cdb", "t", targetFiles = 2)
        catch {
          case _: java.util.ConcurrentModificationException => ()
          case scala.util.control.NonFatal(_) => ()
        }
        Thread.sleep(50)
      }
    })
    maintainer.start()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(Threads)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val models =
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          (0 until Threads).map(t => scala.concurrent.Future(runWriter(t)))),
        scala.concurrent.duration.Duration(600, "s"))
      finally { stop.set(true); maintainer.join(); pool.shutdown() }

    val want = models.flatten.toMap
    val got = store.read("cdb", "t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"racing writers corrupted the table: missing=${
        (want.keySet -- got.keySet).toSeq.sorted.take(8)}, stray=${
        (got.keySet -- want.keySet).toSeq.sorted.take(8)}, diffVals=${
        want.keySet.intersect(got.keySet)
          .filter(k => want(k) != got(k)).toSeq.sorted.take(8)}")

    // the version log is contiguous and every commit stamped exactly once
    val hist = store.history("cdb", "t").orderBy("version").collect()
    val versions = hist.map(_.getInt(0)).toSeq
    assert(versions == (versions.head to versions.last),
      s"version log has gaps: $versions")
    assert(hist.forall(_.getString(1) != "unknown"))
  }
}
