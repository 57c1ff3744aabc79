package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Materialize}

/**
 * Lifetime contract of [[Materialize]]: cut frames pin executor-storage
 * blocks (localCheckpoint persists and truncates lineage), and on a
 * long-lived session — a 60-query bench run, a standing 100 TB cluster
 * session — un-released cuts are a storage leak. These tests pin the
 * release API against `SparkContext.getPersistentRDDs`, the engine's own
 * ledger of live storage.
 */
class MaterializeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** ids of RDDs the context currently tracks as persisted. */
  private def persisted: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("release() drops a cut's storage blocks, found through derived frames") {
    Materialize.releaseAll() // isolate from other suites sharing the session
    val before = persisted
    val cut = Materialize((1 to 100).toDF("n").withColumn("sq", col("n") * col("n")))
    assert(cut.count() == 100)
    val added = persisted -- before
    assert(added.nonEmpty, "a materialized cut must register persisted blocks")
    // release via a DERIVED frame — the plan scan must find the cut RDD
    Materialize.release(cut.select("sq").filter(col("sq") > 10))
    assert((persisted -- before).isEmpty, "release must unpersist the cut's RDD")
  }

  test("release() on a never-cut frame is a no-op and foreign caches survive") {
    Materialize.releaseAll()
    val plain = (1 to 10).toDF("n")
    Materialize.release(plain) // must not throw
    val cached = (1 to 10).toDF("n").cache()
    assert(cached.count() == 10)
    val before = persisted
    Materialize.release(cached) // user cache is not Materialize's to drop
    assert(persisted == before, "release must only touch cuts it created")
    cached.unpersist(blocking = true)
  }

  test("scoped{} releases exactly the cuts created inside the scope") {
    Materialize.releaseAll()
    val before = persisted
    val outside = Materialize((1 to 50).toDF("n"))
    assert(outside.count() == 50)
    val outsideBlocks = persisted -- before
    Materialize.scoped {
      val inside = Materialize((1 to 50).toDF("m"))
      assert(inside.count() == 50)
      assert((persisted -- before -- outsideBlocks).nonEmpty)
    }
    assert(persisted -- before == outsideBlocks,
      "scope exit must release inner cuts and leave outer cuts alone")
    Materialize.release(outside)
    assert((persisted -- before).isEmpty)
  }

  test("releaseAll() sweeps every live cut") {
    Materialize.releaseAll()
    val before = persisted
    val a = Materialize((1 to 20).toDF("a"))
    val b = Materialize((1 to 20).toDF("b"))
    assert(a.count() + b.count() == 40)
    assert((persisted -- before).nonEmpty)
    Materialize.releaseAll()
    assert((persisted -- before).isEmpty)
  }

  test("release() reaches cuts hidden behind an RDD bridge (runningTotal)") {
    import graft.operators.PrefixScan
    Materialize.releaseAll()
    val before = persisted
    // runningTotal folds its internal cut through the RDD API and
    // re-wraps with createDataFrame, so the cut is absent from the
    // result's logical plan — release must find it via RDD lineage
    val toks = (1 to 200).map(i => (i.toLong, i % 7)).toDF("id", "n")
    val res = PrefixScan.runningTotal(toks, "id", "n", "cum", buckets = 4)
    assert(res.count() == 200)
    assert((persisted -- before).nonEmpty, "the internal cut must be live")
    Materialize.release(res)
    assert((persisted -- before).isEmpty,
      "release must reach the cut through the dependency chain")
  }

  test("releaseAll is session-scoped: another session's cuts survive a sweep") {
    Materialize.releaseAll()
    val before = persisted
    // second SparkSession on the SAME SparkContext — the multi-tenant JVM
    // shape (notebook servers, shared drivers) where a process-global
    // registry would let one tenant's sweep drop another's cuts
    val other = spark.newSession()
    val mine = Materialize((1 to 20).toDF("a"))
    val theirs = Materialize(other.range(20).toDF("b"))
    assert(mine.count() == 20 && theirs.count() == 20)
    assert((persisted -- before).size >= 2)
    Materialize.releaseAll(spark)
    assert((persisted -- before).nonEmpty,
      "sweeping one session must not release the other session's cuts")
    assert(theirs.count() == 20, "the other session's cut must stay readable")
    Materialize.releaseAll(other)
    assert((persisted -- before).isEmpty)
  }

  test("release() frees an internal nested cut with its LAST parent") {
    Materialize.releaseAll()
    val before = persisted
    val inner = Materialize.internal((1 to 60).toDF("n"))
    assert(inner.count() == 60)
    val outer1 = Materialize(inner.withColumn("sq", col("n") * col("n")))
    val outer2 = Materialize(inner.withColumn("cb", col("n") + 1))
    assert(outer1.count() == 60 && outer2.count() == 60)
    Materialize.release(outer1)
    // outer2 still references the shared inner cut — it must survive
    assert(outer2.count() == 60)
    assert((persisted -- before).nonEmpty,
      "a shared internal cut must outlive the first parent's release")
    Materialize.release(outer2)
    assert((persisted -- before).isEmpty,
      "the internal cut must be freed with its last registered parent")
  }

  test("an internal 3-deep chain is fully freed by the outermost release") {
    Materialize.releaseAll()
    val before = persisted
    val a = Materialize.internal((1 to 30).toDF("n"))
    val b = Materialize.internal(a.withColumn("x", col("n") + 1))
    val c = Materialize(b.withColumn("y", col("x") + 1))
    assert(c.count() == 30)
    Materialize.release(c)
    assert((persisted -- before).isEmpty,
      "releasing the outermost cut must free the whole internal chain")
  }

  test("plain apply() cuts are never cascade-freed by a parent's release") {
    Materialize.releaseAll()
    val before = persisted
    // the iterative-operator shape: a shared input cut read across
    // rounds while superseded round cuts are released eagerly
    val sharedInput = Materialize((1 to 40).toDF("n"))
    assert(sharedInput.count() == 40)
    val round = Materialize(sharedInput.withColumn("x", col("n") + 1))
    assert(round.count() == 40)
    Materialize.release(round)
    assert(sharedInput.count() == 40,
      "releasing a round cut must not free the shared input it was built on")
    Materialize.release(sharedInput)
    assert((persisted -- before).isEmpty)
  }

  test("dedupPipeline's inner doc-set/key cuts free with its own frames — no leak") {
    Materialize.releaseAll()
    val before = persisted
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 150)
    val dd = Dedup.dedupPipeline(docs, "doc_id", "text", n = 1, threshold = 0.95)
    assert(dd.pairs.count() > 0 && dd.keep.count() > 0 && dd.labels.count() > 0)
    assert((persisted -- before).nonEmpty)
    // releasing the pipeline's three visible frames must also free the
    // INNER doc-set/key cuts jaccardPairs created under the pair cut —
    // before internal-cut ownership they leaked until releaseAll
    Materialize.release(dd.pairs)
    Materialize.release(dd.labels)
    Materialize.release(dd.keep)
    assert((persisted -- before).isEmpty,
      s"dedupPipeline leaked block sets: ${persisted -- before}")
  }

  test("fanOut: worker cuts join the caller's scope, siblings share them live") {
    Materialize.releaseAll()
    val before = persisted
    val shared = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.DataFrame]()
    val latch = new java.util.concurrent.CountDownLatch(1)
    Materialize.scoped {
      Materialize.fanOut(Seq(1, 2)) {
        case 1 =>
          shared.set(Materialize.eager(spark.range(10).toDF("v")))
          latch.countDown()
        case _ =>
          // the sibling reads the cut worker 1 created — per-task scope
          // release would kill it mid-read (the BM25 memo hazard);
          // fanOut defers release to the CALLER's scope instead
          latch.await()
          assert(shared.get().count() == 10)
      }
      assert(shared.get().count() == 10, "cut live until the scope closes")
      assert((persisted -- before).nonEmpty)
    }
    assert((persisted -- before).isEmpty,
      "fanOut worker cuts must release when the caller's scope closes")
  }

  test("fanOut: a failure propagates after every sibling settles; no leak") {
    Materialize.releaseAll()
    val before = persisted
    val sibling = new java.util.concurrent.atomic.AtomicBoolean(false)
    val err = intercept[RuntimeException] {
      Materialize.scoped {
        Materialize.fanOut(Seq(1, 2)) {
          case 1 =>
            Materialize.eager(spark.range(5).toDF("v")).count()
            throw new RuntimeException("boom")
          case _ =>
            Thread.sleep(100)
            sibling.set(true)
        }
      }
    }
    assert(err.getMessage == "boom")
    assert(sibling.get, "siblings run to completion before the rethrow")
    assert((persisted -- before).isEmpty,
      "a failed task's cuts still merge into the scope and release")
  }

  test("clusters() releases every per-round frame except the returned labels") {
    Materialize.releaseAll()
    val before = persisted
    // a 6-node chain forces several propagation rounds (pointer jumping)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.clusters(pairs, "doc_a", "doc_b")
    val result = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(result == (1L to 6L).map(_ -> 1L).toMap)
    // after the run, only the final labels' own blocks may remain: edges
    // and every superseded round were released inside the loop
    val leftover = persisted -- before
    assert(leftover.size <= 1,
      s"clusters leaked ${leftover.size} block sets (edges or stale rounds)")
    Materialize.release(labels)
    assert((persisted -- before).isEmpty)
  }
}
