package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}
import graft.operators.{Ivm, Materialize, Scd, Similarity, TextAnalysis}

/**
 * Version-pinned serving under concurrent maintenance: a reader that
 * pinned registry versions keeps answering from that snapshot while
 * registry commits land, a CAS race forces a rebase, and vacuum runs at
 * the default retention — and the pin fails LOUDLY once retention
 * genuinely expires it, never silently scanning reclaimed files.
 */
class VersionPinnedServingSpec extends AnyFunSuite with SparkFixture {

  private def freshStore(): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 8)

  private def bm25Registry(db: String): (MergeSnapshotStore,
      Ivm.MaintainedAggregates, DataFrame) = {
    import spark.implicits._
    val store = freshStore()
    val work = Files.createTempDirectory(s"graft-$db").toString
    store.catalog.register(TableMeta(db, "docs", s"$work/docs",
      primaryKey = Seq("doc_id")))
    TextAnalysis.registerBm25Tables(store, db, "bm", work)
    val m = new Ivm.MaintainedAggregates(store, db, "docs",
      TextAnalysis.bm25IndexSpecs("bm", "doc_id", "text"))
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta"), (3L, "gamma delta"),
      (4L, "alpha rare term"), (5L, "beta delta epsilon"),
      (6L, "epsilon zeta"), (7L, "alpha alpha gamma"), (8L, "zeta eta"))
      .toDF("doc_id", "text")
    m.seed(docs)
    (store, m, docs)
  }

  private def serveBm25(store: MergeSnapshotStore, db: String,
                        pin: Map[String, Int]): Seq[String] = {
    import spark.implicits._
    val queries = Seq((100L, "alpha gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopKFromStore(store, db, "bm", queries,
        "doc_id", "text", k = 5, k1 = 1.2, b = 0.75, maxDfFrac = 1.0, pin)
      .orderBy("query_id", "rank")
      .collect().map(_.toString).toSeq
    Materialize.releaseAll()
    out
  }

  test("pinned BM25 serving survives a registry commit and default-retention vacuum") {
    import spark.implicits._
    val (store, m, docs) = bm25Registry("vp1")
    val pin = m.pinVersions()
    // the pin names all five registry tables at their seed versions
    assert(pin.keySet == Set("docs", "bm_postings", "bm_doclens",
      "bm_docfreq", "bm_stats"))
    val before = serveBm25(store, "vp1", pin)
    assert(before.nonEmpty)
    // the changelog REMOVES the top alpha docs and re-weights gamma —
    // a latest-version reader must rank differently
    val newC = docs.filter(col("doc_id") =!= 1L && col("doc_id") =!= 7L)
      .unionByName(Seq((9L, "gamma gamma gamma alpha")).toDF("doc_id", "text"))
    m.commit(Scd.snapshotDiff(store.read("vp1", "docs"), newC, Seq("doc_id")))
    // the commit ran the vacuum cycle at the DEFAULT retention horizon:
    // the seed versions stay resolvable for pinned readers
    val after = serveBm25(store, "vp1", pin)
    assert(after == before,
      s"pinned reader drifted:\n before=$before\n after=$after")
    val latest = serveBm25(store, "vp1", m.pinVersions())
    assert(latest != before, "the changelog was chosen to change ranking")
  }

  test("pinned serving holds through a CAS-rebase interleaving on the base table") {
    import spark.implicits._
    val (store, m, docs) = bm25Registry("vp2")
    val pin = m.pinVersions()
    val before = serveBm25(store, "vp2", pin)
    val v0 = store.latestVersion("vp2", "docs")
    // a concurrent writer lands a DISJOINT-bucket base commit between
    // the registry commit's write and publish: the registry's base
    // merge loses the CAS, rebases carrying the winner's work, and
    // lands — while the pinned reader keeps serving the pin
    val winner = docs.filter(col("doc_id") === 8L)
      .select(col("doc_id"), concat(col("text"), lit(" raced")).as("text"))
    store.beforePublish = () =>
      store.mergeScoped("vp2", "docs", winner.select("doc_id")) { rows =>
        rows.join(winner.select("doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(winner)
      }
    val newC = docs.filter(col("doc_id") =!= 1L)
    m.commit(Scd.snapshotDiff(store.read("vp2", "docs"), newC, Seq("doc_id")))
    // both the winner's and the registry's base commits landed
    assert(store.latestVersion("vp2", "docs") == v0 + 2,
      "expected the racing commit plus the rebased registry commit")
    val after = serveBm25(store, "vp2", pin)
    assert(after == before,
      s"pinned reader drifted through the rebase:\n before=$before\n after=$after")
  }

  test("pinVersions refuses a crashed mid-flight commit until the registry repairs") {
    import spark.implicits._
    val (store, m, docs) = bm25Registry("vp3")
    m.failAfterBaseCommit = true
    val newC = docs.filter(col("doc_id") =!= 2L)
    intercept[IllegalStateException] {
      m.commit(Scd.snapshotDiff(store.read("vp3", "docs"), newC, Seq("doc_id")))
    }
    m.failAfterBaseCommit = false
    // marker says aggsDone=false: a pin now could pair the committed
    // base with stale aggregates — refuse instead
    val err = intercept[IllegalStateException] { m.pinVersions() }
    assert(err.getMessage.contains("pin"))
    // the next commit repairs the registry (stale-incomplete evidence),
    // after which pinning works and serves consistently
    val newC2 = newC.filter(col("doc_id") =!= 3L)
    m.commit(Scd.snapshotDiff(store.read("vp3", "docs"), newC2, Seq("doc_id")))
    val pin = m.pinVersions()
    assert(serveBm25(store, "vp3", pin).nonEmpty)
  }

  test("pinned IVF serving: snapshot answers under commits; expired pin fails loudly") {
    import spark.implicits._
    val store = freshStore()
    val db = "vp4"
    val work = Files.createTempDirectory(s"graft-$db").toString
    store.catalog.register(TableMeta(db, "vecs", s"$work/vecs",
      primaryKey = Seq("vec_id")))
    store.catalog.register(
      Similarity.ivfIndexMeta(db, "vecs_idx", s"$work/vecs_idx"))
    val rnd = new scala.util.Random(11)
    def vec() = Seq.fill(8)(rnd.nextFloat())
    val oldC = (1L to 40L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val cents = Similarity.defaultCentroids(oldC, "vec_id", "embedding", 4)
    val m = new Ivm.MaintainedAggregates(store, db, "vecs",
      Seq(Similarity.ivfIndexSpec("vecs_idx", "vec_id", "embedding", cents)))
    m.seed(oldC)
    val pin = m.pinVersions()
    val q = oldC.filter(col("vec_id") <= 2L)
    def serve(v: Int): Seq[String] = {
      val out = Similarity.ivfTopKFromStore(store, db, "vecs_idx", q,
          "vec_id", "embedding", k = 5, probes = 2, cents, pinVersion = v)
        .collect().map(_.toString).sorted.toSeq
      Materialize.releaseAll()
      out
    }
    val before = serve(pin("vecs_idx"))
    assert(before.nonEmpty)
    // a commit that deletes some of the pinned answers' neighbors
    val newC = oldC.filter(col("vec_id") % 5 =!= 0)
    m.commit(Scd.snapshotDiff(store.read(db, "vecs"), newC, Seq("vec_id")))
    assert(serve(pin("vecs_idx")) == before, "pinned IVF serving drifted")
    val latestPin = m.pinVersions()
    assert(serve(latestPin("vecs_idx")) != before,
      "the delete batch was chosen to change neighbors")
    // retention expiry: an EAGER store (retention 0, keepVersions 2)
    // drops the pinned manifest after two more commits — the pinned
    // read must fail with the retention message, not scan stale dirs
    val eager = new MergeSnapshotStore(spark, new InMemoryCatalog,
      nBuckets = 8, keepVersions = 2, vacuumRetentionMs = 0L)
    eager.catalog.register(TableMeta(db, "t", s"$work/eager",
      primaryKey = Seq("id")))
    eager.overwrite(db, "t", Seq((1L, 10.0)).toDF("id", "v"))
    val pinned = eager.latestVersion(db, "t")
    eager.overwrite(db, "t", Seq((2L, 20.0)).toDF("id", "v"))
    eager.overwrite(db, "t", Seq((3L, 30.0)).toDF("id", "v"))
    val gone = intercept[IllegalArgumentException] {
      eager.pointLookup(db, "t", Seq(1L).toDF("id"),
        version = Some(pinned)).collect()
    }
    assert(gone.getMessage.contains("retained"))
  }

  test("an expired doclens pin fails with the retention error, not a raw file miss") {
    import spark.implicits._
    // eager store: keepVersions 2, zero retention — two commits age the
    // seed manifests out
    val store = new MergeSnapshotStore(spark, new InMemoryCatalog,
      nBuckets = 8, keepVersions = 2, vacuumRetentionMs = 0L)
    val db = "vp5"
    val work = Files.createTempDirectory(s"graft-$db").toString
    store.catalog.register(TableMeta(db, "docs", s"$work/docs",
      primaryKey = Seq("doc_id")))
    TextAnalysis.registerBm25Tables(store, db, "bm", work)
    val m = new Ivm.MaintainedAggregates(store, db, "docs",
      TextAnalysis.bm25IndexSpecs("bm", "doc_id", "text"))
    var cur = Seq((1L, "alpha beta"), (2L, "alpha gamma"))
      .toDF("doc_id", "text")
    m.seed(cur)
    val stale = m.pinVersions()
    for (i <- 3 to 4) {
      val next = cur.unionByName(
        Seq((i.toLong, s"delta epsilon run$i")).toDF("doc_id", "text"))
      m.commit(Scd.snapshotDiff(store.read(db, "docs"), next, Seq("doc_id")))
      cur = next
    }
    val fresh = m.pinVersions()
    assert(stale("bm_doclens") != fresh("bm_doclens"),
      "fixture must age the seed doclens out")
    // ONLY doclens expired: the postings pointLookup passes its own
    // validation, so the failure exercises the doclens/docfreq/stats
    // read path — which must raise the same loud retention error the
    // lookup would, never a FileNotFoundException from a vacuumed dir
    val mixed = fresh.updated("bm_doclens", stale("bm_doclens"))
    val err = intercept[IllegalArgumentException] {
      serveBm25(store, db, mixed)
    }
    assert(err.getMessage.contains("retained"))
  }
}
