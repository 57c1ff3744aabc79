package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, MergeSnapshotStore, TableMeta}

/**
 * The maintenance advisor: a manifest-only estimate of each column's
 * expected scan fraction (mean normalized per-file bound width) that
 * says WHEN to run [[MergeSnapshotStore.compactClustered]] — it fires
 * on the scattered-arrival layout, goes quiet after the clustering
 * rewrite restores the prune fraction, and never advises where a
 * rewrite provably cannot help (constant columns, statless tables).
 */
class MaintenanceAdvisorSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(nBuckets: Int): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = nBuckets,
      keepVersions = 2, vacuumRetentionMs = 0L)

  private def register(store: MergeSnapshotStore, tbl: String,
                       props: Map[String, String] = Map.empty): TableMeta = {
    val meta = TableMeta("adb", tbl,
      Files.createTempDirectory(s"graft-adv-$tbl").toString,
      primaryKey = Seq("id"), properties = props)
    store.catalog.register(meta)
    meta
  }

  test("advisor fires on a smeared layout and goes quiet after compaction") {
    import spark.implicits._
    val store = mkStore(nBuckets = 4)
    register(store, "aged")
    // scattered arrival: each bucket's one file spans the whole v range
    val rows = (0 until 1024).map(i => (i.toLong, ((i * 37) % 1024).toDouble))
    store.overwrite("adb", "aged", rows.toDF("id", "v"))
    val Seq(before) = store.maintenanceAdvisor("adb", "aged", Seq("v"))
    assert(before.compactAdvised && before.expectedScanFraction > 0.9,
      s"the scattered fixture must score near full-scan: $before")
    assert(before.statless == 0)
    // the estimate is honest against a REAL planned read: it predicted
    // (nearly) every file must be scanned for a mid-range band
    val total = store.read("adb", "aged").inputFiles.length
    assert(store.readRange("adb", "aged", Map("v" -> ((100.0, 150.0))))
      .inputFiles.length == total)
    store.compactClustered("adb", "aged", Seq("v" -> None),
      filesPerBucket = 4)
    val Seq(after) = store.maintenanceAdvisor("adb", "aged", Seq("v"))
    assert(!after.compactAdvised,
      s"the clustered layout must drop below the default threshold: $after")
    // 4 disjoint slices per bucket over a uniform column: ~1/4
    assert(after.expectedScanFraction < 0.35 &&
      after.expectedScanFraction > 0.15, s"expected ~0.25: $after")
    assert(after.files == 16)
  }

  test("partial maintenance: bucketHealth flags the smeared buckets, scoped rewrite quiets them") {
    import spark.implicits._
    val store = mkStore(nBuckets = 4)
    register(store, "partial")
    val rows = (0 until 1024).map(i => (i.toLong, ((i * 37) % 1024).toDouble))
    val df = rows.toDF("id", "v")
    store.overwrite("adb", "partial", df)
    store.compactClustered("adb", "partial", Seq("v" -> None),
      filesPerBucket = 4)
    assert(store.bucketHealth("adb", "partial", "v")
      .forall(!_.compactAdvised), "freshly clustered: every bucket quiet")

    // age TWO buckets: a scoped merge collapses each touched bucket to
    // one file spanning its whole value range — the other two keep
    // their clustered files BY REFERENCE
    val keyBuckets = spark.range(0, 1024)
      .select(col("id"), store.bucketOf(Seq(col("id"))).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val targets = keyBuckets.map(_._2).distinct.take(2).toSet
    val touchKeys = keyBuckets.collect { case (id, b) if targets(b) => id }
    store.mergeScoped("adb", "partial",
      touchKeys.toSeq.toDF("id"))(old => old)
    val health = store.bucketHealth("adb", "partial", "v")
    assert(health.filter(_.compactAdvised).map(_.bucket).toSet == targets,
      s"exactly the touched buckets must advise: $health")

    // rewrite ONLY the advised buckets; untouched dirs carry verbatim
    val entriesPre = store.manifestEntries("adb", "partial",
      store.latestVersion("adb", "partial"))
    val advised = health.filter(_.compactAdvised).map(_.bucket)
    val rep = store.compactBucketsClustered("adb", "partial",
      Seq("v" -> None), filesPerBucket = 4, buckets = advised)
    val entriesPost = store.manifestEntries("adb", "partial", rep.version)
    (entriesPre.keySet -- targets).foreach { b =>
      assert(entriesPost(b) == entriesPre(b),
        s"untouched bucket $b must carry its dir by reference")
    }
    assert(store.bucketHealth("adb", "partial", "v")
      .forall(!_.compactAdvised), "every bucket quiet after the rewrite")
    // the logical snapshot never moved
    val back = store.read("adb", "partial")
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // and pruning power is back: a narrow band plans a strict subset
    val total = back.inputFiles.length
    assert(store.readRange("adb", "partial",
      Map("v" -> ((100.0, 150.0)))).inputFiles.length < total)
    // refusals: unknown bucket, empty set
    intercept[IllegalArgumentException] {
      store.compactBucketsClustered("adb", "partial", Seq("v" -> None),
        4, buckets = Seq(99))
    }
    intercept[IllegalArgumentException] {
      store.compactBucketsClustered("adb", "partial", Seq("v" -> None),
        4, buckets = Nil)
    }
  }

  test("maintainIfAdvised pays the partial price: one call, only advised buckets move") {
    import spark.implicits._
    val store = mkStore(nBuckets = 8)
    register(store, "policy")
    val rows = (0 until 2048).map(i => (i.toLong, ((i * 37) % 2048).toDouble))
    val df = rows.toDF("id", "v")
    store.overwrite("adb", "policy", df)
    store.compactClustered("adb", "policy", Seq("v" -> None),
      filesPerBucket = 4)
    assert(store.maintainIfAdvised("adb", "policy", layout = Seq("v")).isEmpty,
      "freshly clustered: the policy must not pay anything")

    // smear TWO of eight buckets (25% < the default partialAbove=0.5)
    val keyBuckets = spark.range(0, 2048)
      .select(col("id"), store.bucketOf(Seq(col("id"))).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val targets = keyBuckets.map(_._2).distinct.take(2).toSet
    val touchKeys = keyBuckets.collect { case (id, b) if targets(b) => id }
    store.mergeScoped("adb", "policy",
      touchKeys.toSeq.toDF("id"))(old => old)
    val vPre = store.latestVersion("adb", "policy")
    val entriesPre = store.manifestEntries("adb", "policy", vPre)

    // ONE cron call: only the smeared buckets rewrite, the other six
    // carry byte-verbatim, and the advisors go quiet
    val rep = store.maintainIfAdvised("adb", "policy", layout = Seq("v"))
    assert(rep.isDefined && rep.get.version == vPre + 1)
    val entriesPost = store.manifestEntries("adb", "policy", rep.get.version)
    (entriesPre.keySet -- targets).foreach { b =>
      assert(entriesPost(b) == entriesPre(b),
        s"unadvised bucket $b must carry verbatim under the policy")
    }
    targets.foreach { b =>
      assert(entriesPost(b) != entriesPre(b), s"advised bucket $b must move")
    }
    assert(store.maintainIfAdvised("adb", "policy", layout = Seq("v")).isEmpty,
      "quiet after the partial rewrite")
    val back = store.read("adb", "policy")
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)

    // above the fraction gate the policy falls back to the whole-table
    // clustered rewrite: smear every bucket, pass partialAbove = 0.1
    store.mergeScoped("adb", "policy",
      (0L until 2048L).toDF("id"))(old => old)
    val vAll = store.latestVersion("adb", "policy")
    val repAll = store.maintainIfAdvised("adb", "policy", layout = Seq("v"),
      partialAbove = 0.1)
    assert(repAll.isDefined && repAll.get.version == vAll + 1)
    assert(store.maintainIfAdvised("adb", "policy", layout = Seq("v")).isEmpty)
  }

  test("maintainIfAdvised composes smear and debt into one clustered commit") {
    import spark.implicits._
    val store = mkStore(nBuckets = 8)
    register(store, "combo")
    val rows = (0 until 2048).map(i => (i.toLong, ((i * 37) % 2048).toDouble))
    store.overwrite("adb", "combo", rows.toDF("id", "v"))
    store.compactClustered("adb", "combo", Seq("v" -> None),
      filesPerBucket = 4)
    // smear ONE bucket and pile up MoR takedowns landing in (likely)
    // other buckets — the policy must rewrite the union in one commit,
    // clustered, dropping every sidecar
    val keyBuckets = spark.range(0, 2048)
      .select(col("id"), store.bucketOf(Seq(col("id"))).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val smearTarget = keyBuckets.head._2
    val touchKeys = keyBuckets.collect { case (id, b) if b == smearTarget => id }
    store.mergeScoped("adb", "combo",
      touchKeys.toSeq.toDF("id"))(old => old)
    val bucketOfId = keyBuckets.toMap
    // two 1-row takedowns (union of smear + debt buckets stays under
    // the default partialAbove=0.5 of the 8 buckets)
    val doomed = Seq(100L, 113L)
    doomed.foreach { id =>
      assert(store.deleteWhere("adb", "combo", col("id") === id,
        MergeSnapshotStore.MergeOnRead) == 1L)
    }
    val vPre = store.latestVersion("adb", "combo")
    val entriesPre = store.manifestEntries("adb", "combo", vPre)
    val debtBuckets = doomed.map(bucketOfId).toSet

    val rep = store.maintainIfAdvised("adb", "combo", layout = Seq("v"),
      adviseAtSidecars = 2)
    assert(rep.isDefined && rep.get.version == vPre + 1,
      "smear + debt must fold in ONE commit")
    assert(rep.get.clearedSidecars == 2 && rep.get.clearedDeletedRows == 2L)
    val entriesPost = store.manifestEntries("adb", "combo", rep.get.version)
    val moved = Set(smearTarget) ++ debtBuckets
    (entriesPre.keySet -- moved).foreach { b =>
      assert(entriesPost(b) == entriesPre(b),
        s"bucket $b is neither smeared nor debt-owning and must carry")
    }
    assert(store.manifestDeletes("adb", "combo", rep.get.version).isEmpty)
    assert(store.maintainIfAdvised("adb", "combo", layout = Seq("v")).isEmpty,
      "both advisors quiet — the clustered fold must not re-arm the layout advisor")
    val want = rows.filterNot { case (id, _) => doomed.contains(id) }
      .toDF("id", "v")
    val back = store.read("adb", "combo")
    assert(back.exceptAll(want).count() == 0 && want.exceptAll(back).count() == 0)
  }

  test("PK-less partial maintenance: fileHealth flags smeared files, file-scoped clustered rewrite quiets them") {
    import spark.implicits._
    import graft.catalog.MergeSnapshotStore
    val store = mkStore(nBuckets = 4)
    // PK-LESS: one logical bucket, so partial maintenance must be
    // file-granular (bucket-scoped would be the whole table)
    val meta = TableMeta("adb", "nopk",
      Files.createTempDirectory("graft-adv-nopk").toString)
    store.catalog.register(meta)
    // an UNSORTED arrival: every file spans the whole v range
    val rows = (0 until 2048).map(i => (i.toLong, ((i * 37) % 2048).toDouble))
    val df = rows.toDF("id", "v")
    store.overwrite("adb", "nopk", df.repartition(8))
    assert(store.fileHealth("adb", "nopk", "v").forall(_.compactAdvised),
      "hash-scattered files must all read as smear")
    // the one-call policy clusters the advised set (here: everything —
    // fraction gate passes the full file list through the same path)
    val rep = store.maintainIfAdvised("adb", "nopk", layout = Seq("v"),
      filesPerBucket = 8)
    assert(rep.isDefined)
    assert(store.fileHealth("adb", "nopk", "v").forall(!_.compactAdvised),
      "clustered: every file quiet")
    assert(store.maintainIfAdvised("adb", "nopk", layout = Seq("v"),
      filesPerBucket = 8).isEmpty, "healthy table pays nothing")
    val back = store.read("adb", "nopk")
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // pruning power: a narrow band plans a strict subset of the files
    val total = back.inputFiles.length
    assert(store.readRange("adb", "nopk",
      Map("v" -> ((100.0, 150.0)))).inputFiles.length < total)

    // partial aging: cluster only SOME files through the direct call,
    // leaving a mixed layout — then the policy rewrites exactly the
    // still-smeared rest, carrying the clustered output verbatim
    store.overwrite("adb", "nopk", df.repartition(8))
    val health = store.fileHealth("adb", "nopk", "v")
    val subset = health.map(_.file).take(4)
    store.compactFilesClustered("adb", "nopk", Seq("v" -> None),
      targetFiles = 4, files = subset)
    val mixed = store.fileHealth("adb", "nopk", "v")
    val (quiet, smeared) = mixed.partition(!_.compactAdvised)
    assert(quiet.nonEmpty && smeared.nonEmpty,
      s"fixture wants a mixed layout: $mixed")
    val vPre = store.latestVersion("adb", "nopk")
    val carriesPre = store.manifestCarries("adb", "nopk", vPre)
    val rep2 = store.maintainIfAdvised("adb", "nopk", layout = Seq("v"),
      filesPerBucket = 4)
    assert(rep2.isDefined && rep2.get.version == vPre + 1)
    // the previously-clustered files ride as carries into the new
    // version untouched
    val carriesPost = store.manifestCarries("adb", "nopk", rep2.get.version)
    val quietSet = quiet.map(_.file).toSet
    assert(quietSet.subsetOf(carriesPost.values.flatten.toSet),
      s"clustered files must carry verbatim: " +
        s"pre=$carriesPre post=$carriesPost quiet=$quietSet")
    assert(store.fileHealth("adb", "nopk", "v").forall(!_.compactAdvised))
    val back2 = store.read("adb", "nopk")
    assert(back2.exceptAll(df).count() == 0 && df.exceptAll(back2).count() == 0)

    // debt composes: with the layout quiet, a position takedown alone
    // fires the policy, which folds ONLY the addressed file (the other
    // files carry) and clears the sidecar in the same clustered commit
    assert(store.deleteWhere("adb", "nopk", col("v") === 100.0,
      MergeSnapshotStore.MergeOnRead) == 1L)
    val rep3 = store.maintainIfAdvised("adb", "nopk", layout = Seq("v"),
      filesPerBucket = 4, adviseAtSidecars = 1)
    assert(rep3.isDefined && rep3.get.clearedSidecars == 1)
    assert(store.manifestDeletes("adb", "nopk", rep3.get.version).isEmpty)
    assert(store.fileHealth("adb", "nopk", "v").forall(!_.compactAdvised),
      "the debt fold's clustered shape must not re-arm the layout advisor")
    val back3 = store.read("adb", "nopk")
    val want3 = df.filter(col("v") =!= 100.0)
    assert(back3.exceptAll(want3).count() == 0 &&
      want3.exceptAll(back3).count() == 0)
  }

  test("per-column verdicts: the unclustered dimension stays advised") {
    import spark.implicits._
    val store = mkStore(nBuckets = 4)
    register(store, "multi")
    val rows = (0 until 1024).map(i =>
      (i.toLong, ((i * 37) % 1024).toDouble, ((i * 131) % 1024).toDouble))
    store.overwrite("adb", "multi", rows.toDF("id", "v", "w"))
    store.compactClustered("adb", "multi", Seq("v" -> None),
      filesPerBucket = 4)
    val Seq(v, w) = store.maintenanceAdvisor("adb", "multi", Seq("v", "w"))
    assert(!v.compactAdvised, s"the clustered column must be quiet: $v")
    assert(w.compactAdvised && w.expectedScanFraction > 0.9,
      s"the dimension the rewrite did NOT cluster stays smeared: $w")
  }

  test("no advice without evidence: constant columns and statless tables") {
    import spark.implicits._
    val store = mkStore(nBuckets = 2)
    register(store, "const")
    store.overwrite("adb", "const",
      (0 until 64).map(i => (i.toLong, 7.0)).toDF("id", "v"))
    val Seq(c) = store.maintenanceAdvisor("adb", "const", Seq("v"))
    assert(!c.compactAdvised && c.expectedScanFraction == 1.0,
      s"a zero-span column scans everything but a rewrite cannot help: $c")
    // stats disabled: every file is a blind spot — surfaced, not advised
    register(store, "blind", props = Map("graft.stats" -> "false"))
    store.overwrite("adb", "blind",
      (0 until 64).map(i => (i.toLong, i.toDouble)).toDF("id", "v"))
    val Seq(b) = store.maintenanceAdvisor("adb", "blind", Seq("v"))
    assert(b.statless == b.files && b.files > 0 && !b.compactAdvised,
      s"statless files must be visible and never advised on: $b")
    assert(b.expectedScanFraction == 1.0)
  }

  test("all-unbounded string bounds are measurable smear, not a constant") {
    import spark.implicits._
    val store = mkStore(nBuckets = 2)
    register(store, "unb")
    // every value starts with 16 unincrementable max code points, so
    // each file's truncated upper bound is None and every lo truncates
    // to the same prefix: the measured span is zero, but that is NOT
    // proof of constancy — the documented contract errs toward
    // advising, never toward hiding a smear
    val mx = new String(Character.toChars(Character.MAX_CODE_POINT)) * 16
    store.overwrite("adb", "unb",
      (0 until 64).map(i => (i.toLong, mx + s"tail$i")).toDF("id", "s"))
    val Seq(h) = store.maintenanceAdvisor("adb", "unb", Seq("s"))
    assert(h.statless == 0 && h.files > 1,
      s"fixture must carry string stats over >1 file: $h")
    assert(h.expectedScanFraction == 1.0)
    assert(h.compactAdvised,
      s"unbounded-above bounds must advise, not read as constant: $h")
  }

  test("advisor tracks versions and rejects empty or silly arguments") {
    import spark.implicits._
    val store = mkStore(nBuckets = 2)
    register(store, "vers")
    store.overwrite("adb", "vers",
      (0 until 256).map(i => (i.toLong, ((i * 37) % 256).toDouble))
        .toDF("id", "v"))
    val v0 = store.latestVersion("adb", "vers")
    store.compactClustered("adb", "vers", Seq("v" -> None),
      filesPerBucket = 4)
    // pinned to the pre-compaction snapshot the advisor still fires
    val Seq(old) = store.maintenanceAdvisor("adb", "vers", Seq("v"),
      version = Some(v0))
    val Seq(now) = store.maintenanceAdvisor("adb", "vers", Seq("v"))
    assert(old.compactAdvised && !now.compactAdvised)
    intercept[IllegalArgumentException] {
      store.maintenanceAdvisor("adb", "vers", Nil)
    }
    intercept[IllegalArgumentException] {
      store.maintenanceAdvisor("adb", "vers", Seq("v"), adviseAbove = 1.5)
    }
  }
}
