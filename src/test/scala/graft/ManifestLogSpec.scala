package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{InMemoryCatalog, ManifestLog, MergeSnapshotStore, TableMeta}

/**
 * The conditional-put CAS seam ([[ManifestLog]]): on an object store
 * whose rename overwrites and whose existence checks lag (the classic
 * S3 shape), the default Hadoop publish CAS is advisory — two racing
 * writers can silently lose a commit. A [[ManifestLog]] built on the
 * store's conditional-put API serializes them with no rename-semantics
 * assumption. Both halves are proven here against [[ObjectStoreLikeFs]],
 * which models exactly that shape.
 */
class ManifestLogSpec extends AnyFunSuite with SparkFixture {

  private def mkStore(log: ManifestLog): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 8,
      keepVersions = 2, vacuumRetentionMs = 60000L, manifestLog = log)

  private def mkDefaultStore(): MergeSnapshotStore =
    new MergeSnapshotStore(spark, new InMemoryCatalog, nBuckets = 8,
      keepVersions = 2, vacuumRetentionMs = 60000L)

  private def registerOn(store: MergeSnapshotStore, tbl: String): Unit = {
    spark.sparkContext.hadoopConfiguration.setClass("fs.ecs.impl",
      classOf[ObjectStoreLikeFs], classOf[org.apache.hadoop.fs.FileSystem])
    val dir = Files.createTempDirectory(s"graft-ecs-$tbl").toString
    store.catalog.register(TableMeta("mdb", tbl, s"ecs://$dir",
      primaryKey = Seq("id")))
  }

  private def idTable(n: Int) =
    spark.range(1, n + 1).select(col("id").cast("int").as("id"),
      concat(lit("name-"), col("id")).as("name"))

  /** Two disjoint-bucket merges raced via the beforePublish hook: the
   * "winner" commits while the "loser" sits between write and publish. */
  private def race(store: MergeSnapshotStore, tbl: String): Unit = {
    import spark.implicits._
    val bk = (k: Int) => Seq(k).toDF("id")
      .select(store.bucketOf(col("id").cast("int"))).head().getInt(0)
    val keyA = 1
    val keyB = (2 to 100).find(k => bk(k) != bk(keyA)).get
    store.beforePublish = () =>
      store.mergeScoped("mdb", tbl, Seq(keyB).toDF("id")) { old =>
        old.withColumn("name",
          when(col("id") === keyB, lit("from-B")).otherwise(col("name")))
      }
    store.mergeScoped("mdb", tbl, Seq(keyA).toDF("id")) { old =>
      old.withColumn("name",
        when(col("id") === keyA, lit("from-A")).otherwise(col("name")))
    }
  }

  test("FIXTURE: the default publish CAS is advisory on an overwriting object store") {
    // this pins the HAZARD the seam exists for: with lagging existence
    // checks and overwriting rename, the losing racer's publish silently
    // clobbers the winner's manifest file — ONE of the two commits
    // vanishes with no error. WHICH one surfaces depends on the reader:
    // the on-disk v1 is the loser's (keyA), but a reader whose manifest
    // parse cache saw the winner's v1 before the clobber answers the
    // winner's (keyB) — the overwrite violates the write-once contract
    // the cache is built on, which is exactly the fixture's point. If
    // this test ever sees BOTH commits, the fixture no longer models
    // the object-store shape and the seam test below proves nothing.
    val store = mkDefaultStore()
    registerOn(store, "adv")
    store.overwrite("mdb", "adv", idTable(100))
    race(store, "adv")
    val back = store.read("mdb", "adv")
    val names = back.filter(col("name").startsWith("from-"))
      .select("name").collect().map(_.getString(0)).toSet
    assert(names.size == 1,
      s"expected exactly one commit silently lost (the modeled hazard), got $names")
  }

  test("a conditional-put ManifestLog serializes racing writers with no rename assumption") {
    val store = mkStore(new MapBackedConditionalPutLog)
    registerOn(store, "cput")
    store.overwrite("mdb", "cput", idTable(100))
    race(store, "cput")
    // the loser LOST the version CAS (the log refused it), rebased over
    // the winner's manifest, and republished — both effects survive
    val back = store.read("mdb", "cput")
    val names = back.filter(col("name").startsWith("from-"))
      .select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("from-A", "from-B"),
      s"a racing commit was lost: $names")
    assert(store.latestVersion("mdb", "cput") == 2,
      "expected seed + two serialized commits")
    assert(back.count() == 100)
  }

  test("conditional-put refusal is version-scoped: independent tables never contend") {
    val store = mkStore(new MapBackedConditionalPutLog)
    registerOn(store, "ta")
    registerOn(store, "tb")
    store.overwrite("mdb", "ta", idTable(10))
    store.overwrite("mdb", "tb", idTable(10))
    store.overwrite("mdb", "ta", idTable(11))
    assert(store.latestVersion("mdb", "ta") == 1)
    assert(store.latestVersion("mdb", "tb") == 0)
    assert(store.read("mdb", "ta").count() == 11)
  }
}

/**
 * A local filesystem modeling the object-store shape the default
 * publish CAS cannot survive: RENAME OVERWRITES an existing destination
 * (copy+delete emulation) and EXISTS lags for manifest files
 * (list-after-put inconsistency), while reads and listings stay honest.
 * Top-level class: Hadoop instantiates filesystems reflectively.
 */
class ObjectStoreLikeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("ecs:///")
  override def getScheme: String = "ecs"
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = {
    if (dst.getName.endsWith(".manifest") && super.exists(dst))
      super.delete(dst, false) // object-store "rename" overwrites
    super.rename(src, dst)
  }
  override def exists(p: org.apache.hadoop.fs.Path): Boolean =
    if (p.getName.endsWith(".manifest")) false // list-after-put lag
    else super.exists(p)
}

/**
 * A [[ManifestLog]] whose create-if-absent races through an in-process
 * CAS — the test stand-in for a store's conditional-put API (S3
 * `If-None-Match: *`, GCS `if-generation-match: 0`): the FIRST putter
 * of a destination wins, every later putter is refused without looking
 * at filesystem state at all. JVM-global so two stores over one table
 * share the arbiter the way two clients share a bucket's API.
 */
class MapBackedConditionalPutLog extends ManifestLog {
  override def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
                           dest: org.apache.hadoop.fs.Path,
                           content: Array[Byte]): Boolean = {
    if (!MapBackedConditionalPutLog.taken.add(dest.toString)) false
    else {
      // won the CAS: materialize the content. A real conditional-put
      // API makes the write itself atomic; here the arbiter above has
      // already serialized writers, so a plain create suffices.
      val out = fs.create(dest, false)
      try out.write(content) finally out.close()
      true
    }
  }
}

object MapBackedConditionalPutLog {
  private val taken = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
