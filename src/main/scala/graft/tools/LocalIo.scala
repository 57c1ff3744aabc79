package graft.tools

import org.apache.spark.sql.SparkSession

/** Local-filesystem I/O tuning for the driver-contract mains.
 *
 * Hadoop's `LocalFileSystem` is checksummed: every file CREATE also
 * creates a `.crc` sidecar twin (and every read re-opens it), so a
 * bucketed store commit of 32 parquet files costs 64+ creates plus the
 * committer's rename dance on both. Stack-sampling the store-lifecycle
 * queries showed `FileOutputStream.open0` as the dominant non-idle
 * frame (guide §6: small files hurt twice — and the CRC twins double
 * them). Production deployments write to HDFS/S3 where there is no
 * client-side CRC sidecar, so the twins are a local-mode artifact, not
 * a fidelity feature: disabling them brings the local write path
 * CLOSER to the production one, and data integrity at this scale is
 * covered by parquet's own page checksums.
 *
 * The call flips the JVM-CACHED `file://` FileSystem instance (Hadoop
 * caches per scheme+authority+ugi, conf is not part of the key), so
 * one call in the session bootstrap covers every writer and reader in
 * a local-mode JVM — the store's `fs()`, Spark write tasks, manifest
 * I/O. Scoped to the `file` scheme only; a cluster deployment's
 * hdfs/s3a paths are untouched. Opt back in with
 * `SPARK_GRAFT_LOCAL_CRC=1` for A/B runs.
 */
object LocalIo {
  def tuneLocalFs(spark: SparkSession): Unit =
    if (!sys.env.get("SPARK_GRAFT_LOCAL_CRC").contains("1")) {
      val f = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"),
        spark.sparkContext.hadoopConfiguration)
      f.setWriteChecksum(false)
      f.setVerifyChecksum(false)
    }

  /** Sweep STALE entries out of the tmpfs scratch dir (r21 ADVICE:
   * `java.io.tmpdir` points at RAM-backed /dev/shm/spark-graft and
   * nothing cleaned it — fixture store temp dirs from finished runs
   * accumulate until they squeeze real memory and distort later
   * benches). Age-gated so concurrent JVMs' LIVE scratch (always
   * recent — fixtures live for one query) is never touched; called
   * from the driver-contract mains' bootstrap. Never deletes when the
   * scratch redirect is off (tmpdir is then a shared system /tmp). */
  def sweepScratch(maxAgeMillis: Long = 2 * 60 * 60 * 1000L): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir", ""))
    if (tmp.getPath.startsWith("/dev/shm/") && tmp.isDirectory) {
      val cutoff = System.currentTimeMillis() - maxAgeMillis
      val kids = tmp.listFiles()
      if (kids != null) kids.iterator
        .filter(_.lastModified() < cutoff)
        .foreach(deleteRecursively)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete()
  }
}
