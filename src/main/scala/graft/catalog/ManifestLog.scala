package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Atomic create-if-absent publish primitive for manifest commits — the
 * LogStore seam (the same need Delta Lake's LogStore abstraction
 * answers: a multi-writer table commit is a compare-and-swap on "who
 * writes version N", and what makes that CAS real differs per store).
 * Production object stores provide a conditional-put API (S3
 * `If-None-Match: *`, GCS `if-generation-match: 0`, ABFS ETags);
 * implement this trait over it and every [[MergeSnapshotStore]] commit
 * serializes without any rename-semantics assumption.
 *
 * Contract: `putIfAbsent` publishes `content` at `dest` iff nothing is
 * committed there, ATOMICALLY — of two concurrent racers on one `dest`,
 * exactly one returns true, and a false return implies a competing
 * publish is (or will be) visible. A reader must never observe a torn
 * `dest`. Throw `IOException` for failures that are NOT a lost race
 * (permissions, quota, connector faults) — the store surfaces those
 * instead of burning its CAS retries against an unchanged version.
 */
trait ManifestLog {
  def putIfAbsent(fs: FileSystem, dest: Path, content: Array[Byte]): Boolean

  /** Convenience for text manifests. */
  final def putIfAbsent(fs: FileSystem, dest: Path, content: String): Boolean =
    putIfAbsent(fs, dest, content.getBytes(UTF_8))
}

/**
 * The default: best create-if-absent each Hadoop filesystem offers.
 * Local filesystems hard-link (link(2) fails atomically when the
 * destination exists — POSIX rename would silently OVERWRITE a
 * concurrent winner); HDFS-semantics stores rename (their rename
 * refuses an existing destination). Schemes KNOWN to overwrite on
 * rename (object stores emulating rename as copy+delete) get a loud
 * once-per-scheme warning — their CAS is advisory, so concurrent
 * writers there can lose a commit silently (single-writer use stays
 * fine); deployments on such stores should pass a conditional-put
 * [[ManifestLog]] instead, which never warns because its CAS is real.
 */
object HadoopManifestLog extends ManifestLog {
  /** Filesystem schemes whose rename OVERWRITES an existing destination. */
  private[catalog] val OverwritingRenameSchemes =
    Set("s3", "s3a", "s3n", "gs", "oss")
  private[catalog] val warnedSchemes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def putIfAbsent(f: FileSystem, fin: Path,
                           content: Array[Byte]): Boolean = {
    // content lands in a nonce-unique tmp file first (two racing
    // writers can never share a tmp path), then publishes atomically
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(fin.getParent, s".tmp-${fin.getName}-$nonce")
    val out = f.create(tmp, true)
    try out.write(content) finally out.close()
    val committed =
      if (f.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(fin.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        // HDFS contract: rename fails when the destination exists. The
        // exists pre-check narrows (not closes) the window on stores
        // that overwrite instead.
        if (OverwritingRenameSchemes.contains(f.getScheme) &&
            warnedSchemes.add(f.getScheme))
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"filesystem scheme '${f.getScheme}' overwrites on rename: the " +
              "manifest CAS cannot refuse a racing writer — run " +
              "single-writer, or pass a conditional-put ManifestLog to " +
              "the store")
        if (f.exists(fin)) false
        else if (f.rename(tmp, fin)) true
        else if (f.exists(fin)) false // a racer took it mid-rename
        else {
          // the destination is still free, so this was NOT a lost CAS:
          // counting a persistent rename failure (permissions, quota, a
          // flaky connector) as contention would burn every retry
          // against an UNCHANGED manifest and then misreport "writers
          // keep taking every version" — surface the real failure
          f.delete(tmp, false)
          throw new java.io.IOException(
            s"manifest publish rename failed at $fin but the version is " +
              "untaken — a filesystem error, not writer contention; check " +
              "permissions/quota/connector health")
        }
      }
    f.delete(tmp, false)
    committed
  }
}
