package graft.catalog

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/**
 * The SQL surface's door into the store's data skipping: a
 * [[FileIndex]] over ONE committed manifest version whose
 * `listFiles` prunes with the store's own stats walk
 * ([[MergeSnapshotStore]] `fileMayMatch` — footer min/max bounds,
 * truncated string bounds, value sets) before Spark opens a single
 * parquet footer.
 *
 * This is the architecture Delta Lake uses on Spark (TahoeFileIndex →
 * HadoopFsRelation), chosen over a DataSource V2 `TableProvider`
 * deliberately, for two Spark-first reasons:
 *
 *  - `listFiles` receives the pushed predicates as FULL Catalyst
 *    `Expression`s, so SQL pruning judges EXACTLY the same tree the
 *    typed `readWhere` walk judges — V2's `SupportsPushDownFilters`
 *    hands the source lossy `sources.Filter` translations, which
 *    would silently drop the expression-derived skipping shapes
 *    (negations, prefix intervals, value-set probes) rounds 9–15
 *    built.
 *  - Planning lands on Spark's own `FileSourceScanExec` +
 *    vectorized parquet reader: remaining row-group/page/bloom
 *    pruning, column pruning, and whole-stage codegen all come for
 *    free, where a V2 `PartitionReader` would reimplement (or
 *    bypass) the vectorized read path.
 *
 * Snapshot semantics: the file list and stats are pinned to the
 * manifest version the index was built from — a later commit is
 * invisible (re-derive the frame to see it), `refresh()` is a no-op,
 * and vacuum retention covers readers the same way it covers
 * [[MergeSnapshotStore.readPinned]].
 *
 * Scale shape: `listFiles` is a driver-side fold over manifest-sized
 * stats (the same walk `readWhere` runs — no file is opened to decide),
 * and `sizeInBytes` reports the snapshot's true byte size, so Catalyst
 * auto-broadcasts genuinely small store tables in SQL joins.
 */
private[graft] final class StoreFileIndex(
    location: String,
    dataSchema: StructType,
    files: Seq[(String, FileStatus)],
    mayMatch: (Expression, String) => Boolean)
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(new Path(location))
  override def partitionSchema: StructType = new StructType()
  override def sizeInBytes: Long = files.map(_._2.getLen).sum
  override def inputFiles: Array[String] =
    files.map(_._2.getPath.toString).toArray
  override def refresh(): Unit = () // manifest-pinned snapshot

  /** The relative paths the most recent planning kept — the plan-pin
   * hook proving SQL pruning equals `readWhere`'s for one predicate. */
  @volatile private[graft] var lastKept: Seq[String] = files.map(_._1)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // a file survives only if EVERY pushed conjunct may hold a TRUE row
    // in it (the conjunction of per-filter verdicts IS the verdict on
    // the AND — the same three-valued logic fileMayMatch's And arm runs)
    val kept =
      if (dataFilters.isEmpty) files
      else files.filter { case (rel, _) =>
        dataFilters.forall(f => mayMatch(f, rel))
      }
    lastKept = kept.map(_._1)
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2).toArray))
  }
}
