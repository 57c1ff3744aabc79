package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

import graft.catalog.SnapshotStore

/**
 * Stage 3 — structured -> curated promotion (reference
 * src/apply_to_curated.py). The reference transform is the identity
 * placeholder (`apply_changes`, :153-161); the hook point is kept so real
 * curation logic (PII masking, conforming) slots in per table.
 */
final class CuratedApplier(store: SnapshotStore,
                           transform: DataFrame => DataFrame = identity) {
  /** `onTableDone` fires after each curated write — the reference's
   * Kinesis-notify stub runs here too (`trigger_kinesis_event`,
   * src/apply_to_curated.py:143-150, invoked after the curated loop). */
  def run(db: String, tables: Seq[String], suffix: String = "_curated",
          onTableDone: String => Unit = _ => ()): Seq[String] =
    tables.map { t =>
      store.overwrite(db, t + suffix, transform(store.read(db, t)))
      onTableDone(t + suffix)
      t + suffix
    }
}

/**
 * Stage 5 — ad-hoc query entry point (reference dev/glue_query +
 * docs/demo_querys): table name, projection list, SQL predicate string
 * (default "1=1"). The predicate parses through Catalyst (`expr`), so
 * pushdown/pruning are free; e.g.
 * `run("offenders", Seq("offender_id","last_name"), "offender_id>15")`.
 */
final class QueryRunner(store: SnapshotStore) {
  /** On a MergeSnapshotStore the scan is the SKIPPING read: the parsed
   * `where` prunes files through the manifest stats (same walk as the
   * typed readWhere) before any footer opens. `asOfVersion` pins the
   * read to a committed-and-retained version — AS-OF queries prune
   * through the pinned manifest exactly as HEAD queries do. */
  def run(db: String, table: String, fields: Seq[String],
          where: String = "1=1",
          asOfVersion: Option[Int] = None): DataFrame =
    QueryRunner.select(
      DomainRunner.storeView(store, db, table, asOfVersion), fields, where)

  def apply(df: DataFrame, fields: Seq[String], where: String): DataFrame =
    QueryRunner.select(df, fields, where)
}

object QueryRunner {
  /** The projection + predicate core, store-free for direct frames. */
  def select(df: DataFrame, fields: Seq[String], where: String): DataFrame = {
    val projected = if (fields.isEmpty || fields == Seq("*")) df
                    else df.selectExpr(fields: _*)
    projected.where(expr(if (where.trim.isEmpty) "1=1" else where))
  }
}
