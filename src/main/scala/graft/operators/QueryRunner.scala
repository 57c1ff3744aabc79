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

  /** SQL DML on the same ad-hoc surface: `DELETE FROM t WHERE …` /
   * `UPDATE t SET … WHERE …` route to the store's row-level operators.
   * See [[QueryRunner.dml]]. */
  def dml(db: String, statement: String,
          mode: graft.catalog.MergeSnapshotStore.DeleteMode =
            graft.catalog.MergeSnapshotStore.CopyOnWrite): Long =
    QueryRunner.dml(store, db, statement, mode)
}

object QueryRunner {
  /** The projection + predicate core, store-free for direct frames. */
  def select(df: DataFrame, fields: Seq[String], where: String): DataFrame = {
    val projected = if (fields.isEmpty || fields == Seq("*")) df
                    else df.selectExpr(fields: _*)
    projected.where(expr(if (where.trim.isEmpty) "1=1" else where))
  }

  /**
   * SQL DML dispatch — the takedown operator's natural dialect: the
   * reference's users live in SQL (domain SQL over temp views,
   * reference src/apply_to_domains.py:54-68; the glue_query CLI,
   * dev/glue_query:5-9), so `DELETE FROM t WHERE …` and
   * `UPDATE t SET … WHERE …` must work as statements, not only as
   * typed calls. Parsing is Spark's OWN SQL grammar
   * (`sessionState.sqlParser.parsePlan` — quoted identifiers, full
   * predicate syntax, type-correct literals), pattern-matched on the
   * catalyst DML plans and routed to
   * [[graft.catalog.MergeSnapshotStore.deleteWhere]] /
   * [[graft.catalog.MergeSnapshotStore.updateWhere]], which keep every
   * storage-engine guarantee (stats-pruned find, scoped rewrite or MoR
   * sidecar, CAS adjudication). Returns the affected row count.
   *
   * Scope: single-table statements with plain (non-subquery)
   * predicates — the same contract the typed operators carry. A
   * statement naming `db.table` must agree with the bound `db`;
   * `DELETE FROM t` with no WHERE deletes every row (SQL semantics).
   * `mode` picks the delete's physical realization (copy-on-write
   * rewrite or merge-on-read sidecar) exactly like the typed call.
   */
  def dml(store: SnapshotStore, db: String, statement: String,
          mode: graft.catalog.MergeSnapshotStore.DeleteMode =
            graft.catalog.MergeSnapshotStore.CopyOnWrite): Long = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, LogicalPlan, UpdateTable}
    val ms = store match {
      case m: graft.catalog.MergeSnapshotStore => m
      case _ => throw new IllegalArgumentException(
        "SQL DML routes to row-level DELETE/UPDATE, which are the " +
          "merge store's operators — open the table through a " +
          "MergeSnapshotStore")
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val plan = spark.sessionState.sqlParser.parsePlan(statement)
    def tableOf(t: LogicalPlan): String = t match {
      case u: UnresolvedRelation => u.multipartIdentifier match {
        case Seq(tbl) => tbl
        case Seq(d, tbl) =>
          require(d == db,
            s"statement names database $d but this runner is bound to $db")
          tbl
        case parts => throw new IllegalArgumentException(
          s"unsupported table name ${parts.mkString(".")} — " +
            "use [db.]table")
      }
      case other => throw new IllegalArgumentException(
        s"unsupported DML target (aliases/subqueries don't name a " +
          s"store table): ${other.nodeName}")
    }
    // parsed-but-unresolved expressions round-trip faithfully through
    // their own SQL rendering (attributes re-quote, literals re-type);
    // expr() then hands the store the same lazy Column a typed caller
    // would have built
    def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      expr(e.sql)
    plan match {
      case DeleteFromTable(t, condition) =>
        ms.deleteWhere(db, tableOf(t), columnOf(condition), mode)
      case UpdateTable(t, assignments, condition) =>
        val sets = assignments.map {
          case Assignment(k: UnresolvedAttribute, v) => k.name -> columnOf(v)
          case a => throw new IllegalArgumentException(
            s"unsupported assignment target: ${a.key.sql}")
        }.toMap
        require(sets.size == assignments.size,
          "duplicate assignment targets in UPDATE")
        ms.updateWhere(db, tableOf(t),
          condition.map(columnOf).getOrElse(expr("true")), sets)
      case other => throw new IllegalArgumentException(
        s"not a DML statement (DELETE FROM … / UPDATE … SET …): " +
          s"parsed as ${other.nodeName}; run queries through " +
          "QueryRunner.run or spark.sql over a registered view")
    }
  }
}
