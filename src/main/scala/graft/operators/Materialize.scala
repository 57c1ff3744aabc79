package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Materialization of small shared intermediates (sketch tables, doc-set
 * tables) that several branches of one job re-read. Spark gives derived
 * frames in a self-join no ReusedExchange, so without an explicit cut the
 * whole subtree (tokenize + hash a 100 TB corpus) recomputes per branch.
 *
 * Two cuts, chosen per session:
 *
 *  - default: `localCheckpoint` — blocks live in executor storage. Fastest
 *    (no DFS round-trip), right for local mode and interactive runs, but an
 *    executor loss silently RECOMPUTES the lineage-truncated frame, which
 *    on a real cluster can mean re-aggregating the full corpus mid-query —
 *    or failing, since the pre-checkpoint lineage is discarded.
 *  - `graft.materialize.reliable=true` (session conf) — `checkpoint` to
 *    the SparkContext checkpoint directory (set it to a DFS path first).
 *    Executor loss re-reads the checkpoint files; nothing recomputes.
 *
 * A session conf rather than a per-call flag so the driver contract
 * (`(SparkSession, dir) => DataFrame`) and every operator signature stay
 * unchanged between local testing and cluster deployment.
 */
object Materialize {
  val ReliableKey = "graft.materialize.reliable"

  def apply(df: DataFrame): DataFrame = {
    val reliable =
      df.sparkSession.conf.getOption(ReliableKey).exists(_.toBoolean)
    if (reliable) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires SparkContext.setCheckpointDir(<DFS path>)")
      // persist first: the reliable checkpoint writer runs its own job, and
      // without cached blocks it would RECOMPUTE the whole cut subtree a
      // second time (the exact cost this helper exists to avoid). Eager so
      // the cache can be dropped before returning.
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try cached.checkpoint(eager = true)
      finally cached.unpersist(blocking = false)
    } else df.localCheckpoint(eager = false)
  }
}
