package graft.operators

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

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
 *
 * == Lifetime ==
 *
 * Checkpoint blocks are NOT released by GC — on a long-lived session every
 * cut would pin executor storage forever (dozens of orphaned block sets
 * after a 60-query run; a storage-memory leak on a real cluster). Every
 * cut therefore registers its backing RDD, and callers bound its life:
 *
 *  - [[release]](df) drops the blocks behind one superseded cut (iterative
 *    operators release round N−1 when round N is materialized);
 *  - [[scoped]] {{{ body }}} releases every cut the current thread created
 *    inside `body` — the per-query harness wrapper (safe under concurrent
 *    query execution, unlike a global sweep);
 *  - [[releaseAll]]() sweeps every cut of one session — single-threaded
 *    harnesses (benchmarks) call it between queries; other sessions
 *    sharing the JVM keep their cuts (the registry is keyed by session).
 *
 * A released frame must never be re-read: localCheckpoint discards the
 * pre-cut lineage, so its blocks cannot be recomputed — release only what
 * a newer materialized frame supersedes, or whole queries after their
 * terminal action.
 */
object Materialize {
  val ReliableKey = "graft.materialize.reliable"

  /** Backing RDDs of every live cut, keyed by the owning SparkSession
   * (identity on both — sessions and RDDs hash by reference/id). Keying
   * by session keeps multi-tenant JVMs safe: one session's [[releaseAll]]
   * sweep can never drop another session's cuts. */
  private val live = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.Set[RDD[_]]]()

  /** Register `r` under `s`. compute() runs atomically per key, so a
   * concurrent [[deregister]] dropping the session's (momentarily empty)
   * entry cannot orphan this registration into a removed set. */
  private def register(s: SparkSession, r: RDD[_]): Unit =
    live.compute(s, (_, old) => {
      val set =
        if (old != null) old
        else java.util.Collections.newSetFromMap(
          new java.util.concurrent.ConcurrentHashMap[RDD[_], java.lang.Boolean]())
      set.add(r)
      set
    })

  /** Remove `r` from `s`'s registry; true when it was live. Drops the
   * session entry once its last cut is gone — atomically against
   * [[register]] — so stopped sessions are not pinned by the registry. */
  private def deregister(s: SparkSession, r: RDD[_]): Boolean = {
    var removed = false
    live.computeIfPresent(s, (_, set) => {
      removed = set.remove(r)
      if (set.isEmpty) null else set
    })
    removed
  }

  /** Cuts created by the current thread's innermost [[scoped]] block. */
  private val scopeTl = new ThreadLocal[mutable.Buffer[(SparkSession, RDD[_])]]

  /** Cuts created by [[internal]] — their lifetime is owned by the
   * registered cuts built over them. */
  private val internalCuts = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[RDD[_], java.lang.Boolean]())

  /** Nested-cut edges: cut RDD -> the live INTERNAL cuts its SOURCE plan
   * was built over (recorded at registration time, BEFORE the new cut
   * truncates lineage — afterwards the inner cut is unreachable from the
   * outer one and a release walk could never find it). */
  private val childrenOf =
    new java.util.concurrent.ConcurrentHashMap[RDD[_], Seq[RDD[_]]]()

  /** How many live registered cuts reference each [[internal]] cut as a
   * child. An internal cut is freed when its LAST registered parent is
   * freed — without the count, releasing one of two outer cuts sharing
   * an inner cut would kill the inner blocks under the survivor. */
  private val parentRefs =
    new java.util.concurrent.ConcurrentHashMap[RDD[_], java.lang.Integer]()

  /** Is `r` a currently-registered cut of `s`? */
  private def isLive(s: SparkSession, r: RDD[_]): Boolean = {
    val set = live.get(s)
    set != null && set.contains(r)
  }

  /** The live INTERNAL cuts directly reachable from `df`'s plan (each
   * branch stopped at the first live cut — deeper cuts are that cut's
   * own children, already edge-tracked from its registration). */
  private def internalKids(df: DataFrame): Seq[RDD[_]] = {
    val s = df.sparkSession
    val acc = mutable.Buffer[RDD[_]]()
    val seen = mutable.Set[RDD[_]]()
    def walk(r: RDD[_]): Unit = if (seen.add(r)) {
      if (isLive(s, r)) { if (internalCuts.contains(r)) acc += r }
      else r.dependencies.foreach(d => walk(d.rdd))
    }
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => walk(lr.rdd)
      case _ => ()
    }
    acc.toSeq
  }

  /** Deregister-and-unpersist `r`, then resolve its nested-cut edges:
   * each internal child loses one parent reference, and a child whose
   * last parent is gone is freed with it (recursively). Idempotent —
   * the deregister gate makes a second free of the same cut a no-op. */
  private def free(s: SparkSession, r: RDD[_]): Unit =
    if (deregister(s, r)) {
      // a stopped context's blocks are already gone; freeing then is
      // name-table cleanup only, and unpersist would throw
      try r.unpersist(blocking = false)
      catch { case _: IllegalStateException => () }
      internalCuts.remove(r)
      parentRefs.remove(r) // freed directly: sever any remaining edges
      val kids = childrenOf.remove(r)
      if (kids != null) kids.foreach { k =>
        val left = parentRefs.computeIfPresent(k, (_, n) =>
          if (n <= 1) null else Integer.valueOf(n - 1))
        if (left == null) free(s, k)
      }
    }

  /** [[apply]], but the cut is computed NOW, as its own job. The lazy
   * default defers computation to the first consumer — when SEVERAL
   * consumers launch concurrently (e.g. two broadcast-exchange builds
   * racing under AQE), each computes the not-yet-persisted subtree from
   * scratch. A cut whose consumers start together should pay the one
   * up-front job instead of once per racer. Reliable-mode cuts are
   * already written eagerly by [[apply]] — no extra job. */
  def eager(df: DataFrame): DataFrame = {
    val reliable =
      df.sparkSession.conf.getOption(ReliableKey).exists(_.toBoolean)
    val cut = apply(df)
    if (!reliable)
      cut.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }
        .foreach(_.count()) // materialize the blocks before consumers race
    cut
  }

  /** [[apply]], but the cut's lifetime is OWNED by the registered cuts
   * later built over it: it is freed automatically when its last such
   * parent is released. For operators that nest cuts (the
   * Materialize(f(Materialize(g(x)))) shape) where the inner cut is
   * invisible to callers — without ownership, the outer cut truncates
   * lineage and the inner blocks leak for the session lifetime unless
   * the caller happens to run [[releaseAll]]. Do NOT use for a cut any
   * RETURNED frame reads directly (the parent's release would kill it);
   * those stay on [[apply]] + the documented release-together contract. */
  def internal(df: DataFrame): DataFrame = doApply(df, ownedByParents = true)

  def apply(df: DataFrame): DataFrame = doApply(df, ownedByParents = false)

  /** Evict every cut of sessions whose SparkContext has STOPPED: such a
   * session can no longer call release()/releaseAll(), so without the
   * sweep its entries in [[live]] — and through the ownership/edge maps
   * ([[internalCuts]]/[[childrenOf]]/[[parentRefs]]) its internal cuts —
   * would pin the RDDs and their SparkContext for the JVM lifetime.
   * Piggybacked on every registration, so a long-lived JVM cycling
   * sessions (test harnesses, notebook kernels) self-heals; freeing
   * goes through [[free]], which cleans ALL maps consistently. */
  private def sweepStopped(): Unit =
    live.forEach { (s, set) =>
      if (s.sparkContext.isStopped) {
        val snap = new java.util.ArrayList[RDD[_]](set)
        snap.forEach(r => free(s, r))
      }
    }

  private def doApply(df: DataFrame, ownedByParents: Boolean): DataFrame = {
    sweepStopped()
    // nested-cut edges must be read off the SOURCE plan before the new
    // cut exists (the cut truncates lineage; afterwards the inner cuts
    // are invisible to any walk)
    val kids = internalKids(df)
    val reliable =
      df.sparkSession.conf.getOption(ReliableKey).exists(_.toBoolean)
    val cut = if (reliable) {
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
    // the cut plan is a LogicalRDD over the checkpointed rows; register its
    // RDD so release/scoped/releaseAll can unpersist the storage blocks
    // (for reliable cuts unpersist is a no-op — the data is DFS files whose
    // lifetime the checkpoint dir owns — registering is still harmless)
    cut.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }
      .foreach { r =>
        register(df.sparkSession, r)
        if (ownedByParents) internalCuts.add(r)
        if (kids.nonEmpty) {
          childrenOf.put(r, kids)
          kids.foreach(k => parentRefs.merge(k, 1, (a, b) => a + b))
        }
        Option(scopeTl.get()).foreach(_ += ((df.sparkSession, r)))
      }
    cut
  }

  /** Release the checkpoint blocks behind `df` — a cut, or any frame
   * derived from one. The plan is scanned for RDD-backed leaves and
   * each leaf's LINEAGE is walked too: an operator that bridges through
   * the RDD API (e.g. a mapPartitions fold over a cut, re-wrapped with
   * createDataFrame) hides the cut from the logical plan but not from
   * the dependency chain, and without the walk its blocks would be
   * unreleasable. Each branch of the walk stops at the FIRST registered
   * cut it finds and frees it; an [[internal]] cut NESTED inside the
   * freed one (the Materialize(f(Materialize(g(x)))) shape) is freed
   * when its LAST registered parent goes, via the parent-refcounted
   * edges recorded at registration — without them the inner cut is
   * unreachable (the outer cut truncated lineage) and its blocks would
   * leak for the session lifetime. An internal cut shared by SEVERAL
   * registered parents survives until the last one is released; plain
   * [[apply]] cuts are never cascade-freed (iterative operators release
   * superseded rounds eagerly while still reading their shared inputs —
   * an automatic cascade would free those inputs mid-loop). Only blocks
   * this object registered are touched, so passing a frame that was
   * never cut is a safe no-op; walks stay short because a cut truncates
   * lineage.
   *
   * The released frame must not be read again — and neither must any
   * SIBLING frame whose plan contains the same cut as a leaf (two
   * frames derived from one cut share its blocks; releasing either
   * kills the shared leaf for both). Operators returning several frames
   * over one cut (e.g. `Dedup.dedupPipeline`) document this on their
   * result type: release such frames together, after ALL their terminal
   * actions. The same contract covers a cut held BOTH standalone and
   * nested inside another cut: when its last registered parent is
   * released it is freed with it. */
  def release(df: DataFrame): Unit = {
    val seen = mutable.Set[RDD[_]]()
    def walk(r: RDD[_]): Unit = if (seen.add(r)) {
      if (isLive(df.sparkSession, r)) free(df.sparkSession, r)
      else r.dependencies.foreach(d => walk(d.rdd))
    }
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => walk(lr.rdd)
      case _ => ()
    }
  }

  /** Run `body`, then release every cut it created on this thread — the
   * per-query wrapper for harnesses that run queries concurrently (each
   * query's cuts die with it; other threads' cuts are untouched). */
  def scoped[T](body: => T): T = {
    val outer = scopeTl.get()
    val mine = mutable.Buffer.empty[(SparkSession, RDD[_])]
    scopeTl.set(mine)
    try body
    finally {
      scopeTl.set(outer)
      mine.foreach { case (s, r) => free(s, r) }
    }
  }

  /**
   * Run independent actions CONCURRENTLY, with every cut a task creates
   * joining the CALLER's innermost [[scoped]] block — the fan-out shape
   * a registry commit wants: N maintained aggregates land as N
   * independent Spark write jobs whose per-commit fixed cost (write job
   * + manifest publish + vacuum) overlaps in wall time instead of
   * serializing, while cuts made on worker threads (e.g. a fold's
   * memoized tokenize table, shared ACROSS the sibling tasks) stay
   * alive until the caller's scope closes — releasing them per task
   * would kill a memo a sibling still reads.
   *
   * Each worker runs under its own scope buffer (the thread-local is
   * never shared, so no append races); the buffers merge into the
   * parent scope AFTER every task settles, on the calling thread.
   * Failure semantics match the sequential loop's crash window: all
   * tasks run to completion or failure, the first failure then
   * propagates — siblings may or may not have landed, exactly what the
   * caller's repair machinery (commit markers) already handles. A
   * single-element or empty input runs inline.
   */
  def fanOut[A](xs: Seq[A])(f: A => Unit): Unit =
    if (xs.sizeIs <= 1) xs.foreach(f)
    else {
      import scala.concurrent.{Await, Future, blocking}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val settled = Await.result(Future.sequence(xs.map { x =>
        Future {
          val outer = scopeTl.get()
          val mine = mutable.Buffer.empty[(SparkSession, RDD[_])]
          scopeTl.set(mine)
          // blocking(): Spark actions park the thread; let the global
          // pool grow past core count instead of deadlocking on nesting.
          // The restore sits in a finally: Try does not catch fatal
          // throwables (InterruptedException from a cancelled job), and
          // a reused pool thread left pointing at this dead buffer
          // would leak every later cut it creates
          val t = try scala.util.Try(blocking(f(x)))
                  finally scopeTl.set(outer)
          (t, mine)
        }
      }), Duration.Inf)
      val parent = scopeTl.get()
      if (parent != null) settled.foreach { case (_, b) => parent ++= b }
      settled.collectFirst { case (scala.util.Failure(e), _) => throw e }
    }

  /** Release every live cut owned by `session` — for single-threaded
   * harnesses between queries. Other sessions' cuts in the same JVM are
   * untouched. Unsafe while another thread's query on THIS session is
   * mid-flight. */
  def releaseAll(session: SparkSession): Unit = {
    val set = live.get(session)
    if (set != null) {
      // snapshot: free() mutates the set through deregister, and frees
      // children (same session's set) ahead of the iterator reaching them
      val snap = new java.util.ArrayList[RDD[_]](set)
      snap.forEach(r => free(session, r))
    }
  }

  /** [[releaseAll]] for the calling thread's active (else default)
   * session — the convenience form for single-session harnesses. */
  def releaseAll(): Unit =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(releaseAll)
}
