package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Link-graph centrality — the domain-quality signal crawl curation runs
 * BEFORE any per-document filter: CommonCrawl-derived corpora rank
 * hosts by link centrality (harmonic/PageRank — Nagel's CommonCrawl
 * host ranking; OpenWebText's upvote proxy plays the same role) and
 * keep documents from well-linked domains. The reference engine has no
 * graph surface at all; a training-data pipeline needs at least this
 * one.
 *
 * [[pageRankMicro]] is the power-method PageRank in EXACT INTEGER
 * micro-units: ranks start at 1e6, each iteration a node's mass splits
 * by integer division over its out-degree and the damped update is
 * `(1-d) * 1e6 + (d * inbound) / 100` in integer arithmetic. Integer
 * division leaks sub-micro mass (the classic fixed-point trade) —
 * deliberate, because the payoff is that every rank is EXACTLY
 * reproducible by any engine: long sums are order-independent where
 * float sums are not, so the whole iteration is oracle-replayable bit
 * for bit. Dangling-node mass is dropped by default (the simple
 * variant); `redistributeDangling = true` spreads each round's
 * dangling mass uniformly — every node receives `D DIV N` extra
 * inbound before damping, still exact-integer and order-independent.
 * `earlyStopDeltaMicro = Some(eps)` stops the loop once no rank moved
 * by more than `eps` micros in a round (max |Δ| ≤ eps — the standard
 * L∞ convergence test), at the cost of one node-sized join+max per
 * round; `iterations` stays the hard cap either way.
 *
 * Scale shape: edges deduplicate once and are [[Materialize]]d JOINED
 * with their out-degrees (the loop's constant side); each iteration is
 * ONE join (ranks, node-cardinality, against the edge table) and ONE
 * map-side-combinable sum keyed by destination — the classic
 * DataFrame-PageRank round, `iterations` of them (config-scale driver
 * rounds, the Lloyd's-iteration pattern). Superseded rank tables
 * release eagerly, so lineage and storage stay O(1) in the iteration
 * count. At 100 TB-of-edges scale, bucket the edge table by `src` so
 * the per-iteration join co-locates without reshuffling the edges.
 */
object Graphs {

  /** Deterministic integer-micro PageRank over the distinct edge set.
   * Returns (node, rank_micro) for every node appearing as source OR
   * destination. `dampingPct` is the damping factor in percent (85 =
   * the classic 0.85). */
  def pageRankMicro(edges: DataFrame, srcCol: String, dstCol: String,
                    iterations: Int, dampingPct: Int = 85,
                    redistributeDangling: Boolean = false,
                    earlyStopDeltaMicro: Option[Long] = None): DataFrame = {
    validateArgs(iterations, dampingPct, earlyStopDeltaMicro)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .na.drop().distinct()
    // the loop's two constant sides, cut once: edges with their
    // out-degrees (eager — each iteration's join would otherwise
    // recompute the distinct+degree aggregate) and the node set (the
    // seed, the dangling anti-join, and the node count all read it)
    val eo = Materialize.eager(
      e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"))
    val nodes = Materialize.eager(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct())
    val (ranks, _) = pageRankLoop(eo, nodes, iterations, dampingPct,
      redistributeDangling, earlyStopDeltaMicro)
    Materialize.release(nodes)
    Materialize.release(eo)
    ranks
  }

  /** Argument validation, FIRST in every public entry point — an
   * invalid round count must throw before any edge dedup materializes,
   * any bucketed table writes, or any cache pins (the exception path
   * skips the release calls). */
  private def validateArgs(iterations: Int, dampingPct: Int,
                           earlyStopDeltaMicro: Option[Long]): Unit = {
    require(iterations >= 1 && iterations <= 50,
      "iterations must be in [1, 50] — a config-scale round count")
    require(dampingPct >= 0 && dampingPct <= 100,
      "dampingPct is a percentage")
    earlyStopDeltaMicro.foreach(eps =>
      require(eps >= 0L, "earlyStopDeltaMicro must be >= 0"))
  }

  /** The shared power loop behind both public variants: seeds every
   * node at 1e6 micros and runs up to `iterations` rounds of
   * [[iteration]] over the prepared edge+degree side `eo`. Returns the
   * final ranks AND the number of rounds actually executed (< cap only
   * under early-stop) — the count is what the convergence specs pin. */
  private[graft] def pageRankLoop(eo: DataFrame, nodes: DataFrame,
                                  iterations: Int, dampingPct: Int,
                                  redistributeDangling: Boolean,
                                  earlyStopDeltaMicro: Option[Long])
      : (DataFrame, Int) = {
    validateArgs(iterations, dampingPct, earlyStopDeltaMicro)
    // the dangling constant side, cut once: the nodes with NO out-edge
    // (their mass would otherwise drain) and the node count the uniform
    // share divides by — one scalar driver action, taken only when the
    // knob is on
    val dangling =
      if (!redistributeDangling) None
      else {
        val dang = Materialize.eager(nodes.join(
          eo.select(col("src").as("node")).distinct(), Seq("node"),
          "left_anti"))
        Some((dang, nodes.count()))
      }
    var ranks = Materialize.eager(
      nodes.withColumn("rank_micro", lit(1000000L)))
    var rounds = 0
    var converged = false
    while (rounds < iterations && !converged) {
      val next = Materialize.eager(
        iteration(eo, ranks, dampingPct, dangling))
      rounds += 1
      // L∞ convergence: one node-sized join + max per round, only when
      // the caller opted in (the default loop stays action-free)
      converged = earlyStopDeltaMicro.exists { eps =>
        next.join(ranks.select(col("node"),
              col("rank_micro").as("__prev")), "node")
          .agg(coalesce(max(abs(col("rank_micro") - col("__prev"))),
            lit(0L)))
          .head.getLong(0) <= eps
      }
      Materialize.release(ranks)
      ranks = next
    }
    dangling.foreach { case (d, _) => Materialize.release(d) }
    (ranks, rounds)
  }

  /** One damped power-method round: rank mass splits over out-degrees,
   * sums by destination, and the damped update lands per node. Shared
   * verbatim by [[pageRankMicro]] and [[pageRankMicroBucketed]] — the
   * plan-shape spec pins THIS function, so the pin covers every loop
   * round of both variants. With `dangling = Some((danglingNodes, n))`
   * the round's dangling mass D (one long, computed by a node-sized
   * semi-join + sum and broadcast under every node) adds `D DIV n` to
   * each node's inbound before damping — exact-integer, so the
   * redistribution replays bit-for-bit like everything else here. */
  private[graft] def iteration(eo: DataFrame, ranks: DataFrame,
                               dampingPct: Int,
                               dangling: Option[(DataFrame, Long)] = None)
      : DataFrame = {
    val base = lit((100L - dampingPct) * 10000L) // (1-d) * 1e6 in micros
    val contrib = eo.join(ranks, eo("src") === ranks("node"))
      .select(col("dst"), expr("rank_micro DIV outdeg").as("__c"))
      .groupBy("dst").agg(sum("__c").as("__in"))
    val joined = ranks.select(col("node")).join(contrib,
      col("node") === col("dst"), "left")
    dangling match {
      case None =>
        joined.select(col("node"),
          (base + expr(s"coalesce(__in, 0L) * $dampingPct DIV 100"))
            .as("rank_micro"))
      case Some((dang, n)) =>
        val dmass = ranks.join(dang, Seq("node"), "left_semi")
          .agg(coalesce(sum("rank_micro"), lit(0L)).as("__d"))
        joined.crossJoin(broadcast(dmass))
          .select(col("node"),
            (base + expr(s"(coalesce(__in, 0L) + __d DIV ${n}L)" +
              s" * $dampingPct DIV 100")).as("rank_micro"))
    }
  }

  /**
   * [[pageRankMicro]] over a BUCKETED edge table — the 100 TB-of-edges
   * form this file's scale note prescribes. The deduplicated edges join
   * their out-degrees ONCE and persist through [[graft.catalog.Bucketing]]
   * keyed by `src`; every iteration's rank join then reads the bucketed
   * scan's hash partitioning directly, so across all `iterations` rounds
   * the edge table — the corpus-scale side — is NEVER shuffled: only the
   * node-sized rank table moves, once per round, into the edges'
   * partitioning. Ranks are bit-identical to [[pageRankMicro]] (integer
   * micro-units are summation-order-independent), proven by spec and by
   * sharing the q57 oracle.
   *
   * The bucketed table registers in the session catalog under `table`
   * (bucket metadata only exists for catalog tables) with its files at
   * `path`; concurrent PageRanks in one session must pass distinct
   * names. The table is left registered — it IS the persisted edge
   * index, reusable by later runs via `spark.table`.
   *
   * `path` places the persisted edge files: on a real cluster pass a
   * SHARED location (HDFS/object store — a driver-local path is
   * unreadable by remote executors) and own its lifecycle like any
   * other table's. The `None` default creates a driver-local temp dir —
   * the local/bench convenience ONLY — and ownership follows the table:
   * the dir lives until the caller drops `table` and deletes it, so
   * repeated bench runs in one session should pass distinct names or
   * clean up between calls.
   */
  def pageRankMicroBucketed(spark: SparkSession, edges: DataFrame,
                            srcCol: String, dstCol: String,
                            iterations: Int, dampingPct: Int = 85,
                            buckets: Int = 32,
                            table: String = "graft_pr_edges",
                            path: Option[String] = None,
                            redistributeDangling: Boolean = false,
                            earlyStopDeltaMicro: Option[Long] = None)
      : DataFrame = {
    validateArgs(iterations, dampingPct, earlyStopDeltaMicro)
    require(buckets >= 1, "buckets must be >= 1")
    // cut the deduplicated edges once: the degree join reads them twice
    // and recomputing the distinct would scan the source three times
    val e = Materialize.eager(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .na.drop().distinct())
    val loc = path.getOrElse(java.nio.file.Files
      .createTempDirectory("graft-pr-edges").toString)
    graft.catalog.Bucketing.writeBucketed(
      e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"),
      table, loc, "src", buckets)
    val eo = spark.table(table)
    // cut the node set from the still-cut edge frame (one pass over
    // in-memory blocks) rather than re-scanning the freshly-written
    // table, then drop the edges — the bucketed table IS the persisted
    // form, so only the node-sized frame stays cached through the loop
    val nodes = Materialize.eager(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct())
    Materialize.release(e)
    val (ranks, _) = pageRankLoop(eo, nodes, iterations, dampingPct,
      redistributeDangling, earlyStopDeltaMicro)
    Materialize.release(nodes)
    ranks
  }
}
