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
 * division leaks sub-micro mass (the classic fixed-point trade) and
 * dangling-node mass is NOT redistributed (the simple variant; add a
 * sink edge per dangling node if that matters) — both deliberate,
 * because the payoff is that every rank is EXACTLY reproducible by any
 * engine: long sums are order-independent where float sums are not, so
 * the whole iteration is oracle-replayable bit for bit.
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
                    iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      "iterations must be in [1, 50] — a config-scale round count")
    require(dampingPct >= 0 && dampingPct <= 100,
      "dampingPct is a percentage")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .na.drop().distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    // the loop's constant side, cut once: edges with their out-degrees
    // (eager — each iteration's join would otherwise recompute the
    // distinct+degree aggregate)
    val eo = Materialize.eager(
      e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"))
    var ranks = Materialize.eager(
      nodes.withColumn("rank_micro", lit(1000000L)))
    for (_ <- 1 to iterations) {
      val next = Materialize.eager(iteration(eo, ranks, dampingPct))
      Materialize.release(ranks)
      ranks = next
    }
    Materialize.release(eo)
    ranks
  }

  /** One damped power-method round: rank mass splits over out-degrees,
   * sums by destination, and the damped update lands per node. Shared
   * verbatim by [[pageRankMicro]] and [[pageRankMicroBucketed]] — the
   * plan-shape spec pins THIS function, so the pin covers every loop
   * round of both variants. */
  private[graft] def iteration(eo: DataFrame, ranks: DataFrame,
                               dampingPct: Int): DataFrame = {
    val base = lit((100L - dampingPct) * 10000L) // (1-d) * 1e6 in micros
    val contrib = eo.join(ranks, eo("src") === ranks("node"))
      .select(col("dst"), expr("rank_micro DIV outdeg").as("__c"))
      .groupBy("dst").agg(sum("__c").as("__in"))
    ranks.select(col("node")).join(contrib,
        col("node") === col("dst"), "left")
      .select(col("node"),
        (base + expr(s"coalesce(__in, 0L) * $dampingPct DIV 100"))
          .as("rank_micro"))
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
   * (bucket metadata only exists for catalog tables) with its files at a
   * fresh temp path per call; concurrent PageRanks in one session must
   * pass distinct names. The table is left registered — it IS the
   * persisted edge index, reusable by later runs via `spark.table`.
   */
  def pageRankMicroBucketed(spark: SparkSession, edges: DataFrame,
                            srcCol: String, dstCol: String,
                            iterations: Int, dampingPct: Int = 85,
                            buckets: Int = 32,
                            table: String = "graft_pr_edges"): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      "iterations must be in [1, 50] — a config-scale round count")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percentage")
    require(buckets >= 1, "buckets must be >= 1")
    // cut the deduplicated edges once: the degree join reads them twice
    // and recomputing the distinct would scan the source three times
    val e = Materialize.eager(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .na.drop().distinct())
    val path = java.nio.file.Files
      .createTempDirectory("graft-pr-edges").toString
    graft.catalog.Bucketing.writeBucketed(
      e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"),
      table, path, "src", buckets)
    val eo = spark.table(table)
    // seed ranks from the still-cut edge frame (one pass over in-memory
    // blocks) rather than re-scanning the freshly-written table twice
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var ranks = Materialize.eager(
      nodes.withColumn("rank_micro", lit(1000000L)))
    Materialize.release(e) // the bucketed table IS the persisted form
    for (_ <- 1 to iterations) {
      val next = Materialize.eager(iteration(eo, ranks, dampingPct))
      Materialize.release(ranks)
      ranks = next
    }
    ranks
  }
}
