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
    val base = lit((100L - dampingPct) * 10000L) // (1-d) * 1e6 in micros
    var ranks = Materialize.eager(
      nodes.withColumn("rank_micro", lit(1000000L)))
    for (_ <- 1 to iterations) {
      val contrib = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst"), expr("rank_micro DIV outdeg").as("__c"))
        .groupBy("dst").agg(sum("__c").as("__in"))
      val next = Materialize.eager(
        ranks.select(col("node")).join(contrib,
            col("node") === col("dst"), "left")
          .select(col("node"),
            (base + expr(s"coalesce(__in, 0L) * $dampingPct DIV 100"))
              .as("rank_micro")))
      Materialize.release(ranks)
      ranks = next
    }
    Materialize.release(eo)
    ranks
  }
}
