package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan shape of the round-7 operators: the properties that make
 * them 100 TB-viable are plan facts (broadcast joins, pushed filters,
 * shuffle counts), so they are pinned here against regressions — an
 * operator that silently falls back to a shuffle join or an unpushed
 * filter still passes its value-correctness oracle.
 */
class PlanShapeSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"

  /** Finalized (post-AQE) executed-plan text of a SparkEntry query —
   * the ADAPTIVE node's toString prints Initial AND Final sections,
   * which would double-count scans/exchanges, so unwrap the final. */
  private def plan(name: String): String = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize adaptive plans
    graft.operators.Materialize.releaseAll()
    val ex = df.queryExecution.executedPlan
    val finals = ex.collect { case a: AdaptiveSparkPlanExec => a.executedPlan.toString }
    if (finals.nonEmpty) finals.mkString("\n") else ex.toString
  }

  private def shuffles(p: String): Int =
    p.linesIterator.count(l => l.contains("Exchange rangepartitioning") ||
      l.contains("Exchange hashpartitioning") ||
      l.contains("Exchange SinglePartition"))

  private def scans(p: String): Int =
    p.linesIterator.count(_.contains("FileScan"))

  test("s09 range search: probe join broadcasts, never a shuffle join") {
    val p = plan("s09_ann_range_search")
    assert(p.contains("BroadcastHashJoin"),
      "the probed-query side must broadcast into the corpus scan")
    assert(!p.contains("SortMergeJoin"),
      "a shuffle join on the candidate path would reshuffle the corpus")
  }

  test("d10 mixture sample: one pushed-filter scan plus the output sort") {
    val p = plan("d10_mixture_sample")
    assert(scans(p) == 1, s"expected a single corpus scan:\n$p")
    // the md5 keep-rule must reach the scan NODE as a data filter — a
    // plan-wide contains() would also match a post-scan Filter over a
    // full read, the exact regression this pins against
    val scanLine = p.linesIterator.find(_.contains("FileScan")).get
    assert(scanLine.contains("md5"),
      s"keep filter did not reach the scan node: $scanLine")
    assert(shuffles(p) == 1, s"only the orderBy may shuffle:\n$p")
  }

  test("d12 span dedup: one corpus scan, content-keyed joins, no cartesian") {
    val p = plan("d12_span_dedup")
    // the position index is cut once and feeds both sides of the pair
    // join: the final stage must read ONLY the materialized index (a
    // FileScan here would mean the corpus tokenizes a second time), and
    // the cut must appear on both join sides
    assert(scans(p) == 0, s"corpus re-scanned past the index cut:\n$p")
    assert(p.linesIterator.count(_.contains("Scan ExistingRDD")) >= 2,
      s"both pair-join sides must read the same cut:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "the pair stage must stay keyed on the shingle hash")
  }

  test("q40 url filter: blocklist broadcasts, corpus side never shuffles") {
    val p = plan("q40_url_filter")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"the config-sized blocklist must broadcast-anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "a shuffle join would reshuffle the 100 TB corpus against a config list")
    assert(scans(p) == 1, s"expected a single corpus scan:\n$p")
    assert(shuffles(p) == 1, s"only the orderBy may shuffle:\n$p")
  }

  test("t09 pii: narrow regexp pass — one scan, no join, sort only") {
    val p = plan("t09_pii")
    assert(scans(p) == 1)
    assert(shuffles(p) == 1, s"only the orderBy may shuffle:\n$p")
    assert(!p.contains("Join"), "counts + redaction must ride one pass")
  }

  test("t08 repetition: pure narrow expressions — one scan, sort only") {
    val p = plan("t08_repetition")
    assert(scans(p) == 1)
    assert(shuffles(p) == 1, s"only the orderBy may shuffle:\n$p")
    assert(!p.contains("Join"), "repetition ratios must not join anything")
  }

  test("t12 chunking: narrow stepped-explode — one scan, sort only, no join") {
    val p = plan("t12_chunk_tokens")
    assert(scans(p) == 1, s"expected a single corpus scan:\n$p")
    assert(shuffles(p) == 1, s"only the orderBy may shuffle:\n$p")
    assert(!p.contains("Join"), "chunking must not join anything")
  }

  test("d16 bloom sweep: the corpus path carries NO join at all") {
    val p = plan("d16_bloom_decontaminate")
    // the whole point of the packed-bits broadcast literal: membership is
    // a narrow expression, so the 100 TB side sees only its own
    // spread/aggregate/sort exchanges — never a join of any kind
    assert(!p.contains("Join"), s"bloom membership must not join:\n$p")
    assert(scans(p) == 1, s"expected a single corpus scan:\n$p")
  }

  test("s10 kmeans labels: size join broadcasts, corpus never sort-merges") {
    val p = plan("s10_kmeans_clusters")
    assert(p.contains("BroadcastHashJoin"),
      "the nCells-row size table must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "a shuffle join against a 16-row size table would reshuffle the corpus")
  }

  test("t15 bm25: the query-term table broadcasts into the postings join") {
    val p = plan("t15_bm25_topk")
    // the postings restriction is the scale lever: the corpus-sized tf
    // table must meet the benchmark-sized query terms via broadcast,
    // never by reshuffling the postings on term. Asserting "some
    // BroadcastHashJoin exists" would be satisfied by an AQE-broadcast
    // dfreq/dl join, so pin the absence of any term-keyed shuffle join
    // (the dl join on doc is allowed to sort-merge)
    assert(p.contains("BroadcastHashJoin"),
      s"query terms must broadcast into tf:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && l.contains("term")),
      s"postings must never meet query terms via a term shuffle join:\n$p")
  }

  test("q41 domain cap: rank limit pushed below the host exchange") {
    val p = plan("q41_domain_cap")
    // the Zipf-host defense is Catalyst's, and this pins it: a PARTIAL
    // WindowGroupLimit before the host shuffle caps what each map task
    // forwards per host, so a hot host's reducer input is bounded by
    // cap x mapTasks no matter the corpus size
    assert(p.linesIterator.exists(l =>
        l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"expected a map-side Partial WindowGroupLimit:\n$p")
    assert(shuffles(p) == 2,
      s"expected one host exchange plus the output sort, got:\n$p")
  }
}
