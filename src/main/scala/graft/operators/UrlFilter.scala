package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL/domain filtering — the first stage of every crawl-derived
 * training-data pipeline: drop blocklisted hosts outright, downsample
 * greylisted (boilerplate-heavy, low-quality) hosts, pass the rest.
 *
 * Scale shape: host extraction is one narrow regexp (no UDF); the
 * blocklist is CONFIG-sized (thousands of hosts vs a 100 TB corpus), so
 * it joins as an explicit broadcast anti-join — the corpus side never
 * shuffles; greylist downsampling is the content-keyed narrow filter of
 * [[Sampling.hashSampleBy]] (deterministic across engines,
 * partitionings, and retries). The whole operator is a single scan.
 */
object UrlFilter {

  /** Lowercased host of a URL (`scheme://[userinfo@]HOST[:port]/...`)
   * or null when the value does not parse as an absolute URL. The
   * optional userinfo is consumed BEFORE the host capture —
   * `https://evil@blocked.example/` must filter as `blocked.example`,
   * not as the attacker-chosen userinfo (the classic blocklist-evasion
   * vector) — and the userinfo class ALLOWS '@' so the split happens at
   * the LAST '@' before the path, matching WHATWG parsers (otherwise
   * `a@b@blocked.example` would capture `b` and evade again). A regexp
   * rather than `parse_url` so an external SQL engine replays it
   * identically (RE2-and-Java compatible — no lookaround).
   *
   * Bracketed IPv6 literal hosts (`https://[2001:db8::1]/x`) are a
   * dedicated alternation tried BEFORE the generic host class: the
   * generic class stops at ':' and would yield the garbage host
   * "[2001", making IPv6 hosts unblocklistable. The brackets are KEPT
   * in the extracted host (WHATWG serialization), so blocklist entries
   * for IPv6 literals are written bracketed too: `[2001:db8::1]`. */
  def host(c: Column): Column = {
    val h = regexp_extract(lower(c),
      "^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?(\\[[0-9a-f:.]+\\]|[^/:?#@]+)", 1)
    when(h =!= "", h) // regexp_extract yields "" on no match -> null
  }

  /**
   * Filter `df` by the host of `urlCol`: blocklisted hosts are dropped
   * (broadcast anti-join), greylisted hosts keep the given fraction of
   * rows (content-keyed on the full URL, so retries and repartitions
   * keep the same rows), all other hosts pass. Rows without a parseable
   * host are dropped — crawl hygiene: a record that cannot be
   * attributed to a domain cannot be policy-filtered either.
   *
   * The extracted host is appended as `hostOut` for downstream
   * per-domain accounting.
   */
  def filterByDomain(df: DataFrame, urlCol: String,
                     blocklist: Seq[String], greylist: Map[String, Double],
                     seed: Long = 42L, hostOut: String = "host"): DataFrame = {
    require(!df.columns.contains(hostOut),
      s"host output column $hostOut already exists on the input")
    val spark = df.sparkSession
    import spark.implicits._
    // hosts come out of host() lowercased; a mixed-case config entry
    // would otherwise be a silent no-op. Locale.ROOT: the default-locale
    // toLowerCase can disagree with Spark's locale-independent lower()
    // (Turkish dotless-i) and silently fail to match
    val block = blocklist.map(_.toLowerCase(java.util.Locale.ROOT))
    val grey = greylist.map { case (h, f) =>
      h.toLowerCase(java.util.Locale.ROOT) -> f }
    val withHost = df.withColumn(hostOut, host(col(urlCol)))
      .filter(col(hostOut).isNotNull)
    val afterBlock =
      if (block.isEmpty) withHost
      else withHost.join(
        broadcast(block.toDF(hostOut)), Seq(hostOut), "left_anti")
    // unlisted hosts keep everything (default 1.0) — the greylist is a
    // downsample, not an allowlist
    if (grey.isEmpty) afterBlock
    else Sampling.hashSampleBy(afterBlock, hostOut, urlCol,
      grey, default = 1.0, seed = seed)
  }

  /**
   * Per-domain document cap — C4/RefinedWeb-style curation: keep at most
   * `maxPerHost` rows per host, preferring higher `orderCol` (a quality
   * score, token count, …), ties broken by ascending `tieCol` so the
   * ordering is total and the keep set deterministic.
   *
   * Scale shape: crawl hosts are Zipf-distributed — the naive worry is
   * a hot host's billions of rows landing on one window reducer. The
   * declarative row_number-then-filter shape hands that problem to
   * Catalyst's rank-limit pushdown (SPARK-37099): the optimizer inserts
   * a PARTIAL WindowGroupLimit below the host exchange, so every map
   * task forwards at most `maxPerHost` rows per host and the hot-host
   * reducer sees at most maxPerHost × mapTasks rows — the classic
   * two-phase top-N, for free, with a single shuffle (a hand-rolled
   * (partition_id, host) pre-prune would compute the same bound through
   * one extra exchange). The plan fact is pinned in PlanShapeSpec.
   */
  def capPerDomain(df: DataFrame, hostCol: String, orderCol: String,
                   tieCol: String, maxPerHost: Int): DataFrame = {
    require(maxPerHost >= 1, "maxPerHost < 1 would drop every host entirely")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(hostCol))
      .orderBy(col(orderCol).desc, col(tieCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerHost).drop("__rn")
  }
}
