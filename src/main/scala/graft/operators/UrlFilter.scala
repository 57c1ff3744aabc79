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

  /** Split `u` at the first occurrence of the `stop` character class:
   * (prefix, rest). The extract and the replace MUST share one anchored
   * pattern or the two halves desynchronize — hence the single helper. */
  private def splitAt(u: Column, stop: String): (Column, Column) = {
    val pat = s"^[^$stop]*"
    (regexp_extract(u, pat, 0), regexp_replace(u, pat, ""))
  }

  /**
   * Canonical dedup key for a URL — the RefinedWeb-style URL-level dedup
   * step that runs BEFORE any content is fetched or compared: the same
   * page re-crawled as `https://www.example.com/a/1/?utm_source=x`,
   * `HTTPS://EXAMPLE.COM:443/a/1#nav` and `https://example.com/a/1`
   * must collapse to ONE canonical form. Normalizations applied, in
   * order: lowercase of everything BEFORE the query (hosts/schemes are
   * case-insensitive; path folding is a DEDUP-KEY choice — case-only
   * path variants are overwhelmingly the same page — while query VALUES
   * keep their case: base64-style ids are case-sensitive), fragment
   * strip, tracking-parameter strip (`utm_*`, click ids, `ref`, matched
   * case-insensitively — anchored at a `?`/`&` separator so a path
   * segment that merely CONTAINS a lookalike, e.g. `/href=x`, is
   * untouched; the kept separator is then collapsed), dangling `?`/`&`
   * cleanup, default-port strip (`:80`/`:443`), leading-`www.` strip,
   * PATH-final trailing-slash strip (before the query or at the end;
   * never inside a query value).
   *
   * Pure narrow regexp chain (whole-stage codegen, no UDF), every
   * pattern RE2-and-Java compatible so an external SQL engine replays
   * the canonical form byte-for-byte.
   */
  def canonicalizeUrl(c: Column): Column = {
    // fold case ONLY up to the query: scheme/host are case-insensitive
    // and path folding is a dedup-key choice, but query VALUES are often
    // case-SENSITIVE ids (base64 video/doc ids) — folding them would
    // merge genuinely distinct pages. Tracking-parameter NAMES still
    // match case-insensitively via (?i) below.
    val (head, tail) = splitAt(c, "?#")
    val lowered = concat(lower(head), tail)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    // the separator stays in (as $1) and separator RUNS collapse after,
    // so '?utm=a&b=1' -> '?&b=1' -> '?b=1' without ever fusing a kept
    // parameter onto the path
    val noTrack = regexp_replace(noFrag,
      "(?i)([?&])(utm_[a-z0-9_]+|gclid|fbclid|msclkid|igshid|mc_eid|ref)=[^&#]*",
      "$1")
    val noRuns = regexp_replace(
      regexp_replace(noTrack, "&&+", "&"), "\\?&", "?")
    val noDangle = regexp_replace(noRuns, "[?&]+$", "")
    val noPort = regexp_replace(noDangle,
      "^(https?://[^/:?#]+):(80|443)([/?#]|$)", "$1$3")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    // trailing-slash strip applies to the PATH only — split at the first
    // '?' and collapse the path side, so '/a/1/?q=2' and '/a/1?q=2'
    // share a key while a '/?' INSIDE a query value (redirect/next-style
    // params embedding URLs) stays untouched; the query-less case falls
    // out of the same split (empty rest)
    val (path, query) = splitAt(noWww, "?")
    concat(regexp_replace(path, "/+$", ""), query)
  }

  /**
   * URL-level dedup: keep the best row per CANONICAL URL (highest
   * `orderCol`, ties by ascending `tieCol`), appending the canonical
   * form as `canonOut`. Delegates the keep-1-per-key selection to
   * [[capPerDomain]], so hot canonical keys (a viral URL crawled
   * millions of times) ride the same SPARK-37099 partial
   * WindowGroupLimit bound — map output is capped at 1 row per key
   * before the exchange. One narrow projection + one rank-limited
   * shuffle at any scale.
   */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String, orderCol: String,
                          tieCol: String,
                          canonOut: String = "canon_url"): DataFrame = {
    require(!df.columns.contains(canonOut),
      s"canonical output column $canonOut already exists on the input")
    capPerDomain(df.withColumn(canonOut, canonicalizeUrl(col(urlCol))),
      canonOut, orderCol, tieCol, maxPerHost = 1)
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
