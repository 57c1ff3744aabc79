package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Row sampling + empty-relation helpers (reference
 * src/apply_change_log_to_delta.py:268-281: `load_sample_to_df` wraps
 * `df.sample(0.01)`, `get_empty_df` wraps
 * `spark.createDataFrame(emptyRDD, schema)`).
 */
object Sampling {

  /** Reference-parity Bernoulli sample: Spark's native `df.sample` with a
   * pinned seed (per-partition xorshift — fast, not content-stable). */
  def sample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(fraction, seed)

  /**
   * Content-keyed deterministic Bernoulli sample: keep a row iff the first
   * 16 bits of md5(key ':' seed) fall under floor(fraction * 2^16).
   *
   * Unlike `df.sample`, membership depends only on the key value — stable
   * across engines, partitionings, and retries (lexicographic comparison
   * of lowercase hex equals numeric comparison, so any SQL engine
   * reproduces the sample bit-for-bit). A pure narrow filter: no shuffle,
   * survives predicate pushdown planning, and sampling by a join/entity
   * key yields consistent entity-complete samples across tables — the
   * standard way to cut a coherent slice of a 100 TB corpus.
   */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    if (fraction >= 1.0) df
    else df.filter(keyDigest(keyCol, seed) < lit(cutHex(fraction)))
  }

  /** The shared 16-bit digest/threshold contract of [[hashSample]] and
   * [[hashSampleBy]]: first 4 hex chars of md5(key ':' seed), compared
   * lexicographically (== numerically for lowercase hex) against
   * floor(fraction * 2^16) as 4-digit hex; "zzzz" sorts above every
   * digest prefix -> keep-all. */
  private def keyDigest(keyCol: String, seed: Long) =
    substring(md5(concat(col(keyCol).cast("string"), lit(":" + seed))
      .cast("binary")), 1, 4)

  private def cutHex(fraction: Double): String =
    if (fraction >= 1.0) "zzzz" else f"${math.floor(fraction * 65536).toLong}%04x"

  /**
   * Content-keyed STRATIFIED sample: per-stratum keep fractions over the
   * same md5 threshold as [[hashSample]] (the portable, partitioning- and
   * retry-stable twin of `df.stat.sampleBy`). `fractions` maps stratum
   * values (string form of `strataCol`) to keep fractions; unlisted
   * strata fall back to `default`. Still a pure narrow filter — the
   * stratum map compiles to a literal CASE, so no shuffle and no
   * per-stratum pass: the standard way to rebalance a skewed 100 TB
   * corpus (e.g. downsample boilerplate-heavy domains) in one scan.
   */
  def hashSampleBy(df: DataFrame, strataCol: String, keyCol: String,
                   fractions: Map[String, Double], default: Double = 0.0,
                   seed: Long = 42L): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val thr = fractions.foldLeft(lit(cutHex(default))) { case (acc, (k, f)) =>
      when(col(strataCol).cast("string") === k, lit(cutHex(f))).otherwise(acc)
    }
    df.filter(keyDigest(keyCol, seed) < thr)
  }

  /**
   * Mixture (data-mixing) sample: downsample classes so the OUTPUT
   * follows the target class WEIGHTS — the standard rebalancing step of
   * a training-data pipeline (hit a target language/domain/quality mix
   * from a skewed crawl). Weights are relative (they need not sum to 1);
   * no class is upsampled, and the output is the LARGEST achievable for
   * the requested mixture: N = min over target classes of n_c / w_c,
   * rate_c = (w_c * N) / n_c (the binding class keeps everything).
   * Classes outside `targets` are dropped; target classes absent from
   * the data are ignored.
   *
   * Per-class counts are one tiny aggregate collected driver-side
   * (|classes| rows — configuration, not data); the sample itself is the
   * same content-keyed narrow filter as [[hashSampleBy]], so the whole
   * operator is two corpus passes at any scale, deterministic across
   * engines, partitionings, and retries.
   */
  def mixtureSample(df: DataFrame, classCol: String, keyCol: String,
                    targets: Map[String, Double], seed: Long = 42L): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0.0),
      "targets must be non-empty with positive weights")
    val counts = df.groupBy(col(classCol).cast("string").as("c"))
      .agg(count(lit(1)).as("n"))
      .collect().flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1)))
      .toMap
    val present = targets.filter { case (c, _) => counts.contains(c) }
    require(present.nonEmpty, "no target class present in the data")
    // left-to-right IEEE arithmetic, replayed identically by the oracle:
    // n / w (long -> double), min, then (w * N) / n, clamped at 1. The
    // binding class (n/w == N) gets rate EXACTLY 1 — recomputing it as
    // (w*(n/w))/n can land one ulp under 1.0 and silently drop ~1/65536
    // of the class that the contract says is kept in full
    val bigN = present.map { case (c, w) => counts(c) / w }.min
    val rates = present.map { case (c, w) =>
      c -> (if (counts(c) / w == bigN) 1.0
            else math.min(1.0, (w * bigN) / counts(c)))
    }
    hashSampleBy(df, classCol, keyCol, rates, default = 0.0, seed)
  }

  /**
   * TOKEN-budget source mixing with EPOCH REPEATS — the Pile/LLaMA
   * mixing-table semantics [[mixtureSample]]'s document-count,
   * no-upsampling form cannot express: production mixes weight sources
   * by TOKEN share and let small high-quality sources repeat (appear
   * `k > 1` times, as distinct epochs) while the big crawl runs under
   * one epoch. Targets are relative token weights; `maxEpochs` caps
   * each class's repetition (unlisted target classes cap at
   * `defaultMaxEpochs`). The output is the LARGEST mixture achievable
   * under the caps: with per-class token mass T_c, cap R_c and weight
   * w_c, the budget is N = min_c (T_c * R_c) / w_c, and class c
   * realizes u_c = (w_c * N) / T_c epochs — floor(u_c) FULL copies
   * plus, when fractional, one PARTIAL epoch keeping the [[hashSample]]
   * md5-threshold subset at the fractional rate (token rates realized
   * by document fraction — the standard estimator; membership is
   * content-keyed, so stable across engines, partitionings, retries).
   * Each copy carries a distinct `epoch` id (0-based), and the partial
   * epoch's membership digest is salted with `seed + epoch`, so
   * different epochs of one class would sample different subsets if
   * several were partial. Binding-class arithmetic mirrors
   * [[mixtureSample]]: the class with (T_c * R_c)/w_c == N realizes
   * EXACTLY R_c (recomputing it can land one ulp under and silently
   * shave the class).
   *
   * Scale shape: one tiny per-class token aggregate (|classes| rows —
   * configuration, not data) and ONE corpus pass whose epoch expansion
   * is a narrow `sequence`+`explode` (each row emits its class's epoch
   * count — bounded by max(maxEpochs), not data) with the partial-epoch
   * filter fused in; no shuffle, no upsampling joins. Left-to-right
   * IEEE arithmetic throughout, replayed identically by the oracle.
   */
  def tokenMixtureSample(df: DataFrame, classCol: String, keyCol: String,
                         tokenCol: String, targets: Map[String, Double],
                         maxEpochs: Map[String, Double] = Map.empty,
                         defaultMaxEpochs: Double = 1.0, seed: Long = 42L,
                         epochCol: String = "epoch"): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0.0),
      "targets must be non-empty with positive weights")
    require((maxEpochs.values ++ Seq(defaultMaxEpochs)).forall(_ > 0.0),
      "epoch caps must be positive")
    require(!df.columns.contains(epochCol),
      s"output column $epochCol already exists on the input")
    val toks = df.groupBy(col(classCol).cast("string").as("c"))
      .agg(sum(col(tokenCol).cast("long")).as("t"))
      .collect().flatMap(r =>
        // a NULL class or an all-NULL token column contributes no mass
        // (such a class is excluded below like any token-less class)
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else Some(r.getString(0) -> r.getLong(1)))
      .toMap
    val present = targets.filter { case (c, _) => toks.get(c).exists(_ > 0L) }
    require(present.nonEmpty, "no target class with tokens present in the data")
    def cap(c: String): Double = maxEpochs.getOrElse(c, defaultMaxEpochs)
    val bigN = present.map { case (c, w) => (toks(c).toDouble * cap(c)) / w }.min
    // per-class plan: full epochs, fractional-epoch keep rate
    val plan = present.map { case (c, w) =>
      val u =
        if ((toks(c).toDouble * cap(c)) / w == bigN) cap(c)
        else math.min(cap(c), (w * bigN) / toks(c).toDouble)
      val full = math.floor(u).toLong
      val frac = u - full
      c -> ((full, frac))
    }
    def caseOver(f: ((Long, Double)) => org.apache.spark.sql.Column,
                 default: org.apache.spark.sql.Column) =
      plan.foldLeft(default) { case (acc, (c, p)) =>
        when(col(classCol).cast("string") === c, f(p)).otherwise(acc)
      }
    val fullC = caseOver(p => lit(p._1), lit(0L))
    val nEpochC = caseOver(p => lit(p._1 + (if (p._2 > 0.0) 1L else 0L)), lit(0L))
    val fracHexC = caseOver(p => lit(cutHex(p._2)), lit("0000"))
    // partial-epoch digest: the hashSample contract salted per epoch
    val epochDigest = substring(md5(concat(col(keyCol).cast("string"),
      lit(":"), (lit(seed) + col(epochCol)).cast("string")).cast("binary")), 1, 4)
    df.filter(col(classCol).cast("string").isin(present.keys.toSeq: _*))
      .withColumn(epochCol,
        explode(sequence(lit(0L), nEpochC - 1))) // nEpochC >= 1 for present classes
      .filter(col(epochCol) < fullC || epochDigest < fracHexC)
  }

  /**
   * Deterministic NEGATIVE sampling for contrastive training — the
   * (anchor, negative) pair generation every embedding/reranker
   * training set needs (random negatives per anchor; in-batch
   * negatives are the loader's job, CORPUS negatives are this one's).
   * For each anchor key, `k` pseudo-random corpus keys, reproducible
   * bit-for-bit across engines, partitionings, and retries — a
   * re-generated training set must pair identically.
   *
   * Mechanics: the corpus keys take a dense pseudo-random 0..N−1 index
   * (the [[withShuffleOrder]] key ordered by the DISTRIBUTED prefix
   * scan [[graft.operators.PrefixScan.runningTotal]] — no single-task
   * window, no zipWithIndex partition coupling), and candidate j of an
   * anchor is the corpus key at index md5₆₀(anchor:j:seed) mod N.
   * Self-collisions drop and the first `k` surviving candidates (in j
   * order) are kept, so a `buffer` of extra draws makes under-return
   * vanishingly rare (probability ~(k+buffer choose buffer+1) ·
   * N^-(buffer+1)); duplicates among a single anchor's negatives are
   * possible at the birthday rate k²/N — at corpus scale both are
   * noise, and determinism is the contract that matters.
   *
   * Scale shape: the index build is one shuffle-order projection + the
   * prefix scan's two passes over corpus KEYS only; candidates are
   * anchor-scale (|anchors| × (k+buffer) rows) and join the indexed
   * corpus on the dense index — AQE broadcasts the candidate side in
   * the common small-anchor-batch case. One count() action for N
   * (corpus-scale metadata, the mixtureSample counts pattern).
   */
  def negativeSamples(corpus: DataFrame, anchors: DataFrame, keyCol: String,
                      k: Int, buffer: Int = 4, seed: Long = 42L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(buffer >= 0, "buffer must be >= 0")
    val ordered = withShuffleOrder(
      corpus.select(col(keyCol)).na.drop().distinct(), keyCol, seed)
      .withColumn("__one", lit(1))
    val indexed = graft.operators.PrefixScan
      .runningTotal(ordered, "shuffle_key", "__one", "__cum")
      .select(col(keyCol).as("__neg"), (col("__cum") - 1).as("__idx"))
    val n = indexed.count() // one scalar: the modulus
    require(n >= 2, "need at least two distinct corpus keys")
    // 60-bit md5 slice: exact in a long, far past any corpus modulus
    val h = conv(substring(md5(concat_ws(":",
      col(keyCol).cast("string"), col("__j").cast("string"),
      lit(seed.toString)).cast("binary")), 1, 15), 16, 10).cast("long")
    val cand = anchors.select(col(keyCol)).na.drop().distinct()
      .withColumn("__j",
        explode(sequence(lit(0L), lit((k + buffer - 1).toLong))))
      .withColumn("__idx", h % n)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__j").asc)
    cand.join(indexed, "__idx")
      .filter(col("__neg") =!= col(keyCol))
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col(keyCol).as("anchor_id"), col("neg_rank"),
        col("__neg").as("neg_id"))
  }

  /**
   * Deterministic train/validation/test SPLIT: every row labeled with
   * the name of the digest-range its content key falls in — the
   * holdout-assignment step of a training pipeline, under the same
   * 16-bit md5 contract as [[hashSample]] (so `splits = (train, 0.8) ::
   * rest` makes the train split EQUAL `hashSample(df, key, 0.8)` row
   * for row, and membership is stable across engines, partitionings,
   * retries, and corpus growth — a document keeps its split when new
   * data arrives, the property random-number splits lack). Cut points
   * are the cumulative fractions; the LAST split takes the whole
   * remaining range, so floor-rounding can never leave a row
   * unassigned. A pure narrow projection: one scan at any scale, and
   * splitting by a join/entity key keeps every table's slice of an
   * entity in the same split (no train/test leakage through joins).
   */
  def splitByHash(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
                  seed: Long = 42L, outCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.map(_._1).distinct.size == splits.size, "split names must be unique")
    require(splits.forall(_._2 > 0.0), "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1 — every row belongs somewhere")
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists on the input")
    val d = keyDigest(keyCol, seed)
    val cuts = splits.init.map(_._1).zip(
      splits.init.scanLeft(0.0)(_ + _._2).tail) // (name, cumulative cut)
    df.withColumn(outCol,
      cuts.foldRight(lit(splits.last._1): org.apache.spark.sql.Column) {
        case ((nm, cum), acc) => when(d < lit(cutHex(cum)), lit(nm)).otherwise(acc)
      })
  }

  /**
   * Deterministic corpus SHUFFLE key — the training-order step between
   * curation and shard packing: models must not see documents in crawl
   * / ingest order (sorted corpora front-load one domain), and a random
   * order must survive retries and replays bit-for-bit. `outCol` is
   * md5(key ':' seed) with ':' + the key appended: the digest prefix is
   * an effectively random total order any engine reproduces (same md5
   * contract as [[hashSample]]), and the appended key makes the string
   * UNIQUE even across digest-prefix collisions — the precondition
   * [[graft.operators.PrefixScan.runningTotal]] places on its order
   * column, so sorting or [[graft.operators.PrefixScan.packShards]]-ing
   * by `outCol` is well-defined. A pure narrow projection: the shuffle
   * itself is whatever ONE range exchange the downstream sort/pack
   * already pays — no extra pass at any scale. A new `seed` is a fresh
   * epoch-order for free.
   */
  def withShuffleOrder(df: DataFrame, keyCol: String, seed: Long = 42L,
                       outCol: String = "shuffle_key"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists on the input")
    df.withColumn(outCol,
      concat(md5(concat(col(keyCol).cast("string"), lit(":" + seed)).cast("binary")),
        lit(":"), col(keyCol).cast("string")))
  }

  /**
   * Quality/importance-WEIGHTED sample — the reweighting step of a
   * curation pipeline (DSIR-style importance resampling, quality-score
   * thinning): each row carries its OWN keep probability in `weightCol`
   * (clamped to [0, 1]); a row keeps iff its content digest falls under
   * floor(weight * 2^16) — the per-row generalization of
   * [[hashSampleBy]]'s per-stratum thresholds, same 16-bit md5
   * contract. weight >= 1 keeps always ("zzzz" sorts above every hex
   * digest); weight <= 0 or null drops always. A pure narrow filter —
   * one scan at any scale, deterministic across engines, partitionings,
   * and retries; weights computed from features (quality score,
   * familiarity, domain priors) compose upstream in the same scan.
   */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     seed: Long = 42L): DataFrame = {
    val w = col(weightCol).cast("double")
    val thr = when(w >= 1.0, lit("zzzz"))
      .otherwise(format_string("%04x",
        floor(greatest(coalesce(w, lit(0.0)), lit(0.0)) * 65536).cast("long")))
    df.filter(keyDigest(keyCol, seed) < thr)
  }

  /** Empty relation with an explicit runtime schema (reference
   * src/apply_change_log_to_delta.py:268-269). */
  def emptyRelation(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
}
