package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines: exact, MinHash+LSH,
 * SimHash, and n-gram Jaccard.
 *
 * Scale design: every pair-finding operator avoids the O(n²) cross join —
 * candidates come from an inverted index (shared n-gram), LSH band
 * buckets, or SimHash chunk buckets, so the shuffles are keyed on
 * content-derived buckets and parallelize across the cluster. Degenerate
 * hot buckets (stop-ngrams, empty docs) are dropped by a document-frequency
 * cutoff, the classic skew guard for 100 TB corpora.
 */
object Dedup {
  import TextAnalysis.{fingerprintMd5, normalizeText}

  /** distinct, sorted token set of the normalized text. */
  def tokenSet(c: Column): Column =
    array_sort(array_distinct(split(normalizeText(c), " ")))

  /** distinct word n-grams (n=1 -> token set). */
  def ngramSet(c: Column, n: Int): Column =
    if (n <= 1) tokenSet(c)
    else {
      val toks = split(normalizeText(c), " ")
      array_sort(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
    }

  // ------------------------------------------------------------- exact

  /**
   * Exact dedup by content fingerprint: one hash-aggregate over the corpus
   * (map-side partial combine, single shuffle). Returns one row per
   * distinct content with the canonical (min) id and duplicate count.
   */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprintMd5(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** The corpus with exact duplicates removed (keep the min-id doc). */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(exact(df, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  // ----------------------------------------------------- n-gram Jaccard

  /**
   * Exact n-gram Jaccard pairs >= threshold via inverted index:
   * explode distinct n-grams, drop n-grams appearing in more than
   * `maxDocFreq` docs (stop-ngram skew guard), self-join on the n-gram to
   * count intersections, then Jaccard from |A|,|B|,|A∩B|. Shuffles are
   * keyed by n-gram then by pair — no cross join anywhere.
   */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                   threshold: Double, maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val grams = df.select(col(idCol).as("doc"), ngramSet(col(textCol), n).as("ng"))
    val sizes = grams.select(col("doc"), size(col("ng")).as("sz"))
    var tok = grams.select(col("doc"), explode(col("ng")).as("g"))
    if (maxDocFreq != Long.MaxValue) {
      val keep = tok.groupBy("g").count().filter(col("count") <= maxDocFreq).select("g")
      tok = tok.join(keep, Seq("g"), "left_semi")
    }
    val inter = tok.as("a")
      .join(tok.as("b"), col("a.g") === col("b.g") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  // ------------------------------------------------------- MinHash LSH

  /** MinHash signature: for seed i, min over shingles of xxhash64(s, i). */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /** (id, band, band_key) — one row per band for bucket joining. */
  def lshBands(df: DataFrame, idCol: String, textCol: String,
               numHashes: Int, bands: Int, n: Int = 1): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sig = minHashSignature(ngramSet(col(textCol), n), numHashes)
    df.select(col(idCol).as("doc"), sig.as("sig"))
      .select(col("doc"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          j => xxhash64(slice(col("sig"), j * lit(r) + 1, lit(r)), j))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  /**
   * MinHash+LSH near-dup pairs: shingle -> minhash -> band -> bucket join
   * -> exact-Jaccard verification. Candidate generation is a self-join on
   * (band, band_key) — documents only meet if a band collides, so work is
   * proportional to true near-duplicates, not n². `maxBucket` skips
   * degenerate buckets (all-identical boilerplate) the way production
   * dedup pipelines do.
   */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 64, bands: Int = 8,
                      n: Int = 1, maxBucket: Long = 1000): DataFrame = {
    val b = lshBands(df, idCol, textCol, numHashes, bands, n)
    val small = b.groupBy("band", "band_key").count()
      .filter(col("count") <= maxBucket).select("band", "band_key")
    val bb = b.join(small, Seq("band", "band_key"), "left_semi")
    val candidates = bb.as("x")
      .join(bb.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct()
    val grams = df.select(col(idCol).as("doc"), ngramSet(col(textCol), n).as("ng"))
    candidates
      .join(grams.select(col("doc").as("doc_a"), col("ng").as("ng_a")), "doc_a")
      .join(grams.select(col("doc").as("doc_b"), col("ng").as("ng_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("ng_a"), col("ng_b"))).cast("double") /
          size(array_union(col("ng_a"), col("ng_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  // ----------------------------------------------------------- SimHash

  /**
   * 64-bit SimHash per document: explode tokens, xxhash64 each, sum ±1 per
   * bit position, sign -> bit. One shuffle keyed by doc id with map-side
   * partial aggregation; the 64 per-bit sums are static codegen'd columns.
   */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc"),
        explode(tokenSet(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = tok.groupBy("doc").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col("doc"), sh.as("simhash"))
  }

  /**
   * SimHash near-dup pairs with Hamming distance <= maxHamming, banding on
   * the four 16-bit chunks: by pigeonhole, any pair within Hamming 3 (< 4
   * chunks) shares at least one exact chunk, so candidates come from four
   * bucket joins instead of a cross join.
   */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "chunk banding guarantees recall only for hamming <= 3")
    val sh = simHash(df, idCol, textCol)
    val chunked = sh.select(col("doc"), col("simhash"), posexplode(
      array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFF)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    chunked.as("x")
      .join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
