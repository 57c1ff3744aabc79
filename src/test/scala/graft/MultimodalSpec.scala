package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal binary-column operators on the synthetic corpus. */
class MultimodalSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val withBin = docs.select(col("doc_id"), col("text"),
    Multimodal.syntheticPayload(col("doc_id"), col("text")).as("bin"))

  test("keyframes keep exactly the run starts of consecutive equal chunks") {
    import spark.implicits._
    // two blobs: runs AABBBA (starts at idx 0,2,5) and CCCC (start at 0)
    val chunks = Seq(
      (1L, 0L, "A"), (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "B"),
      (1L, 4L, "B"), (1L, 5L, "A"),
      (2L, 0L, "C"), (2L, 1L, "C"), (2L, 2L, "C"), (2L, 3L, "C"))
      .toDF("doc_id", "chunk_idx", "chunk_fp")
    val got = Multimodal.keyframes(chunks, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (1L, 2L), (1L, 5L), (2L, 0L)))
    // end-to-end over real chunk fingerprints: a repeated 64-byte period
    // collapses interior chunks, and every blob keeps its first chunk
    val pay = Multimodal.syntheticPayload(col("doc_id"),
      repeat(rpad(substring(col("text"), 1, 60), 64, "x"), 4))
    val all = Multimodal.chunkFingerprints(docs, "doc_id", pay, chunkSize = 64)
    val kept = Multimodal.keyframes(all, "doc_id")
    assert(kept.count() < all.count())
    assert(kept.filter(col("chunk_idx") === 0).count() == docs.count())
  }

  test("cdcChunks: boundaries realign after an insertion; grid chunks do not") {
    val base = docs.limit(40).select(col("doc_id"),
      col("text").cast("binary").as("pay"))
    // three bytes inserted at the front — every fixed-grid chunk shifts
    val edited = docs.limit(40).select(col("doc_id"),
      concat(lit("INS").cast("binary"), col("text").cast("binary")).as("pay"))
    def fps(df: org.apache.spark.sql.DataFrame,
            chunker: (org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)) =
      chunker(df).select("doc_id", "chunk_fp").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val cdcA = fps(base, d => Multimodal.cdcChunks(d, "doc_id", col("pay"), 8, 16))
    val cdcB = fps(edited, d => Multimodal.cdcChunks(d, "doc_id", col("pay"), 8, 16))
    val gridA = fps(base, d => Multimodal.chunkFingerprints(d, "doc_id", col("pay"), 16))
    val gridB = fps(edited, d => Multimodal.chunkFingerprints(d, "doc_id", col("pay"), 16))
    val cdcShared = (cdcA intersect cdcB).size.toDouble / cdcA.size
    val gridShared = (gridA intersect gridB).size.toDouble / gridA.size
    // content-defined boundaries survive the shift; the fixed grid loses
    // (nearly) everything downstream of the edit
    assert(cdcShared > 0.5, s"cdc kept only $cdcShared")
    assert(gridShared < 0.2, s"grid unexpectedly kept $gridShared")
    assert(cdcShared > gridShared)
    // chunks partition the payload exactly: per-doc byte sums match
    val sums = Multimodal.cdcChunks(base, "doc_id", col("pay"), 8, 16)
      .groupBy("doc_id").agg(sum("n_bytes").as("n"))
      .join(base.select(col("doc_id"), length(col("pay")).cast("long").as("l")),
        Seq("doc_id"))
    assert(sums.filter(col("n") =!= col("l")).count() == 0)
    // a blob past the bound fails LOUDLY instead of building a same-order
    // in-row index array (no silent drop) — pin the INTENDED error, not
    // just any exception
    val boom = intercept[Exception] {
      Multimodal.cdcChunks(base, "doc_id", col("pay"), 8, 16, maxBytes = 64)
        .count()
    }
    val messages = Iterator.iterate(boom: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(messages.contains("cdcChunks: blob over"), messages)
    // a null payload stays a silent drop, never a crash
    val withNull = base.unionByName(
      spark.range(1).select(lit(-1L).as("doc_id"),
        lit(null).cast("binary").as("pay")))
    assert(Multimodal.cdcChunks(withNull, "doc_id", col("pay"), 8, 16)
      .filter(col("doc_id") === -1L).isEmpty)
  }

  test("cdcChunksStreamed: byte-identical to the expression form on shared fixtures") {
    val base = docs.limit(60).select(col("doc_id"),
      col("text").cast("binary").as("pay"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    val expr = rows(Multimodal.cdcChunks(base, "doc_id", col("pay"), 8, 16))
    val strm = rows(Multimodal.cdcChunksStreamed(base, "doc_id", col("pay"), 8, 16))
    assert(strm == expr, "the two forms must agree on every chunk: " +
      s"only-expr=${(expr -- strm).take(3)} only-strm=${(strm -- expr).take(3)}")
    // schema parity too (a d20 swap must not flip the oracle hash)
    assert(Multimodal.cdcChunksStreamed(base, "doc_id", col("pay"), 8, 16)
      .columns.toSeq ==
      Multimodal.cdcChunks(base, "doc_id", col("pay"), 8, 16).columns.toSeq)
    // blobs SHORTER than one window: single whole-blob chunk, both forms
    import spark.implicits._
    val tiny = Seq((7L, "abc")).toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("binary").as("pay"))
    assert(rows(Multimodal.cdcChunksStreamed(tiny, "doc_id", col("pay"), 8, 16)) ==
      rows(Multimodal.cdcChunks(tiny, "doc_id", col("pay"), 8, 16)))
    // null payloads stay a silent drop
    val withNull = base.unionByName(
      spark.range(1).select(lit(-1L).as("doc_id"),
        lit(null).cast("binary").as("pay")))
    assert(Multimodal.cdcChunksStreamed(withNull, "doc_id", col("pay"), 8, 16)
      .filter(col("doc_id") === -1L).isEmpty)
  }

  test("cdcChunksStreamed: equality holds on RAW bytes and non-BMP strings") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    // arbitrary NON-UTF8 bytes (md5 output re-encoded as raw binary): a
    // lossy string decode would replace invalid sequences and count
    // UTF-16 units, shifting every window position, boundary, n_bytes
    // and fingerprint — the operator's stated domain is exactly these
    // opaque re-encoded payloads
    val raw = docs.limit(40).select(col("doc_id"),
      unhex(concat((1 to 8).map(i =>
        md5(concat(col("text"), lit(i.toString)))): _*)).as("pay"))
    assert(raw.schema("pay").dataType.typeName == "binary")
    val exprB = rows(Multimodal.cdcChunks(raw, "doc_id", col("pay"), 8, 16))
    val strmB = rows(Multimodal.cdcChunksStreamed(raw, "doc_id", col("pay"), 8, 16))
    assert(strmB == exprB, "binary payloads must chunk over raw bytes: " +
      s"only-expr=${(exprB -- strmB).take(3)} only-strm=${(strmB -- exprB).take(3)}")
    // per-doc n_bytes sums equal the BYTE length (128 = 8 md5s × 16)
    assert(Multimodal.cdcChunksStreamed(raw, "doc_id", col("pay"), 8, 16)
      .groupBy("doc_id").agg(sum("n_bytes").as("n"))
      .filter(col("n") =!= 128L).count() == 0)
    // STRING payload with non-BMP chars: Spark's length/substr count
    // CODE POINTS; Java String.length counts UTF-16 units (an emoji is
    // two) — the streamed walk must agree with the expression form
    import spark.implicits._
    val emoji = Seq((1L, ("a😀b🍕" * 40) + "tail"),
      (2L, "😀" * 25)).toDF("doc_id", "pay")
    val exprS = rows(Multimodal.cdcChunks(emoji, "doc_id", col("pay"), 8, 16))
    val strmS = rows(Multimodal.cdcChunksStreamed(emoji, "doc_id", col("pay"), 8, 16))
    assert(strmS == exprS, "string payloads must chunk over code points: " +
      s"only-expr=${(exprS -- strmS).take(3)} only-strm=${(strmS -- exprS).take(3)}")
  }

  test("cdcChunksStreamed: a blob past the expression form's bound chunks fine") {
    import spark.implicits._
    // ~1 MiB of periodic-but-not-trivial content — far past a maxBytes
    // the expression form would refuse, processed in one streaming pass
    val big = spark.range(1).select(lit(1L).as("doc_id"),
      repeat(concat(lit("payload-"), md5(lit("seed")), lit("|")), 25000)
        .cast("binary").as("pay"))
    intercept[Exception] {
      Multimodal.cdcChunks(big, "doc_id", col("pay"), 8, 16, maxBytes = 1 << 16)
        .count()
    }
    val chunks = Multimodal.cdcChunksStreamed(big, "doc_id", col("pay"), 8, 16)
    val agg = chunks.agg(sum("n_bytes"), count(lit(1))).head()
    val total = big.select(length(col("pay").cast("string"))).head().getInt(0)
    assert(agg.getLong(0) == total.toLong,
      "chunks must partition the payload exactly")
    // avg chunk ≈ divisor: the cut rule really fired throughout the blob
    assert(agg.getLong(1) > total / 64,
      s"expected dense cuts, got ${agg.getLong(1)} chunks over $total bytes")
  }

  test("payload is BinaryType; sniffFormat follows the magic bytes") {
    assert(withBin.schema("bin").dataType.typeName == "binary")
    val got = withBin.select(col("doc_id"),
      Multimodal.sniffFormat(col("bin")).as("f")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val expect = Seq("png", "jpg", "gif")((r.getLong(0) % 3).toInt)
      assert(r.getString(1) == expect)
    }
    // unknown magic -> "bin"
    val unknown = docs.select(
      Multimodal.sniffFormat(concat(lit("XXXX"), col("text")).cast("binary")).as("f"))
      .distinct().collect().map(_.getString(0)).toSeq
    assert(unknown == Seq("bin"))
  }

  test("byteLength is bytes: ASCII corpus -> n_chars + 4 magic bytes") {
    val bad = withBin
      .select(Multimodal.byteLength(col("bin")).as("n"), length(col("text")).as("c"))
      .filter(col("n") =!= col("c") + 4)
    assert(bad.count() == 0)
  }

  test("binaryDedup partitions the corpus") {
    val d = Multimodal.binaryDedup(withBin, "doc_id", "bin")
    assert(d.agg(sum("dup_count")).head.getLong(0) == docs.count())
    assert(d.select("fingerprint").distinct().count() == d.count())
  }

  test("chunkFingerprints: ceil(len/64) chunks per doc, md5 verified") {
    val chunks = Multimodal.chunkFingerprints(docs, "doc_id",
      Multimodal.syntheticPayload(col("doc_id"), col("text")), chunkSize = 64)
    val perDoc = chunks.groupBy("doc_id").count()
      .join(withBin.select(col("doc_id"), Multimodal.byteLength(col("bin")).as("n")),
        "doc_id")
      .filter(col("count") =!= ceil(col("n") / 64.0).cast("long"))
    assert(perDoc.count() == 0)
    // spot-check chunk 0 of one doc against a direct JVM md5
    val row = withBin.orderBy("doc_id").limit(1)
      .select(col("doc_id"), col("bin")).head
    val payload = new String(row.getAs[Array[Byte]](1),
      java.nio.charset.StandardCharsets.UTF_8)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(payload.take(64).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = chunks.filter(col("doc_id") === row.getLong(0) && col("chunk_idx") === 0)
      .head.getString(2)
    assert(got == expect)
  }

  test("sampleChunks keeps exactly every k-th chunk") {
    val chunks = Multimodal.chunkFingerprints(docs, "doc_id",
      Multimodal.syntheticPayload(col("doc_id"), col("text")), chunkSize = 64)
    val s = Multimodal.sampleChunks(chunks, every = 4)
    assert(s.filter(col("chunk_idx") % 4 =!= 0).count() == 0)
    assert(s.count() == chunks.filter(col("chunk_idx") % 4 === 0).count())
  }

  test("chunk-set near-dup: shared-prefix blobs pair at the expected jaccard") {
    import spark.implicits._
    import graft.operators.Dedup
    // three 256-byte blobs of 64-byte chunks: A and B share chunks 1-3,
    // but the grain is the DISTINCT fingerprint set, so
    // jaccard = |{x} ∩ {x}| / |{x,1,2}| = 1/3; C shares nothing
    val block = "x" * 64
    val tail1 = "1" * 64
    val tail2 = "2" * 64
    val a = block * 3 + tail1         // chunks {x,x,x,1} -> set {x, 1}
    val b = block * 3 + tail2         // set {x, 2}
    val c = "z" * 256                 // set {z}
    val d = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "payload")
    val chunks = Multimodal.chunkFingerprints(d, "doc_id",
        col("payload").cast("binary"), chunkSize = 64)
      .select(col("doc_id"), col("chunk_fp")).distinct()
    val got = Dedup.fingerprintSetPairs(chunks, "doc_id", "chunk_fp",
        threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // |{x,1} ∩ {x,2}| = 1, union = 3 -> jaccard 0.3333
    assert(got == Map((1L, 2L) -> 0.3333))
  }

  test("decodeMetaStub: deterministic, format/bytes agree with expressions") {
    val a = Multimodal.decodeMetaStub(withBin, "doc_id", "bin").collect()
      .sortBy(_.id)
    val b = Multimodal.decodeMetaStub(withBin, "doc_id", "bin").collect()
      .sortBy(_.id)
    assert(a.toSeq == b.toSeq) // the stub is deterministic
    assert(a.nonEmpty)
    val viaExpr = withBin.select(col("doc_id"),
        Multimodal.sniffFormat(col("bin")).as("f"),
        Multimodal.byteLength(col("bin")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    a.foreach { m =>
      val (f, n) = viaExpr(m.id)
      assert(m.format == f && m.nBytes == n)
      assert(m.width >= 64 && m.width < 192 && m.height >= 64 && m.height < 192)
    }
  }

  test("perceptualHash: hand-computed bits; identical payloads at hamming 0") {
    import spark.implicits._
    // 64-char payload: sampled position j is exactly character j. First
    // 32 chars 'z' (above mean), last 32 'a' (below) -> h1 all-ones in
    // 32 bits, h2 zero. A copy pairs at hamming 0; flipping ONE sampled
    // char flips exactly one bit (hamming 1).
    val base = "z" * 32 + "a" * 32
    val flipped = "z" * 31 + "a" * 33 // char 31 drops below the mean
    val df = Seq((1L, base), (2L, base), (3L, flipped)).toDF("doc_id", "pay")
    val h = Multimodal.perceptualHash(df, "doc_id", col("pay"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(h(1L) == ((0xFFFFFFFFL, 0L)))
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L)._1 ^ h(3L)._1) +
      java.lang.Long.bitCount(h(1L)._2 ^ h(3L)._2) == 1)
    val pairs = Multimodal.perceptualPairs(df, "doc_id", col("pay"),
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    graft.operators.Materialize.releaseAll()
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
    // the banding bound is enforced, not silently ignored
    assertThrows[IllegalArgumentException] {
      Multimodal.perceptualPairs(df, "doc_id", col("pay"), maxHamming = 9)
    }
  }

  test("energySegments: hand-computed frames, silence splits, partial tail") {
    import spark.implicits._
    def segs(s: String, frameLen: Int, min: Long): Seq[(Long, Long, Long)] =
      Multimodal.energySegments(Seq((1L, s)).toDF("doc_id", "samples"),
          "doc_id", col("samples"), frameLen, min)
        .orderBy("seg_start")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // 'A' = 65 -> |65-32| = 33 per sample; 2-sample frames score 66
    assert(segs("AAAA", 2, 50L) == Seq((0L, 1L, 2L)))
    // a silent middle frame splits the run: AA|..|AA -> two segments
    assert(segs("AA  AA", 2, 50L) == Seq((0L, 0L, 1L), (2L, 2L, 1L)))
    // the partial tail frame scores its own (shorter) sum: "AAA" ->
    // frames 66, 33 — threshold between them keeps only the full frame
    assert(segs("AAA", 2, 34L) == Seq((0L, 0L, 1L)))
    assert(segs("AAA", 2, 33L) == Seq((0L, 1L, 2L)))
    // all-silence and empty streams yield no segments
    assert(segs("      ", 2, 1L).isEmpty)
    assert(segs("", 2, 1L).isEmpty)
  }
}
