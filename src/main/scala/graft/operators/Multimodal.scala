package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Typed metadata a (stubbed) media decoder emits per blob. */
final case class MediaMeta(id: Long, format: String, width: Int, height: Int,
                           nBytes: Long)

/**
 * Multimodal-column operators: image/audio/video payloads are opaque
 * `binary` columns with typed metadata alongside. Everything that does NOT
 * require a codec — format sniffing from magic bytes, byte length, content
 * fingerprints, chunk-level fingerprints for sub-file dedup, frame/chunk
 * sampling — is a pure column expression over the binary column (narrow,
 * codegen'd, scan-speed at 100 TB). The codec step itself
 * ([[decodeMetaStub]]) is a partition-batched typed operator whose decode
 * body is STUBBED (no image/audio libraries in this environment) behind
 * real Spark plumbing: schema, encoder, and one-pass partition iteration
 * are production-shaped; only the bytes->pixels call is fake.
 */
object Multimodal {

  /** Known magic prefixes -> format tag. Real containers use the same
   * mechanism with their true magic bytes (\x89PNG, \xFF\xD8\xFF, RIFF…);
   * the synthetic corpus uses 4-byte ASCII magics so the external oracle
   * engine can build identical payloads. */
  val Magics: Seq[(String, String)] = Seq("PNG|" -> "png", "JPG|" -> "jpg",
    "GIF|" -> "gif")

  /**
   * Deterministic synthetic media payload for a text corpus: a 4-byte
   * magic (by id mod 3) + the document bytes, as one binary column. Stands
   * in for reading real blobs (`spark.read.format("binaryFile")` or a
   * binary parquet column) so every operator below runs on real
   * BinaryType data. The magic travels as RAW BYTES (binary concat) — a
   * string concat would UTF-8-encode a non-ASCII magic like PNG's 0x89
   * into two bytes and never match the sniffers.
   */
  def syntheticPayload(idCol: Column, textCol: Column): Column =
    concat(element_at(array(MagicBytes.map(m => lit(m._1)): _*),
      pmod(idCol, lit(3)).cast("int") + 1), textCol.cast("binary"))

  /** Magic prefixes as raw bytes (ISO-8859-1 maps each char to one byte,
   * so real magics like "PNG" -> 0x89 0x50 0x4E 0x47 survive). */
  private val MagicBytes: Seq[(Array[Byte], String)] =
    Magics.map { case (m, f) =>
      m.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) -> f
    }

  /** Format sniffed from the leading magic bytes (codec-free metadata).
   * Binary-to-binary comparison — decoding the head as UTF-8 would mangle
   * non-ASCII magic bytes (0x89 of a real PNG becomes U+FFFD). */
  def sniffFormat(bin: Column): Column =
    MagicBytes.foldRight(lit("bin"): Column) { case ((magic, fmt), acc) =>
      when(substring(bin, 1, magic.length) === lit(magic), lit(fmt)).otherwise(acc)
    }

  /** Payload size in bytes (BinaryType length is bytes, not chars). */
  def byteLength(bin: Column): Column = length(bin).cast("long")

  /** Content fingerprint of the raw bytes. */
  def fingerprint(bin: Column): Column = md5(bin)

  /** Exact binary dedup: one hash aggregate over blob fingerprints —
   * the binary twin of [[Dedup.exact]]. */
  def binaryDedup(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(binCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** (id, chunk_idx, chunk_fp): fixed-size chunk fingerprints for
   * sub-file dedup / rolling-window comparison. One narrow explode — rows
   * out = bytes/chunkSize, each chunk hashed independently, so a 100 TB
   * blob store chunks at scan speed with no shuffle. */
  def chunkFingerprints(df: DataFrame, idCol: String, payload: Column,
                        chunkSize: Int): DataFrame = {
    // NO spread here: chunk md5 is cheap per payload byte (sequential
    // hashing), so the round-robin exchange of the whole payload costs
    // more than the added parallelism buys — measured net-negative on
    // m03/m04 in r21/r22 (callers that need the fan, e.g. m05's probe
    // build, spread BEFORE calling and the guard no-ops here)
    df.select(col(idCol), payload.as("pay"))
      // zero-length payloads have no chunks (sequence(0,-1) would emit a
      // bogus descending [0,-1] pair)
      .filter(length(col("pay")) > 0)
      .select(col(idCol), col("pay"),
        explode(sequence(lit(0L),
          floor((length(col("pay")).cast("long") - 1) / chunkSize).cast("long")))
          .as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        md5(col("pay").substr(col("chunk_idx") * chunkSize + 1, lit(chunkSize))
          .cast("binary")).as("chunk_fp"))
  }

  /** Every k-th chunk — the frame-sampling shape (decode only a strided
   * subset of frames/chunks). A pure filter on the chunk index. */
  def sampleChunks(chunks: DataFrame, every: Int): DataFrame =
    chunks.filter(pmod(col("chunk_idx"), lit(every)) === 0)

  /**
   * Energy-based segmentation — the VAD (voice-activity-detection)
   * shape of an audio curation pipeline: frame the sample stream, score
   * each frame's energy, keep frames above a threshold, and merge
   * maximal runs of kept frames into segments (speech between
   * silences; the same machinery segments any activity signal). Real
   * PCM decode is this environment's documented stub boundary, so the
   * operator takes the DECODED sample stream as a string of 8-bit
   * samples (the synthetic-payload form — all plumbing real): frame f
   * covers samples [f·W+1, f·W+W], its energy is the exact integer sum
   * of |sample − 32| (space = rest level in the ASCII stand-in), and a
   * frame is VOICED when energy ≥ `minEnergy`. Output: one row per
   * maximal voiced run — (id, seg_start, seg_end, n_frames), 0-based
   * inclusive frame indices, ordered by construction of the caller's
   * sort.
   *
   * Scale shape: one narrow explode to frame rows with the energy
   * folded IN-ROW (`aggregate` over the frame's samples — no
   * per-sample rows ever exist), then the gaps-and-islands merge: one
   * window + one aggregate PARTITIONED BY BLOB ID — per-blob work is
   * bounded by the blob's own frame count, never a global window. The
   * d12 span-merge discipline at media grain; exact integers, so any
   * engine replays every segment.
   */
  def energySegments(df: DataFrame, idCol: String, samples: Column,
                     frameLen: Int, minEnergy: Long): DataFrame = {
    require(frameLen >= 1, "frameLen must be >= 1")
    require(minEnergy >= 0, "minEnergy must be >= 0")
    // per-sample energies in ONE O(n) pass over the payload (split to
    // chars + transform), per-frame energies as one in-row array fold
    // over SLICES of that array, then posexplode to frame rows — so a
    // blob's samples are scanned exactly once. The previous form
    // exploded to frame rows first and folded substr(off+j, 1) per
    // sample: substr counts code points from the string START, so a
    // row's frames cost O(n^2) character scans overall (m08 spent ~3 s
    // of its bench time there; values identical — ascii of the one
    // char either way, same frame grid, last partial frame via slice's
    // natural truncation).
    val energies = transform(split(col("__s"), ""),
      c => abs(ascii(c) - 32).cast("long"))
    val frameEnergies = transform(
      sequence(lit(0L), floor((col("__n") - 1) / frameLen).cast("long")),
      f => aggregate(
        slice(col("__ea"), (f * frameLen + 1).cast("int"), lit(frameLen)),
        lit(0L), (acc, e) => acc + e))
    val voiced = TextAnalysis.spreadAcrossCores(df)
      .select(col(idCol), samples.as("__s"),
        length(samples).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__ea", energies)
      .select(col(idCol), posexplode(frameEnergies))
      .select(col(idCol), col("pos").cast("long").as("frame_idx"),
        col("col").as("__e"))
      .filter(col("__e") >= minEnergy)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("frame_idx"))
    voiced
      .withColumn("__g", col("frame_idx") - row_number().over(w))
      .groupBy(col(idCol), col("__g"))
      .agg(min("frame_idx").as("seg_start"), max("frame_idx").as("seg_end"),
        count(lit(1)).as("n_frames"))
      .drop("__g")
  }

  /**
   * Content-defined chunking (the rsync/LBFS cut rule): a chunk boundary
   * falls after byte i exactly when the rolling window of `w` bytes
   * ending at i hashes to 0 mod `divisor` — so boundaries depend only on
   * LOCAL content, and a byte inserted near the front of a blob shifts
   * every [[chunkFingerprints]] fixed chunk but realigns here after one
   * window: sub-file dedup across near-identical blobs (re-encoded
   * uploads, appended logs) survives insertion where fixed-grid chunking
   * loses everything downstream of the edit. Average chunk length ≈
   * `divisor` bytes; the final partial chunk is always emitted.
   *
   * The window hash is the first-16-md5-bit integer of the raw window
   * bytes — not a true rolling hash (the environment's engines both
   * evaluate md5 natively; a Rabin polynomial would be faster per byte
   * on a real deployment but not externally replayable), and the whole
   * operator is per-row column expressions: zero shuffle, chunks at scan
   * speed, O(bytes) digests per blob. Output mirrors
   * [[chunkFingerprints]] (+ `n_bytes`), so [[keyframes]] and
   * [[graft.operators.Dedup.fingerprintSetPairs]] consume it unchanged.
   */
  def cdcChunks(df: DataFrame, idCol: String, payload: Column, w: Int,
                divisor: Int, maxBytes: Int = 4 << 20): DataFrame = {
    require(w >= 2, "a 1-byte window makes boundaries byte-frequency noise")
    require(divisor >= 2, "divisor < 2 cuts at every byte")
    require(maxBytes >= w, "maxBytes smaller than one window")
    val pay = col("__pay")
    def hex16(b: Column) =
      conv(substring(md5(b), 1, 4), 16, 10).cast("long")
    // window END positions that satisfy the cut rule (none for blobs
    // shorter than one window — sequence() would run DESCENDING there)
    val cuts = when(length(pay) >= w,
      filter(sequence(lit(w), length(pay)), i =>
        hex16(pay.substr(i - w + 1, lit(w))) % divisor === 0))
      .otherwise(array().cast("array<int>"))
    // every chunk's end: the cut positions plus the blob end (distinct —
    // the last byte may itself be a cut). BOUND once through a
    // single-element-array lambda: lambdas are interpreted (no
    // subexpression elimination), so splicing `ends` into each per-chunk
    // element_at would re-run the whole O(bytes)-digest cut scan per
    // chunk — O(bytes * chunks) instead of O(bytes)
    val ends = array_distinct(concat(cuts, array(length(pay))))
    val chunks = element_at(transform(array(ends), es =>
      transform(sequence(lit(0), size(es) - 1), j => {
        val start = when(j === 0, lit(1)).otherwise(element_at(es, j) + 1)
        val len = element_at(es, j + 1) - start + 1
        struct(j.cast("long").as("chunk_idx"),
          md5(pay.substr(start, len)).as("chunk_fp"),
          len.cast("long").as("n_bytes"))
      })), 1)
    df.select(col(idCol), payload.as("__pay"))
      .filter(length(pay) > 0)
      // the per-position index array lives in ONE row's evaluation — a
      // multi-GB blob would materialize a same-order boxed array inside
      // the interpreted lambda. FAIL LOUDLY past the bound rather than
      // OOM an executor (no silent drop); blobs beyond it belong to
      // [[cdcChunksStreamed]] (same cut rule as one streaming pass,
      // row-at-a-time memory, equality spec-pinned). assert_true
      // inside a filter —
      // an unused projected column would be PRUNED and never fire
      // null-safe: CombineFilters merges this with the length>0 filter,
      // and a NULL length would otherwise reach assert_true (three-valued
      // And evaluates the right conjunct when the left is NULL) — a null
      // payload must stay a silent drop, not a crash
      .filter(assert_true(coalesce(length(pay) <= maxBytes, lit(true)),
        concat(lit(s"cdcChunks: blob over $maxBytes bytes ("), length(pay),
          lit(") — use cdcChunksStreamed"))).isNull)
      .select(col(idCol), explode(chunks).as("__c"))
      .select(col(idCol), col("__c.chunk_idx"), col("__c.chunk_fp"),
        col("__c.n_bytes"))
  }

  /**
   * [[cdcChunks]] as ONE STREAMING PASS per blob — the same LBFS cut
   * rule (window md5's first 16 bits ≡ 0 mod `divisor`, final partial
   * chunk emitted) with row-at-a-time memory: a typed `mapPartitions`
   * walks each payload once, keeping only the live window and the cut
   * list, so a blob costs its own length — no per-position array, no
   * interpreted-lambda boxing, no `maxBytes` refusal. This is the
   * at-scale form (the [[graft.operators.TextAnalysis]] winnowing
   * precedent: expression twin for external replayability, partition-
   * iterator twin for the hot path); boundaries and output are pinned
   * EQUAL to [[cdcChunks]] on shared fixtures, and the expression form
   * remains the oracle-replayable spelling of the rule.
   *
   * mapPartitions is justified here the same way as the BPE encoder
   * and the prefix-scan fold: the per-row computation is an inherently
   * sequential O(bytes) scan whose expression spelling materializes
   * O(bytes) arrays inside a single row's evaluation — the engine can
   * parallelize across rows either way, and this form frees it from
   * holding a row's worth of positions at once.
   *
   * Equality holds PER PAYLOAD TYPE, because the expression form's own
   * semantics are type-dependent: on BINARY payloads (the operator's
   * stated domain) `length`/`substr` are raw byte offsets and `md5`
   * digests the byte slice, so this form walks the byte array directly
   * — no string decode anywhere (a UTF-8 cast would mangle arbitrary
   * bytes into replacement chars and count UTF-16 units, silently
   * shifting every boundary). On STRING payloads `length`/`substr`
   * count CODE POINTS and `md5` digests the slice's UTF-8 bytes, so
   * this form walks a code-point array (Java `String.length`/`substring`
   * count UTF-16 units and would diverge on any non-BMP char). Other
   * payload types cast to string first, exactly as the expression form
   * would need.
   */
  def cdcChunksStreamed(df: DataFrame, idCol: String, payload: Column,
                        w: Int, divisor: Int): DataFrame = {
    require(w >= 2, "a 1-byte window makes boundaries byte-frequency noise")
    require(divisor >= 2, "divisor < 2 cuts at every byte")
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
    val typed = df.select(col(idCol), payload.as("__pay"))
    val isBinary = typed.schema(1).dataType == BinaryType
    val in =
      (if (isBinary) typed
       else df.select(col(idCol), payload.cast("string").as("__pay")))
        .filter(col("__pay").isNotNull && length(col("__pay")) > 0)
    val idField = in.schema.head
    val outSchema = StructType(Seq(idField,
      StructField("chunk_idx", LongType, nullable = false),
      StructField("chunk_fp", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false)))
    val out = in.rdd.mapPartitions { it =>
      // Charset is not Serializable — resolve the static inside the task
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      val digest = java.security.MessageDigest.getInstance("MD5")
      val hexChars = "0123456789abcdef".toCharArray
      def hex(bs: Array[Byte]): String = {
        val sb = new java.lang.StringBuilder(bs.length * 2)
        bs.foreach { b =>
          sb.append(hexChars((b >> 4) & 0xf)); sb.append(hexChars(b & 0xf))
        }
        sb.toString
      }
      it.flatMap { row =>
        val id = row.get(0)
        // (unit count, md5 of units [a, b)) in the payload type's own
        // unit: raw BYTES for binary, CODE POINTS (digested as their
        // UTF-8 bytes, matching Spark's md5-of-string) for strings
        val (n, md5Of): (Int, (Int, Int) => Array[Byte]) =
          if (isBinary) {
            val bytes = row.getAs[Array[Byte]](1)
            (bytes.length, (a: Int, b: Int) => {
              digest.reset(); digest.update(bytes, a, b - a); digest.digest()
            })
          } else {
            val cps = row.getString(1).codePoints().toArray
            (cps.length, (a: Int, b: Int) => {
              digest.reset()
              digest.digest(new String(cps, a, b - a).getBytes(utf8))
            })
          }
        // cut ENDS: 1-based positions i where the window of w units
        // ending at i satisfies the rule — same positions the expression
        // form's substr walks
        val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = w
        while (i <= n) {
          val h = md5Of(i - w, i)
          val h16 = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
          if (h16 % divisor == 0) ends += i
          i += 1
        }
        if (ends.isEmpty || ends.last != n) ends += n
        var prev = 0
        ends.iterator.zipWithIndex.map { case (e, j) =>
          val fp = hex(md5Of(prev, e))
          val r = org.apache.spark.sql.Row(id, j.toLong, fp, (e - prev).toLong)
          prev = e
          r
        }
      }
    }
    df.sparkSession.createDataFrame(out, outSchema)
  }

  /**
   * Keyframe extraction / temporal chunk dedup: keep each chunk whose
   * fingerprint DIFFERS from the immediately preceding chunk of the same
   * blob — the codec-free shape of video scene-change detection (a still
   * scene encodes as a run of near-identical frames; only the first of
   * each run is worth decoding or embedding) and of rsync-style
   * sub-file delta storage (store a run once). Input is
   * [[chunkFingerprints]]'s (id, chunk_idx, chunk_fp) layout.
   *
   * Scale shape: one shuffle by blob id, then a per-blob ordered `lag`
   * — chunk counts are payload/chunkSize so partitions stay bounded by
   * the largest single blob, not the corpus; there is no corpus-wide
   * window. The run-START choice (not min-per-run) is what makes the
   * operator streamable: each chunk needs only its predecessor, so the
   * same predicate runs incrementally over an append-only chunk log.
   */
  def keyframes(chunks: DataFrame, idCol: String,
                idxCol: String = "chunk_idx",
                fpCol: String = "chunk_fp"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col(idxCol))
    chunks.withColumn("__prev", lag(col(fpCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(fpCol))
      .drop("__prev")
  }

  /**
   * Perceptual (average-hash) fingerprint of a payload — the aHash
   * discipline (downsample → mean-threshold → bit string) applied to an
   * opaque blob: 64 byte positions sampled evenly across the payload
   * (`pos_j = (j * (len-1)) div 63`), bit j set iff sample j >= the
   * mean of the 64 samples (compared as `64*sample >= sum` — exact
   * integer arithmetic, no float threshold). Unlike the EXACT chunk
   * fingerprints of [[chunkFingerprints]], small local edits flip a few
   * bits instead of whole chunks, so near-duplicates sit at small
   * Hamming distance — the property the pHash family buys for images.
   * Emitted as two 32-bit words (`h1` low, `h2` high — the d03
   * portable-simhash shape) so an external SQL engine replays the hash
   * in plain integer arithmetic.
   *
   * Codec note: samples are read through the payload cast to string
   * (`ascii` of each sampled character), which equals the byte value
   * for the ASCII-range synthetic payloads this environment builds; a
   * real image pipeline replaces the sampler with decoded luma pixels —
   * the thresholding, packing, and pairing machinery is the production
   * part. Payloads must be non-empty.
   */
  def perceptualHash(df: DataFrame, idCol: String, payload: Column): DataFrame =
    // the 64-point downsample + two 32-term folds are heavy per-row
    // expressions — spread a one-file corpus first (no-op at real scale)
    TextAnalysis.spreadAcrossCores(df)
      .select(col(idCol).as("doc"), payload.cast("string").as("ps"))
      .filter(length(col("ps")) > 0)
      .withColumn("n", length(col("ps")).cast("long"))
      .withColumn("cs", expr(
        "transform(sequence(0, 63), j -> cast(ascii(substring(" +
          "ps, cast((j * (n - 1)) div 63 as int) + 1, 1)) as long))"))
      .withColumn("tot", expr("aggregate(cs, 0L, (a, x) -> a + x)"))
      .withColumn("h1", expr("aggregate(sequence(0, 31), 0L, " +
        "(a, j) -> a + if(64 * cs[j] >= tot, shiftleft(1L, j), 0L))"))
      .withColumn("h2", expr("aggregate(sequence(32, 63), 0L, " +
        "(a, j) -> a + if(64 * cs[j] >= tot, shiftleft(1L, j - 32), 0L))"))
      .select(col("doc"), col("h1"), col("h2"))

  /**
   * Perceptual near-duplicate pairs at Hamming distance <= `maxHamming`
   * over the 64-bit [[perceptualHash]] — the d03 chunk-banding
   * discipline: split each hash into four 16-bit chunks; by pigeonhole
   * any pair within Hamming 3 shares at least one chunk, so candidates
   * come from chunk-equality joins (bucket-local at scale, never
   * all-pairs) and the exact Hamming filter keeps no false positives.
   */
  def perceptualPairs(df: DataFrame, idCol: String, payload: Column,
                      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "chunk banding guarantees recall only for hamming <= 3")
    // cut: both sides of the chunk self-join read the 24-byte/doc sketch.
    // Re-fanned (see Dedup.simHashPairsPortable): the adaptive plan
    // coalesces the small cut to one partition, serializing the chunk
    // join probes downstream (no-op at scale)
    val sh = TextAnalysis.respread(
      Materialize(perceptualHash(df, idCol, payload)), df, col("doc"))
    val chunked = sh.select(col("doc"), col("h1"), col("h2"), posexplode(array(
      col("h1").bitwiseAND(0xFFFF), shiftright(col("h1"), 16),
      col("h2").bitwiseAND(0xFFFF), shiftright(col("h2"), 16))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    chunked.as("x")
      .join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"),
        (bit_count(col("x.h1").bitwiseXOR(col("y.h1"))) +
          bit_count(col("x.h2").bitwiseXOR(col("y.h2")))).cast("int").as("hamming"))
      // Hamming filter BEFORE the dedup: random 16-bit chunk collisions
      // dominate the candidate set at corpus scale, and the distinct's
      // exchange must carry only the near-dup survivors, not the far
      // pairs about to be discarded
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /**
   * The codec boundary: per-blob metadata extraction as a typed
   * `mapPartitions` (one iterator pass per partition, digest instance
   * reused across the batch — the shape a real decoder batch needs).
   *
   * STUB: a real implementation parses the container header / decodes
   * frames here; this environment has no media libraries, so width/height
   * are a deterministic fake derived from the content hash. Everything
   * around the fake — encoder, schema, partition batching — is the real
   * production plumbing.
   */
  def decodeMetaStub(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val in = df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) =>
        val fmt = MagicBytes.collectFirst {
          case (mb, f) if bytes.length >= mb.length &&
            java.util.Arrays.equals(bytes.take(mb.length), mb) => f
        }.getOrElse("bin")
        digest.reset()
        val h = digest.digest(bytes)
        // fake decode: dimensions from the content hash (deterministic)
        MediaMeta(id, fmt, 64 + (h(0) & 0x7f), 64 + (h(1) & 0x7f), bytes.length.toLong)
      }
    }(Encoders.product[MediaMeta])
  }
}
