package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/**
 * WordPiece: likelihood-scored merge training (count(pair) /
 * (count(lhs) * count(rhs)), one merge per round — score-based merges
 * cannot batch) and greedy longest-match-first segmentation with the
 * whole-word-UNK contract. The training spec's ground truth is an
 * independent JVM mirror of the scored merge loop.
 */
class WordPieceSpec extends AnyFunSuite with SparkFixture {

  /** Driver-side mirror of the scored merge loop — independent
   * arithmetic over symbol vectors (no string encodings), same IEEE
   * score, same (score desc, lhs, rhs) order, same left-to-right
   * non-overlapping pair replacement. */
  private def mirrorMerges(words: Seq[(String, Long)], nMerges: Int)
      : Seq[(Int, String, String, String, Long, Long, Long)] = {
    var vocab: Seq[(Vector[String], Long)] = words.map { case (w, n) =>
      w.toVector.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c } -> n
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long, Long, Long)]
    var round = 0
    while (round < nMerges) {
      val symCnt = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (sy, n) =>
        sy.foreach(s => symCnt(s) += n)
        sy.indices.dropRight(1).foreach(i =>
          pairCnt((sy(i), sy(i + 1))) += n)
      }
      if (pairCnt.isEmpty) return out.toSeq
      val (l, r, pn) = pairCnt.toSeq
        .map { case ((a, b), c) =>
          (c.toDouble / (symCnt(a).toDouble * symCnt(b).toDouble), a, b, c) }
        .sortWith { case ((s1, a1, b1, _), (s2, a2, b2, _)) =>
          if (s1 != s2) s1 > s2
          else if (a1 != a2) a1 < a2
          else b1 < b2 }
        .head match { case (_, a, b, c) => (a, b, c) }
      val merged = l + r.stripPrefix("##")
      round += 1
      out += ((round, l, r, merged, pn, symCnt(l), symCnt(r)))
      vocab = vocab.map { case (sy, n) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < sy.length) {
          if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == r) {
            b += merged; i += 2
          } else { b += sy(i); i += 1 }
        }
        (b.result(), n)
      }
    }
    out.toSeq
  }

  private def corpusOf(words: Seq[(String, Long)]) = {
    import spark.implicits._
    words.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  private def collectMerges(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("merge_round").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("## bookkeeping: initial merges drop the prefix, internal keep it") {
    val words = Seq(("aab", 3L), ("ab", 2L), ("b", 5L))
    val got = collectMerges(
      TextAnalysis.wordPieceMerges(corpusOf(words), "text", nMerges = 3))
    assert(got == mirrorMerges(words, 3),
      s"merge sequence drifted from the mirror: $got")
    // the fixture exercises both forms: some merge starts word-initial
    // (bare lhs -> bare merged), some is internal (## stays)
    got.foreach { case (_, l, _, m, _, _, _) =>
      assert(m.startsWith("##") == l.startsWith("##"),
        "merged piece must inherit the LHS position marker")
    }
  }

  test("likelihood score, not raw count, picks the merge") {
    // pair (a, ##b) occurs 10x but both symbols are everywhere;
    // (c, ##d) occurs 3x between rare symbols — the score prefers it
    val words = Seq(("ab", 10L), ("a", 30L), ("b", 30L), ("cd", 3L))
    val mirror = mirrorMerges(words, 1)
    assert(mirror.head._2 == "c" && mirror.head._3 == "##d",
      s"fixture must make the scored choice differ from raw count: $mirror")
    val got = collectMerges(
      TextAnalysis.wordPieceMerges(corpusOf(words), "text", nMerges = 1))
    assert(got == mirror)
  }

  test("property: trained merges equal the mirror on a pseudo-random corpus") {
    val rnd = new scala.util.Random(20260815L)
    val alpha = "abc"
    val words = (0 until 30).map { _ =>
      val len = 1 + rnd.nextInt(5)
      (Vector.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString,
        (1 + rnd.nextInt(5)).toLong)
    }.distinct.toMap.toSeq // distinct words; later duplicates dropped
    val got = collectMerges(
      TextAnalysis.wordPieceMerges(corpusOf(words), "text", nMerges = 10))
    assert(got == mirrorMerges(words, 10))
    assert(got.size == 10, "fixture must not exhaust before 10 merges")
  }

  test("guarded batching replays the sequential order exactly") {
    // the equality gate for the batch condition: with maxBatch = 1 the
    // loop IS the pre-batching sequential trainer; any unsound batch —
    // a creatable pair outscoring a batch member, an inflated existing
    // pair overtaking, a self-pair inside a batch — would diverge in
    // the merge SEQUENCE (exact longs included), not just the set
    val rnd = new scala.util.Random(20260816L)
    val alpha = "abcd"
    for (trial <- 0 until 3) {
      val words = (0 until 40).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (Vector.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString,
          (1 + rnd.nextInt(7)).toLong)
      }.distinct.toMap.toSeq
      val corpus = corpusOf(words)
      val n = 24
      val sequential = collectMerges(
        TextAnalysis.wordPieceMerges(corpus, "text", n, maxBatch = 1))
      val batched = collectMerges(
        TextAnalysis.wordPieceMerges(corpus, "text", n, maxBatch = 16))
      assert(batched == sequential,
        s"trial $trial: batched training diverged from sequential")
      // and both equal the independent JVM mirror
      assert(batched == mirrorMerges(words, n).take(batched.size))
    }
  }

  test("the lifted cap trains past 64 merges and stays mirror-exact") {
    val rnd = new scala.util.Random(20260817L)
    val alpha = "abcdef"
    val words = (0 until 120).map { _ =>
      val len = 2 + rnd.nextInt(6)
      (Vector.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString,
        (1 + rnd.nextInt(9)).toLong)
    }.distinct.toMap.toSeq
    val n = 96 // past the old 64-merge cap
    val got = collectMerges(
      TextAnalysis.wordPieceMerges(corpusOf(words), "text", n))
    assert(got == mirrorMerges(words, n).take(got.size))
    assert(got.size > 64, s"fixture must outlive the old cap: ${got.size}")
    intercept[IllegalArgumentException] {
      TextAnalysis.wordPieceMerges(corpusOf(words), "text", 1025)
    }
  }

  test("segmentation: longest match first, ## continuations, whole-word UNK") {
    import spark.implicits._
    val vocab = Seq("a", "b", "c", "##a", "##b", "##c", "ab", "##bc")
    val docs = Seq((1L, "abc abd ba"), (2L, "c abc"), (3L, "xyz"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.wordPieceSegment(docs, "doc_id", "text", vocab,
        maxPieceLen = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got(0) == ((1L, "ab ##c [UNK] b ##a", 5)),
      s"abc: longest-first ab+##c; abd: d unmatched -> whole-word UNK; got ${got(0)}")
    assert(got(1) == ((2L, "c ab ##c", 3)))
    assert(got(2) == ((3L, "[UNK]", 1)))
  }

  test("segmentation validates its configuration loudly") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.wordPieceSegment(docs, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.wordPieceSegment(docs, "doc_id", "text",
        Seq("toolongpiece"), maxPieceLen = 4)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.wordPieceSegment(docs, "doc_id", "text", Seq("a"),
        unk = "bad unk")
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.wordPieceMerges(docs, "text", nMerges = 0)
    }
  }
}
