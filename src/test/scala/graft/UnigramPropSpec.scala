package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/**
 * Property-style tests for the unigram tokenizer (seeded — reproducible):
 * against random corpora and random piece vocabularies, segmentation must
 * (a) be TOTAL — the pieces of every word concatenate back to the word,
 * (b) emit only vocabulary pieces or single-character fallbacks, (c) be
 * genuinely greedy — at every position the emitted piece is the longest
 * vocabulary match (or a 1-char fallback when nothing matches), and the
 * trained vocabulary must (d) cover every corpus character and respect
 * its size budget with counts consistent under its own re-segmentation.
 */
class UnigramPropSpec extends AnyFunSuite with SparkFixture {

  private val rnd = new Random(20260814L)
  private val alphabet = "abcdef"

  private def word(): String =
    Seq.fill(1 + rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.length)))
      .mkString

  test("segmentation is total, in-vocab, and leftmost-longest (random trials)") {
    import spark.implicits._
    val maxLen = 3
    for (_ <- 1 to 8) {
      val words = Seq.fill(12)(word()).distinct
      val docs = words.grouped(3).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val vocab = (Seq.fill(8)(word().take(maxLen)).distinct ++ Seq("a"))
        .filter(_.nonEmpty)
      val vs = vocab.toSet
      // the reference greedy walk, independently re-implemented
      def ref(w: String): Seq[String] = {
        val out = Seq.newBuilder[String]
        var p = 0
        while (p < w.length) {
          val l = (math.min(maxLen, w.length - p) to 1 by -1)
            .find(l => vs.contains(w.substring(p, p + l))).getOrElse(1)
          out += w.substring(p, p + l); p += l
        }
        out.result()
      }
      val got = TextAnalysis.unigramSegment(docs, "doc_id", "text", vocab, maxLen)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      docs.collect().foreach { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val want = text.split(" ").filter(_.nonEmpty).flatMap(ref).mkString(" ")
        assert(got(id) == want, s"doc $id: got '${got(id)}', want '$want'")
        // totality: pieces concatenate back to the normalized text
        assert(got(id).replace(" ", "") == text.replace(" ", ""))
        // membership: vocabulary pieces or single-char fallbacks only
        got(id).split(" ").foreach(p =>
          assert(vs.contains(p) || p.length == 1, s"alien piece '$p'"))
      }
    }
  }

  test("trained vocabulary equals an independent JVM mirror of the EM rounds") {
    import spark.implicits._
    val maxLen = 3
    for (trial <- 1 to 4) {
      val texts = Seq.tabulate(10)(_ => Seq.fill(6)(word()).mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val vocabSize = 10 + trial * 2
      val rounds = 1 + trial % 3
      val seedSize = 16
      // ---- independent mirror (plain Scala, no Spark) ----
      val wordFreq = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      val seedCnt = collection.mutable.Map.empty[String, Long]
      for ((w, n) <- wordFreq; p <- 0 until w.length;
           l <- 1 to math.min(maxLen, w.length - p))
        seedCnt(w.substring(p, p + l)) =
          seedCnt.getOrElse(w.substring(p, p + l), 0L) + n
      val singles = seedCnt.keys.filter(_.length == 1).toSeq.sorted
      val budget = vocabSize - singles.size
      assert(budget > 0, "fixture must leave a multi-piece budget")
      def topMultis(cnt: collection.Map[String, Long]): Seq[String] =
        cnt.toSeq.filter(_._1.length > 1)
          .sortBy { case (p, c) => (-c, p) }.take(budget).map(_._1)
      def greedy(w: String, vs: Set[String]): Seq[String] = {
        val out = Seq.newBuilder[String]
        var p = 0
        while (p < w.length) {
          val l = (math.min(maxLen, w.length - p) to 1 by -1)
            .find(l => vs.contains(w.substring(p, p + l))).getOrElse(1)
          out += w.substring(p, p + l); p += l
        }
        out.result()
      }
      var vocab = (singles ++ seedCnt.toSeq.filter(_._1.length > 1)
        .sortBy { case (p, c) => (-c, p) }.take(seedSize).map(_._1)).toSet
      var counts: collection.Map[String, Long] = Map.empty
      for (_ <- 1 to rounds) {
        val c = collection.mutable.Map.empty[String, Long]
        for ((w, n) <- wordFreq; piece <- greedy(w, vocab))
          c(piece) = c.getOrElse(piece, 0L) + n
        counts = c
        vocab = (singles ++ topMultis(c)).toSet
      }
      val mirror = (singles.map(s => s -> counts.getOrElse(s, 0L)) ++
          topMultis(counts).map(p => p -> counts(p)))
        .sortBy { case (p, c) => (-c, p) }
        .zipWithIndex.map { case ((p, c), i) => (p, c, i + 1) }
      // ---- the operator must reproduce it exactly ----
      val trained = TextAnalysis.unigramTrain(docs, "text", vocabSize,
          maxPieceLen = maxLen, rounds = rounds, seedSize = seedSize)
        .orderBy("rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
      assert(trained == mirror,
        s"trial $trial (rounds=$rounds, vocabSize=$vocabSize):\n" +
          s" got    $trained\n mirror $mirror")
    }
  }
}
