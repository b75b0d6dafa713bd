package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the corpus-preparation operators over generated
  * corpora (deterministic seeds — each case is a Spark job, so a handful
  * of well-chosen shapes beats hundreds of random ones), plus empty-input
  * robustness for the whole operator family. */
class CorpusPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpusOf(tokenCounts: Seq[Int]) =
    tokenCounts.zipWithIndex
      .map { case (n, i) => (i.toLong, ("w " * n).trim) }
      .toDF("doc_id", "text")

  test("packSequences invariants hold across corpus shapes") {
    val shapes = Seq(
      Seq.fill(50)(7),                      // uniform
      (1 to 40).map(i => i % 13),           // varied with zeros
      Seq(500, 1, 1, 1, 500, 1),            // single docs above budget
      Seq(0, 0, 0))                         // all empty
    for ((shape, si) <- shapes.zipWithIndex) {
      val budget = 32L
      val got = Corpus.packSequences(corpusOf(shape), budget, partitions = 3)
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      // token counts faithful
      assert(got.map(_._2.toInt).toSeq == shape, s"shape $si")
      // seq ids non-decreasing in doc order, starting at 0
      assert(got.head._3 == 0L, s"shape $si")
      assert(got.sliding(2).forall(p => p.length < 2 || p(0)._3 <= p(1)._3),
        s"shape $si: seq_id must be monotone in doc order")
      // exclusive-prefix rule reproduced by a linear scan
      var cum = 0L
      for ((id, tok, seq) <- got) {
        assert(seq == cum / budget, s"shape $si doc $id")
        cum += tok
      }
      spark.catalog.clearCache()
    }
  }

  test("chunkTokens with stride=window partitions the token stream exactly") {
    for (n <- Seq(1, 7, 8, 9, 63, 64, 65, 130)) {
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val chunks = Corpus.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
          window = 8, stride = 8)
        .orderBy("chunk_idx").as[(Long, Long, String, Long)].collect()
      // concatenating the tiles reproduces the document
      assert(chunks.map(_._3).mkString(" ") == text, s"n=$n")
      // every chunk within the window budget; only the last may be partial
      assert(chunks.dropRight(1).forall(_._4 == 8L), s"n=$n")
      assert(chunks.last._4 <= 8L && chunks.last._4 > 0L, s"n=$n")
    }
  }

  test("segmentDedup output is a subsequence of the input tokens") {
    val common = "c1 c2 c3 c4 c5 c6 c7 c8"
    val d = (1L to 6L).map(i => (i, s"$common u${i}a u${i}b")).toDF("doc_id", "text")
    val got = Corpus.segmentDedup(d, segWords = 8, maxDf = 2)
      .as[(Long, String, Long)].collect()
    val input = d.as[(Long, String)].collect().toMap
    for ((id, clean, _) <- got) {
      val in = input(id).split(" ").toSeq
      val out = if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
      // order-preserving subsequence check
      var idx = 0
      for (w <- out) {
        idx = in.indexOf(w, idx)
        assert(idx >= 0, s"doc $id: '$w' out of order or absent")
        idx += 1
      }
    }
  }

  test("every corpus operator is a no-op on an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Corpus.deconOverlap(empty, empty, 5).count() == 0)
    assert(Corpus.segmentDedup(empty).count() == 0)
    assert(Corpus.packSequences(empty, 256, 4).count() == 0)
    assert(Corpus.chunkTokens(empty).count() == 0)
    assert(Corpus.bm25(empty, Seq("x")).count() == 0)
    val emptyLang = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(Corpus.mixWeighted(emptyLang, Seq("en" -> 1.0)).count() == 0)
    assert(Corpus.sampleByRate(empty, lit(1.0)).count() == 0)
    assert(NearDup.dedupAgainstReference(empty, empty).count() == 0)
    spark.catalog.clearCache()
  }
}
