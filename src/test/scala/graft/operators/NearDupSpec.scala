package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level checks for the inverted-index n-gram Jaccard path; the
  * whole-corpus result is oracle-verified as `dd_ngram_jaccard`. */
class NearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("ngramJaccardPairs: exact jaccard on a known near-dup, unrelated doc excluded") {
    // doc 1/2 share 2 of their shingles; doc 3 shares none
    val d = docs(
      1L -> "a b c d e",   // shingles: abc bcd cde
      2L -> "a b c d x",   // shingles: abc bcd cdx  -> inter 2, union 4
      3L -> "p q r s t")
    val got = NearDup.ngramJaccardPairs(d, threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.5)))
  }

  test("ngramJaccardPairs: stop-shingle cap drops boilerplate-only pairs, keeps exact jaccard") {
    // every doc shares the boilerplate shingle "x y z"; docs 1/2 also share
    // real content. With maxPosting = 2 the boilerplate posting (df = 4) is
    // excluded from candidates: 1-2 survive via their content shingles and
    // their jaccard still counts the boilerplate hash; 3-4 (boilerplate-only
    // overlap) are not reported.
    val d = docs(
      1L -> "x y z a b c",
      2L -> "x y z a b c",
      3L -> "x y z p q r",
      4L -> "x y z u v w")
    val got = NearDup.ngramJaccardPairs(d, threshold = 0.01, maxPosting = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L)))
    // identical docs: jaccard exactly 1 even though one shared shingle was
    // a stop shingle for candidate purposes
    assert(got.head._3 == 1.0)
  }
}
