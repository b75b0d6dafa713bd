package graft.operators

import graft.TestSpark
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BlockingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // One hot label (20 rows: 10 copies of v, 10 of the antipodal -v — LSH
  // sign buckets are exact complements, so the sub-bucket split is
  // deterministic) plus one small label (3 rows). Dims (1,2,4): no ±1
  // combination sums to zero, every projection is nonzero.
  private def vecs = {
    val v = Seq(1.0f, 2.0f, 4.0f)
    val nv = v.map(x => -x)
    val rows = (0L until 10L).map(i => (i, 1, v)) ++
               (10L until 20L).map(i => (i, 1, nv)) ++
               (100L until 103L).map(i => (i, 2, v))
    rows.toDF("vec_id", "label", "embedding")
      .withColumn("nrm", VectorFunctions.norm2($"embedding"))
  }

  test("boundedCosinePairs: under the cap the result IS the exact all-pairs") {
    val bounded = Blocking.boundedCosinePairs(vecs, maxBlock = 1000, dims = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // 20 choose 2 + 3 choose 2
    assert(bounded.size == 190 + 3)
  }

  test("boundedCosinePairs: oversized block routes through LSH sub-buckets") {
    val bounded = Blocking.boundedCosinePairs(vecs, maxBlock = 10, dims = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // hot label split into the v-group and the antipodal group: pairs only
    // within each (45 + 45); the small label is untouched (3)
    assert(bounded.size == 45 + 45 + 3)
    val sameGroup = bounded.filter { case (a, b) => a < 100 && b < 100 }
      .forall { case (a, b) => (a < 10) == (b < 10) }
    assert(sameGroup, "a cross-bucket pair leaked through the LSH split")
    // small label's exact pairs survive
    assert(bounded.filter(_._1 >= 100) == Set((100L, 101L), (100L, 102L), (101L, 102L)))
  }

  test("boundedCosinePairs scores identical vectors at cosine 1") {
    val out = Blocking.boundedCosinePairs(vecs, maxBlock = 1000, dims = 3)
      .filter($"a_id" === 100L && $"b_id" === 101L)
      .select("cosine").as[Double].head()
    assert(math.abs(out - 1.0) < 1e-9)
  }

  test("cappedBandCandidates star-compresses degenerate buckets (O(n), connectivity kept)") {
    val degenerate = (1L to 20L).map(i => (i, 111L))
    val normal = (21L to 23L).map(i => (i, 222L))
    val bands = (degenerate ++ normal).toDF("doc_id", "band")
    val cand = Blocking.cappedBandCandidates(bands, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    // over-cap bucket: every member pairs with the hub (min doc_id) ONLY —
    // 19 edges, not 190 — so a mass-duplicate cluster still becomes one
    // connected component instead of silently escaping dedup
    val star = (2L to 20L).map(i => (1L, i)).toSet
    assert(cand == star ++ Set((21L, 22L), (21L, 23L), (22L, 23L)))
  }

  test("cappedBandCandidates is exact when no bucket exceeds the cap") {
    val bands = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 8L)).toDF("doc_id", "band")
    val cand = Blocking.cappedBandCandidates(bands, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
