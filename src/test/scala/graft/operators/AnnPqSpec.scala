package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: training reproducibility (the property the
  * injected-codebook oracle rests on), ADC serving shape, and the recall
  * position of the compressed path. */
class AnnPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = Tables.embeddings(spark, TestSpark.sf)
    .select(col("vec_id"), col("embedding"))

  test("codebooks are bit-identical across partitionings") {
    val a = Ann.trainPqCodebooks(emb, subspaces = 8, codes = 8, iters = 2)
    val b = Ann.trainPqCodebooks(emb.repartition(7, col("vec_id")),
      subspaces = 8, codes = 8, iters = 2)
    val c = Ann.trainPqCodebooks(emb.coalesce(1),
      subspaces = 8, codes = 8, iters = 2)
    assert(a.deep == b.deep, "repartitioned training drifted")
    assert(a.deep == c.deep, "single-partition training drifted")
  }

  private implicit class DeepEq(cb: Array[Array[Array[Double]]]) {
    def deep: Seq[Seq[Seq[Double]]] = cb.toSeq.map(_.toSeq.map(_.toSeq))
  }

  test("codebook geometry: M subspaces x K codes x dsub dims, finite values") {
    val cb = Ann.trainPqCodebooks(emb, subspaces = 4, codes = 8, iters = 1)
    assert(cb.length == 4)
    assert(cb.forall(_.length == 8))
    assert(cb.forall(_.forall(_.length == 16))) // 64 dims / 4 subspaces
    assert(cb.forall(_.forall(_.forall(v => !v.isNaN && !v.isInfinite))))
  }

  test("indivisible dims are rejected loudly") {
    val ex = intercept[IllegalArgumentException] {
      Ann.trainPqCodebooks(emb, subspaces = 7)
    }
    assert(ex.getMessage.contains("divisible"))
  }

  test("ADC serving answers deterministically and self-excludes") {
    val cb = Ann.trainPqCodebooks(emb, iters = 2)
    val r1 = Ann.pqTopKFromCodebooks(emb, col("vec_id") < 5, cb, 5)
      .orderBy(col("q_id"), col("rk")).collect()
    val r2 = Ann.pqTopKFromCodebooks(emb.repartition(11), col("vec_id") < 5,
        cb, 5)
      .orderBy(col("q_id"), col("rk")).collect()
    assert(r1.toSeq == r2.toSeq, "ADC result depends on partitioning")
    assert(r1.length == 25, s"expected 5 queries x 5 ranks, got ${r1.length}")
    assert(r1.forall(r => r.getLong(0) != r.getLong(1)),
      "a query matched itself")
    assert(r1.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9),
      "reconstruction cosine out of [-1, 1]")
  }

  test("exact-rerank: refine >= corpus reproduces brute force exactly") {
    // when every vector is a candidate the rerank IS brute force: the
    // exact pass must reproduce bruteForceTopK row-for-row (scores,
    // ranks, tiebreaks) — pins the rerank scorer to the exact scorer
    val cb = Ann.trainPqCodebooks(emb, iters = 2)
    val rerank = Ann.pqTopKRerank(emb, col("vec_id") < 5, cb, 5,
        refine = 1 << 20)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rk"))
      .orderBy(col("q_id"), col("rk")).collect()
    val brute = Ann.bruteForceTopK(emb, col("vec_id") < 5, 5)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rk"))
      .orderBy(col("q_id"), col("rk")).collect()
    assert(rerank.toSeq == brute.toSeq)
  }

  test("exact-rerank: results are a re-scored subset of the PQ candidates") {
    val cb = Ann.trainPqCodebooks(emb, iters = 2)
    val cand = Ann.pqTopKFromCodebooks(emb, col("vec_id") < 5, cb, 20)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = Ann.pqTopKRerank(emb, col("vec_id") < 5, cb, 5, refine = 20)
      .select(col("q_id"), col("n_id"), col("rk")).collect()
    assert(rr.length == 25)
    assert(rr.forall(r => cand((r.getLong(0), r.getLong(1)))),
      "rerank surfaced a non-candidate pair")
    // refine below k is a config error, loudly
    val ex = intercept[IllegalArgumentException] {
      Ann.pqTopKRerank(emb, col("vec_id") < 5, cb, 5, refine = 3)
    }
    assert(ex.getMessage.contains("refine"))
  }

  test("ivf-pq exact-rerank lifts recall toward the probe ceiling") {
    val k = 10
    val exact = Ann.bruteForceTopK(emb, col("vec_id") < 10, k)
    val (cents, cbr) = Ann.ivfPqTrain(emb, kCentroids = 8, codes = 16,
      centIters = 2, pqIters = 2)
    val plain = Ann.recallAtK(exact,
      Ann.ivfPqTopKFrom(emb, col("vec_id") < 10, cents, cbr, k, nProbe = 4))
    val refined = Ann.recallAtK(exact,
      Ann.ivfPqTopKRerank(emb, col("vec_id") < 10, cents, cbr, k,
        nProbe = 4, refine = 60))
    // the exact ceiling at the same probe set: rerank can approach but
    // never exceed it
    val ceiling = Ann.recallAtK(exact,
      Ann.ivfTopKTrained(emb, col("vec_id") < 10, k, nProbe = 4,
        kCentroids = 8, iters = 2))
    assert(refined >= plain,
      s"rerank lowered recall: $refined < $plain")
    assert(refined <= ceiling + 1e-9,
      s"rerank recall $refined exceeds its probe ceiling $ceiling")
  }

  test("codebook model store: write/read bit-identical, serving unchanged") {
    val cb = Ann.trainPqCodebooks(emb, subspaces = 4, codes = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("pq_store").toString
    Ann.pqCodebooksWrite(cb, path, spark)
    val back = Ann.pqCodebooksRead(spark, path)
    assert(back.length == cb.length &&
      back.zip(cb).forall { case (a, b) =>
        a.zip(b).forall { case (x, y) => x.sameElements(y) } },
      "loaded codebooks differ from the trained ones")
    val served = Ann.pqTopKFromCodebooks(emb, col("vec_id") < 5, back, 5)
      .collect().map(_.toSeq).toSet
    val direct = Ann.pqTopKFromCodebooks(emb, col("vec_id") < 5, cb, 5)
      .collect().map(_.toSeq).toSet
    assert(served == direct, "serving from the store changed answers")
    // a sparse store (a lost cell) fails loudly instead of mis-encoding
    val broken = java.nio.file.Files.createTempDirectory("pq_broken").toString
    spark.read.parquet(path).where("NOT (m = 0 AND code = 0)")
      .write.mode("overwrite").parquet(broken)
    val e = intercept[IllegalArgumentException] {
      Ann.pqCodebooksRead(spark, broken)
    }
    assert(e.getMessage.contains("sparse"))
  }

  test("IVF-PQ model store: round-trip bit-identical, serving unchanged") {
    val model = Ann.ivfPqTrain(emb, kCentroids = 4, subspaces = 4, codes = 8,
      centIters = 2, pqIters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_store").toString
    Ann.ivfPqModelWrite(model, path, spark)
    val (cents, cb) = Ann.ivfPqModelRead(spark, path)
    assert(cents.zip(model._1).forall { case (a, b) => a.sameElements(b) })
    assert(cb.zip(model._2).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
    val served = Ann.ivfPqTopKFrom(emb, col("vec_id") < 5, cents, cb, 5, 2)
      .collect().map(_.toSeq).toSet
    val direct = Ann.ivfPqTopKFrom(emb, col("vec_id") < 5, model._1, model._2,
      5, 2).collect().map(_.toSeq).toSet
    assert(served == direct, "serving from the store changed answers")
    // a centroid store missing a cell fails loudly — a silent renumber
    // would reassign the whole corpus
    val broken = java.nio.file.Files.createTempDirectory("ivfpq_broken").toString
    spark.read.parquet(s"$path/cents").where("cell <> 1")
      .write.mode("overwrite").parquet(s"$broken/cents")
    spark.read.parquet(s"$path/codebooks")
      .write.mode("overwrite").parquet(s"$broken/codebooks")
    val e = intercept[IllegalArgumentException] {
      Ann.ivfPqModelRead(spark, broken)
    }
    assert(e.getMessage.contains("sparse"))
  }

  test("recall@10 of PQ is bounded and a finer codebook does not hurt") {
    val e = emb
    val isQuery = col("vec_id") < 10
    val exact = Ann.bruteForceTopK(e, isQuery, 10).persist()
    try {
      val coarse = Ann.recallAtK(exact, Ann.pqTopK(e, isQuery, 10,
        subspaces = 8, codes = 4, iters = 2, seed = "pq"))
      val fine = Ann.recallAtK(exact, Ann.pqTopK(e, isQuery, 10,
        subspaces = 8, codes = 32, iters = 2, seed = "pq"))
      assert(coarse >= 0.0 && coarse <= 1.0)
      assert(fine >= 0.0 && fine <= 1.0)
      // 32 codes per subspace reconstruct strictly more faithfully than 4
      // on any data; allow slack for rank-boundary flips near ties
      assert(fine >= coarse - 0.05,
        s"finer codebook recall $fine collapsed vs coarse $coarse")
    } finally exact.unpersist()
  }

  test("ivf-pq: training and serving are partition-invariant") {
    val e = emb
    val (cents, cb) = Ann.ivfPqTrain(e, kCentroids = 8, subspaces = 8,
      codes = 8, centIters = 2, pqIters = 2)
    val (cents2, cb2) = Ann.ivfPqTrain(e.repartition(9, col("vec_id")),
      kCentroids = 8, subspaces = 8, codes = 8, centIters = 2, pqIters = 2)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq,
      "coarse centroids drifted under repartitioning")
    assert(cb.deep == cb2.deep, "residual codebooks drifted")
    val r1 = Ann.ivfPqTopKFrom(e, col("vec_id") < 5, cents, cb, 5)
      .orderBy(col("q_id"), col("rk")).collect()
    val r2 = Ann.ivfPqTopKFrom(e.repartition(13), col("vec_id") < 5,
        cents, cb, 5)
      .orderBy(col("q_id"), col("rk")).collect()
    assert(r1.toSeq == r2.toSeq, "IVF-PQ serving depends on partitioning")
    assert(r1.forall(r => r.getLong(0) != r.getLong(1)),
      "a query matched itself")
  }

  test("ivf-pq recall is bounded by the probed fraction's exact twin") {
    val e = emb
    val isQuery = col("vec_id") < 10
    val exact = Ann.bruteForceTopK(e, isQuery, 10).persist()
    try {
      // same pruning with EXACT scoring: the ceiling any code-based
      // scorer of the same probe set can reach
      val ivfExact = Ann.recallAtK(exact,
        Ann.ivfTopKTrained(e, isQuery, 10, nProbe = 2, kCentroids = 16))
      val ivfPq = Ann.recallAtK(exact,
        Ann.ivfPqTopK(e, isQuery, 10, kCentroids = 16, nProbe = 2))
      assert(ivfPq >= 0.0 && ivfPq <= 1.0)
      // PQ scores the same candidate set approximately — it can reorder
      // WITHIN the probed cells but cannot recover anything outside them;
      // tiny slack for rank-boundary ties
      assert(ivfPq <= ivfExact + 0.05,
        s"IVF-PQ recall $ivfPq exceeds its exact-scoring ceiling $ivfExact")
    } finally exact.unpersist()
  }

  test("plan shape: LUT broadcasts, no embedding array in any Exchange") {
    val cb = Ann.trainPqCodebooks(emb, iters = 1)
    val df = Ann.pqTopKFromCodebooks(emb, col("vec_id") < 5, cb, 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the query LUT must ride a broadcast join")
    val badExchange = plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("emb"))
    assert(!badExchange,
      "an embedding array rode a shuffle — only (vec_id, m, code) " +
      "triples may enter the candidate Exchange")
  }
}
