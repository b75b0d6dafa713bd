package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The local (driver-side) training twins must be BIT-IDENTICAL to the
  * distributed Lloyd/PQ/balanced loops they replace — the SQL oracles
  * replay training arithmetic exactly, so any drift (rounding rule, hash
  * order, tiebreak, decimal sum) turns a verify query red. These specs
  * pin local == distributed on the same training sets, binding and
  * non-binding caps both. */
class AnnLocalTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = Tables.embeddings(spark, TestSpark.sf)
    .select(col("vec_id"), col("embedding"))

  private def deep(a: Array[Array[Double]]): Seq[Seq[Double]] =
    a.map(_.toSeq).toSeq
  private def deep3(a: Array[Array[Array[Double]]]): Seq[Seq[Seq[Double]]] =
    a.map(_.map(_.toSeq).toSeq).toSeq

  test("trainCentroids: local == distributed, non-binding and binding caps") {
    for (cap <- Seq(1 << 20, 32)) {
      val local = Ann.trainCentroids(emb, kCentroids = 8, iters = 3,
        maxTrainVectors = cap)
      val dist = Ann.trainCentroids(emb, kCentroids = 8, iters = 3,
        maxTrainVectors = cap, localTrain = false)
      assert(deep(local) == deep(dist), s"cap=$cap")
    }
  }

  test("trainCentroids: default K (sqrt of sample) agrees across paths") {
    val local = Ann.trainCentroids(emb, iters = 2, maxTrainVectors = 48)
    val dist = Ann.trainCentroids(emb, iters = 2, maxTrainVectors = 48,
      localTrain = false)
    assert(local.length == dist.length)
    assert(deep(local) == deep(dist))
  }

  test("trainCentroidsBalanced: local == distributed including splits/freezes") {
    // a low balanceFactor forces hot-cell split rounds on the real table
    for (bf <- Seq(1.5, 3.0)) {
      val local = Ann.trainCentroidsBalanced(emb, kCentroids = 6, iters = 2,
        balanceFactor = bf, maxSplitRounds = 3, splitIters = 2,
        maxTrainVectors = 1 << 20)
      val dist = Ann.trainCentroidsBalanced(emb, kCentroids = 6, iters = 2,
        balanceFactor = bf, maxSplitRounds = 3, splitIters = 2,
        maxTrainVectors = 1 << 20, localTrain = false)
      assert(deep(local) == deep(dist), s"balanceFactor=$bf")
    }
  }

  test("trainPqCodebooks: local == distributed") {
    for (cap <- Seq(1 << 20, 40)) {
      val local = Ann.trainPqCodebooks(emb, subspaces = 8, codes = 16,
        iters = 2, maxTrainVectors = cap)
      val dist = Ann.trainPqCodebooks(emb, subspaces = 8, codes = 16,
        iters = 2, maxTrainVectors = cap, localTrain = false)
      assert(deep3(local) == deep3(dist), s"cap=$cap")
    }
  }

  test("ivfPqTrain: local == distributed (residual path included)") {
    val (lc, lcb) = Ann.ivfPqTrain(emb, kCentroids = 8, subspaces = 8,
      codes = 16, centIters = 2, pqIters = 2, maxTrainVectors = 1 << 20)
    val (dc, dcb) = Ann.ivfPqTrain(emb, kCentroids = 8, subspaces = 8,
      codes = 16, centIters = 2, pqIters = 2, maxTrainVectors = 1 << 20,
      localTrain = false)
    assert(deep(lc) == deep(dc))
    assert(deep3(lcb) == deep3(dcb))
  }

  test("local PQ training enforces the packed-key overflow guard") {
    import spark.implicits._
    // squared L2 between huge sub-vectors overflows the 6dp micro key
    val rows = (0L until 20L).map(i =>
      (i, Seq.fill(8)(if (i % 2 == 0) 1e8 else -1e8)))
    val df = rows.toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Ann.trainPqCodebooks(df, subspaces = 2, codes = 4, iters = 1)
    }
    assert(ex.getMessage.contains("overflows the packed argmin key"),
      ex.getMessage)
  }
}
