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

  test("trainCentroids: default K resolves as sqrt(CORPUS), not sqrt(sample), " +
    "and agrees across paths under a binding cap") {
    val n = emb.count()
    val kCorpus = math.max(2, math.round(math.sqrt(n.toDouble)).toInt)
    // cap 48 binds (corpus is larger), yet K must track the corpus:
    // sqrt(sample) would pin K at sqrt(48) ≈ 7 — at 100 TB that pin
    // makes per-query probe cost linear in corpus size again
    assert(n > 48 && kCorpus > 7,
      s"fixture too small to make the cap binding: n=$n")
    val local = Ann.trainCentroids(emb, iters = 2, maxTrainVectors = 48)
    val dist = Ann.trainCentroids(emb, iters = 2, maxTrainVectors = 48,
      localTrain = false)
    assert(local.length == math.min(kCorpus, 48))
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

  test("maxTrainBytes binds the sample by BYTES and parity holds under it") {
    // 64-dim vectors, 500-row table: a 300-vector byte budget
    // (300·64·8 B) must shrink the huge row cap to exactly 300 rows —
    // the model trained under the byte budget equals the one trained
    // under an explicit 300-row cap, local == distributed still, and
    // the budget demonstrably BINDS (differs from uncapped training).
    val budget = 300L * 64 * 8
    val byBytes = Ann.trainCentroids(emb, kCentroids = 8, iters = 2,
      maxTrainVectors = 1 << 20, maxTrainBytes = budget)
    val byRows = Ann.trainCentroids(emb, kCentroids = 8, iters = 2,
      maxTrainVectors = 300, maxTrainBytes = 0)
    assert(deep(byBytes) == deep(byRows))
    val dist = Ann.trainCentroids(emb, kCentroids = 8, iters = 2,
      maxTrainVectors = 1 << 20, maxTrainBytes = budget, localTrain = false)
    assert(deep(byBytes) == deep(dist))
    val uncapped = Ann.trainCentroids(emb, kCentroids = 8, iters = 2,
      maxTrainVectors = 1 << 20, maxTrainBytes = 0)
    assert(deep(byBytes) != deep(uncapped))
  }

  test("maxTrainBytes floor: never shrinks below MinByteCapRows") {
    // a 1-byte budget cannot starve PQ init below `codes` vectors —
    // the floor keeps >= 256 rows, so an 8-codes train still succeeds
    val cb = Ann.trainPqCodebooks(emb, subspaces = 8, codes = 8, iters = 1,
      maxTrainBytes = 1L)
    assert(cb.length == 8 && cb(0).length == 8)
  }

  test("non-finite embeddings: local dec12 skips like the decimal cast") {
    import spark.implicits._
    // one NaN element among finite members: the distributed cast nulls
    // it and sum() skips; the local twin must do the same, not throw
    val rows = (0L until 12L).map { i =>
      (i, Seq.tabulate(4)(d =>
        if (i == 3L && d == 1) Double.NaN else (i * 4 + d).toDouble / 10.0))
    }
    val df = rows.toDF("vec_id", "embedding")
    val local = Ann.trainCentroids(df, kCentroids = 2, iters = 2,
      maxTrainVectors = 1 << 20)
    val dist = Ann.trainCentroids(df, kCentroids = 2, iters = 2,
      maxTrainVectors = 1 << 20, localTrain = false)
    assert(deep(local) == deep(dist))
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
