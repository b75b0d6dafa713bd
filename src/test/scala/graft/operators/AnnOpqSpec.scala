package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPQ (optimized product quantization, Ge et al. CVPR 2013): the learned
  * rotation's orthogonality, the serving rotation's exactness contract
  * (codegen'd [[graft.functions.ArrayRotate]] == driver matvec + the Round
  * rule), the alternation's objective direction on a correlated corpus,
  * model-store round-trips, and the refined path's candidate discipline. */
class AnnOpqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = Tables.embeddings(spark, TestSpark.sf)
    .select(col("vec_id"), col("embedding"))

  private def round6(x: Double): Double =
    graft.functions.ArrayRotate.round6(x)

  test("trained rotation is orthogonal (R'R = I) and training is reproducible") {
    val (r1, cb1) = Ann.opqTrain(emb, subspaces = 8, codes = 8, iters = 2,
      opqIters = 3)
    val (r2, cb2) = Ann.opqTrain(emb.repartition(7, col("vec_id")),
      subspaces = 8, codes = 8, iters = 2, opqIters = 3)
    val d = r1.length
    assert(d == 64)
    var maxDev = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      var acc = 0.0
      for (k <- 0 until d) acc += r1(k)(i) * r1(k)(j)
      maxDev = math.max(maxDev, math.abs(acc - (if (i == j) 1.0 else 0.0)))
    }
    assert(maxDev < 1e-9, s"R'R deviates from I by $maxDev")
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq,
      "rotation drifted across partitionings")
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq == cb2.map(_.map(_.toSeq).toSeq).toSeq,
      "codebooks drifted across partitionings")
  }

  test("rotateFrame matches the driver matvec + Round rule exactly (float input too)") {
    import spark.implicits._
    val rot = Array.tabulate(4, 4) { (i, j) =>
      math.sin(i * 4 + j + 1.0) // any matrix: the contract is arithmetic, not orthogonality
    }
    val doubles = Seq((1L, Seq(0.25, -1.5, 3.125, 0.000001875)),
      (2L, Seq(-0.1, 0.2, -0.3, 0.4)))
    val df = doubles.toDF("vec_id", "embedding")
    val got = Ann.rotateFrame(df, rot).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray)
    val want = doubles.map { case (_, v) =>
      (0 until 4).map { i =>
        var acc = 0.0
        for (j <- 0 until 4) acc += rot(i)(j) * v(j)
        round6(acc)
      }.toArray
    }
    got.zip(want).foreach { case (g, w) =>
      assert(g.toSeq == w.toSeq, s"double-input rotation drifted: " +
        s"${g.toSeq} vs ${w.toSeq}")
    }
    // float input casts per element exactly like the driver's toDouble
    val floats = df.select(col("vec_id"),
      col("embedding").cast("array<float>").as("embedding"))
    val gotF = Ann.rotateFrame(floats, rot).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray)
    val wantF = doubles.map { case (_, v) =>
      (0 until 4).map { i =>
        var acc = 0.0
        for (j <- 0 until 4) acc += rot(i)(j) * v(j).toFloat.toDouble
        round6(acc)
      }.toArray
    }
    gotF.zip(wantF).foreach { case (g, w) =>
      assert(g.toSeq == w.toSeq, "float-input rotation drifted")
    }
  }

  test("on a cross-subspace-correlated corpus the rotation cuts reconstruction error") {
    import spark.implicits._
    // dims 0..31 strongly correlated with dims 32..63 (the same signal
    // repeated with a sign flip + small noise): a coordinate-block PQ
    // split wastes its budget coding the shared signal twice; OPQ's
    // rotation can decorrelate across the split. Deterministic data.
    val rows = (0 until 400).map { n =>
      val base = Array.tabulate(32)(i =>
        math.sin(n * 0.37 + i * 1.13) * (1.0 + (i % 5) * 0.5))
      val noise = Array.tabulate(32)(i => math.cos(n * 0.91 + i * 2.17) * 0.05)
      (n.toLong, (base ++ base.zip(noise).map { case (b, x) => -b + x }).toSeq)
    }
    val corr = rows.toDF("vec_id", "embedding")
    def reconErr(rot: Array[Array[Double]],
                 cb: Array[Array[Array[Double]]]): Double = {
      val vecs = rows.map(_._2.toArray)
      val d = rot.length
      val dsub = d / cb.length
      vecs.map { x =>
        val y = (0 until d).map { i =>
          var acc = 0.0
          for (j <- 0 until d) acc += rot(i)(j) * x(j)
          acc
        }.toArray
        var err = 0.0
        for (m <- cb.indices) {
          val off = m * dsub
          var best = java.lang.Double.POSITIVE_INFINITY
          for (cv <- cb(m)) {
            var d2 = 0.0
            for (k2 <- 0 until dsub) {
              val df2 = y(off + k2) - cv(k2); d2 += df2 * df2
            }
            best = math.min(best, d2)
          }
          err += best
        }
        err
      }.sum
    }
    val d = 64
    val ident = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val cbPq = Ann.trainPqCodebooks(corr, subspaces = 2, codes = 8, iters = 3)
    val (rot, cbOpq) = Ann.opqTrain(corr, subspaces = 2, codes = 8,
      iters = 3, opqIters = 10)
    val errPq = reconErr(ident, cbPq)
    val errOpq = reconErr(rot, cbOpq)
    assert(errOpq < errPq * 0.95,
      f"OPQ reconstruction error $errOpq%.3f not materially below plain " +
        f"PQ's $errPq%.3f on a correlated corpus")
  }

  test("opq model store round-trips bit-identical; sparse/ragged stores rejected") {
    val (rot, cb) = Ann.opqTrain(emb, subspaces = 4, codes = 4, iters = 1,
      opqIters = 2)
    val dir = java.nio.file.Files.createTempDirectory("opq_store").toString
    Ann.opqModelWrite((rot, cb), dir, spark)
    val (rot2, cb2) = Ann.opqModelRead(spark, dir)
    assert(rot.map(_.toSeq).toSeq == rot2.map(_.toSeq).toSeq)
    assert(cb.map(_.map(_.toSeq).toSeq).toSeq == cb2.map(_.map(_.toSeq).toSeq).toSeq)
    // a store missing a rotation row must fail loudly
    import spark.implicits._
    spark.read.parquet(s"$dir/rot").filter(col("i") =!= 0)
      .write.mode("overwrite").parquet(s"$dir-sparse/rot")
    spark.read.parquet(s"$dir/codebooks")
      .write.mode("overwrite").parquet(s"$dir-sparse/codebooks")
    val ex = intercept[IllegalArgumentException] {
      Ann.opqModelRead(spark, s"$dir-sparse")
    }
    assert(ex.getMessage.contains("sparse OPQ rotation"))
  }

  test("rerank refines rotated-ADC candidates with TRUE vectors") {
    val (rot, cb) = Ann.opqTrain(emb, subspaces = 8, codes = 16, iters = 2,
      opqIters = 2)
    val refined = Ann.opqTopKRerank(emb, col("vec_id") < 5, rot, cb,
      k = 3, refine = 10).collect()
    assert(refined.nonEmpty)
    val exact = Ann.bruteForceTopK(emb, col("vec_id") < 5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet
    // every refined cosine equals the exact round-6 cosine of that pair
    // (the rerank pass scores with true vectors, not reconstructions) —
    // check via the exact scorer's values where the pair appears there
    val exactByPair = exact.map { case (q, n, c) => (q, n) -> c }.toMap
    refined.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactByPair.get(key).foreach { c =>
        assert(r.getDouble(2) == c,
          s"rerank cosine for $key drifted from the exact scorer")
      }
    }
    // refine >= k enforced
    intercept[IllegalArgumentException] {
      Ann.opqTopKRerank(emb, col("vec_id") < 5, rot, cb, k = 5, refine = 3)
    }
  }
}
