package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The on-disk IVF index: cell-partitioned layout, partition-pruned query
  * scans, and answer parity with the in-memory ivfTopK (which is itself
  * oracle-verified as `ann_ivf_topk`). */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = graft.Tables.embeddings(spark, TestSpark.sf)
    .select($"vec_id", $"embedding")

  test("ivfIndexWrite lays out one directory per cell, all vectors present") {
    val path = java.nio.file.Files.createTempDirectory("ivfw").toString
    Ann.ivfIndexWrite(corpus, isCentroid = $"vec_id" < 16, path)
    val cellDirs = new java.io.File(s"$path/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 16)
    assert(spark.read.parquet(s"$path/cells").count() == corpus.count())
    assert(spark.read.parquet(s"$path/centroids").count() == 16)
  }

  test("disk index answers exactly like the in-memory IVF path") {
    val path = java.nio.file.Files.createTempDirectory("ivfq").toString
    Ann.ivfIndexWrite(corpus, isCentroid = $"vec_id" < 16, path)
    val mem = Ann.ivfTopK(corpus, isQuery = $"vec_id" < 10,
        isCentroid = $"vec_id" < 16, k = 5, nProbe = 2)
      .select($"q_id", $"n_id", $"cosine", $"rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val disk = Ann.ivfIndexTopK(corpus.filter($"vec_id" < 10), path,
        k = 5, nProbe = 2)
      .select($"q_id", $"n_id", $"cosine", $"rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(disk == mem)
  }

  test("query scan PRUNES to the probed cells' partitions") {
    val path = java.nio.file.Files.createTempDirectory("ivfp").toString
    Ann.ivfIndexWrite(corpus, isCentroid = $"vec_id" < 16, path)
    val p = Ann.ivfIndexTopK(corpus.filter($"vec_id" < 2), path,
        k = 3, nProbe = 2)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // the literal IN-list over the partition column must land in
    // PartitionFilters — that is the "only open nProbe/K of the files"
    // property the on-disk layout exists for
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"cells scan must carry a partition filter:\n$p")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("cell") && (pf.contains("IN") || pf.contains("in(")),
      s"partition filter must be the probed-cell IN-list: $pf")
  }

  test("persisted IVF-PQ index: cell-partitioned codes, model round-trip, " +
    "bit-parity with the in-memory ADC path, partition-pruned probes") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    Ann.ivfPqIndexWrite(corpus, path, kCentroids = 16, subspaces = 8,
      codes = 16)
    // layout: one dir per cell; codes rows = vectors × subspaces
    val cellDirs = new java.io.File(s"$path/codes").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 16)
    assert(spark.read.parquet(s"$path/codes").count() ==
      corpus.count() * 8)
    // models round-trip bit-identically to what training returns
    val (cents, cb) = Ann.ivfPqTrain(corpus, kCentroids = 16,
      subspaces = 8, codes = 16)
    val (rc, rcb) = Ann.ivfPqIndexModels(spark, path)
    assert(rc.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(rcb.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.map(_.map(_.toSeq).toSeq).toSeq)
    // the disk index answers exactly like the in-memory ADC path (which
    // the ann_ivf_pq oracle verifies)
    val mem = Ann.ivfPqTopKFrom(corpus, isQuery = $"vec_id" < 10,
        cents, cb, k = 5, nProbe = 2)
      .select($"q_id", $"n_id", $"cosine", $"rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val disk = Ann.ivfPqIndexTopK(corpus.filter($"vec_id" < 10), path,
        k = 5, nProbe = 2)
      .select($"q_id", $"n_id", $"cosine", $"rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(disk == mem)
    // probes partition-prune the codes scan — the 100 TB property
    val p = Ann.ivfPqIndexTopK(corpus.filter($"vec_id" < 2), path,
        k = 3, nProbe = 2)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val pf = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(l => l.contains("cell") &&
      (l.contains("IN") || l.contains("in("))),
      s"codes scan must carry the probed-cell IN-list:\n$p")
  }

  test("BALANCED disk index: salted sub-dirs bound partitions, cell prune intact, parity") {
    val path = java.nio.file.Files.createTempDirectory("ivfb").toString
    Ann.ivfIndexWriteTrained(corpus, path, kCentroids = 8, iters = 2,
      balanceFactor = 2.0)
    // layout: cell=N/salt=M sub-dirs; every vector present exactly once
    val cellDirs = new java.io.File(s"$path/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    assert(cellDirs.forall(_.listFiles().exists(_.getName.startsWith("salt="))))
    assert(spark.read.parquet(s"$path/cells").count() == corpus.count())
    // query side is oblivious to the salt: still prunes on cell, and
    // answers exactly like the in-memory path over the same centroids
    val cents = Ann.trainCentroidsBalanced(corpus, kCentroids = 8, iters = 2,
      balanceFactor = 2.0)
    val q = corpus.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val queryPlan = Ann.ivfIndexTopK(q, path, k = 5, nProbe = 2)
    val p = queryPlan.queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"balanced index scan must still partition-prune on cell:\n$p")
    val mem = Ann.ivfTopKFromCentroids(corpus, $"vec_id" < 10, cents,
        5, 2)
      .select($"q_id", $"n_id", $"cosine", $"rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val disk = queryPlan.select($"q_id", $"n_id", $"cosine", $"rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(disk == mem)
  }

  test("ivfIndexAppend: build-then-append holds identical contents and answers to a single-shot build") {
    val day0 = corpus.filter($"vec_id" % 5 =!= 0)
    val day1 = corpus.filter($"vec_id" % 5 === 0)
    val incPath = java.nio.file.Files.createTempDirectory("ivfinc").toString
    Ann.ivfIndexWriteTrained(day0, incPath, kCentroids = 8, iters = 2)
    Ann.ivfIndexAppend(day1, incPath)
    // single-shot twin with the SAME frozen centroids: member-predicate
    // builds share centroid provenance only if derived identically, so
    // build the full index by appending everything to an empty-but-
    // trained skeleton instead — same centroids file, full assignment
    val fullPath = java.nio.file.Files.createTempDirectory("ivffull").toString
    Ann.ivfIndexWriteTrained(day0, fullPath, kCentroids = 8, iters = 2)
    // contents parity: same (vec_id, cell) assignment everywhere
    val incRows = spark.read.parquet(s"$incPath/cells")
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    val day0Rows = spark.read.parquet(s"$fullPath/cells")
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    assert(incRows.size == corpus.count())
    assert(day0Rows.subsetOf(incRows), "append must not disturb built rows")
    // answer parity: queries against the appended index == in-memory IVF
    // from the same read-back centroids over the FULL corpus
    val cents = spark.read.parquet(s"$incPath/centroids").orderBy($"c_id")
      .collect().map(_.getAs[scala.collection.Seq[Double]]("c_vec").toArray)
    val q = corpus.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val disk = Ann.ivfIndexTopK(q, incPath, k = 5, nProbe = 2)
      .select($"q_id", $"n_id", $"cosine", $"rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val mem = Ann.ivfTopKFromCentroids(corpus, $"vec_id" < 10, cents, 5, 2)
      .select($"q_id", $"n_id", $"cosine", $"rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(disk == mem)
    // salted layouts refuse appends loudly
    val saltedPath = java.nio.file.Files.createTempDirectory("ivfsalt").toString
    Ann.ivfIndexWriteTrained(corpus, saltedPath, kCentroids = 8, iters = 2,
      balanceFactor = 2.0)
    val e = intercept[IllegalArgumentException] {
      Ann.ivfIndexAppend(day1, saltedPath)
    }
    assert(e.getMessage.contains("salted"))
  }

  test("TRAINED disk index: same layout, same partition prune, in-memory parity") {
    val path = java.nio.file.Files.createTempDirectory("ivft").toString
    Ann.ivfIndexWriteTrained(corpus, path, kCentroids = 8, iters = 2)
    val cellDirs = new java.io.File(s"$path/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 8)
    assert(spark.read.parquet(s"$path/cells").count() == corpus.count())
    val q = corpus.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val queryPlan = Ann.ivfIndexTopK(q, path, k = 5, nProbe = 2)
    val p = queryPlan.queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"trained index scan must partition-prune:\n$p")
    val mem = Ann.ivfTopKTrained(corpus, isQuery = $"vec_id" < 10, k = 5,
        nProbe = 2, kCentroids = 8, iters = 2)
      .select($"q_id", $"n_id", $"cosine", $"rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val disk = queryPlan.select($"q_id", $"n_id", $"cosine", $"rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(disk == mem)
  }

  test("warm serving handle answers exactly like per-call opens, " +
    "across batches, and close() releases the pin") {
    val path = java.nio.file.Files.createTempDirectory("ivfserve").toString
    Ann.ivfIndexWrite(corpus, isCentroid = $"vec_id" < 16, path)
    val serving = Ann.ivfServing(spark, path)
    try {
      // two disjoint "micro-batches", answered against the same handle
      Seq($"vec_id" < 5, $"vec_id" >= 5 && $"vec_id" < 10).foreach { qf =>
        val q = corpus.filter(qf)
        val cold = Ann.ivfIndexTopK(q, path, k = 5, nProbe = 2)
          .select($"q_id", $"n_id", $"cosine", $"rk")
          .as[(Long, Long, Double, Long)].collect().toSet
        val warm = Ann.ivfIndexTopKServe(q, serving, k = 5, nProbe = 2)
          .select($"q_id", $"n_id", $"cosine", $"rk")
          .as[(Long, Long, Double, Long)].collect().toSet
        assert(warm == cold)
      }
      // the handle's pinned-schema cells relation must still prune
      val p = Ann.ivfIndexTopKServe(corpus.filter($"vec_id" < 2), serving,
          k = 5, nProbe = 2)
        .queryExecution
        .explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(p.contains("PartitionFilters") && p.contains("cell"),
        s"warm-serve scan must partition-prune:\n$p")
    } finally serving.close()
    assert(serving.cent.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE)
  }
}
