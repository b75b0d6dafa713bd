package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming online ANN serving (`ann_stream_query_destination`): query
  * micro-batches answered against the on-disk IVF index must assemble
  * to exactly the batch answer, and checkpointed replays must not
  * duplicate rows (the (q_id, n_id) idempotent append). */
class AnnStreamServeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(ids: Range): Seq[(Long, Seq[Double])] =
    ids.map { i =>
      (i.toLong, (0 until 8).map(d =>
        math.sin(i * 0.7 + d * 1.3) + (if (d == i % 8) 2.0 else 0.0)).toSeq)
    }

  // one flat parquet file per intended micro-batch, mtime-ordered
  private def writeFlat(root: String, name: String, mtime: Long,
                        rows: Seq[(Long, Seq[Double])]): Unit = {
    new java.io.File(s"$root/in").mkdirs()
    val tmp = s"$root/tmp_$name"
    rows.toDF("vec_id", "embedding").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$root/in/$name.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    dst.setLastModified(mtime)
  }

  private def specJson(root: String, variant: String = "ivf"): String =
    s"""{"sections":[
      {"id":"src","name":"stream_parquet_source","config":{
        "path":"$root/in","glob":"*.parquet","max_files_per_trigger":"1"}},
      {"id":"serve","name":"ann_stream_query_destination","config":{
        "index":"$root/idx","path":"$root/out","variant":"$variant",
        "checkpoint":"$root/ckpt","k":"3","probes":"2",
        "restart_backoff_ms":"100"}}],
      "edges":[["src","serve"]]}"""

  test("micro-batched serving equals the batch answer; replay adds nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft_annsv").toString
    val corpus = vecs(0 until 50).toDF("vec_id", "embedding")
    graft.operators.Ann.ivfIndexWriteTrained(corpus, s"$root/idx",
      kCentroids = 4, iters = 3, seed = "ivf")
    val queries = vecs(0 until 6)
    val now = System.currentTimeMillis()
    writeFlat(root, "q1", now - 60000, queries.take(3))
    writeFlat(root, "q2", now, queries.drop(3))
    graft.plans.PipelineCompiler.run(spark,
      graft.plans.PipelineSpec.fromJson(specJson(root)))
    val got = spark.read.parquet(s"$root/out")
      .select("q_id", "n_id", "cosine", "rk")
      .as[(Long, Long, Double, Long)].collect().sorted.toSeq
    val want = graft.operators.Ann.ivfIndexTopK(
        queries.toDF("vec_id", "embedding"), s"$root/idx", k = 3, nProbe = 2)
      .select("q_id", "n_id", "cosine", "rk")
      .as[(Long, Long, Double, Long)].collect().sorted.toSeq
    assert(got == want,
      "streamed micro-batch serving drifted from the batch answer")
    // a NEW batch re-serving an already-answered query replays its rows
    // into the idempotent append — nothing duplicates
    writeFlat(root, "q3", now + 60000, queries.take(1))
    graft.plans.PipelineCompiler.run(spark,
      graft.plans.PipelineSpec.fromJson(specJson(root)))
    val after = spark.read.parquet(s"$root/out")
      .select("q_id", "n_id", "cosine", "rk")
      .as[(Long, Long, Double, Long)].collect().sorted.toSeq
    assert(after == want, "replayed query rows duplicated in the sink")
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("ivf_pq variant serves a persisted IVF-PQ index codes-only") {
    val root = java.nio.file.Files.createTempDirectory("graft_annsvpq").toString
    val corpus = vecs(0 until 60).toDF("vec_id", "embedding")
    graft.operators.Ann.ivfPqIndexWrite(corpus, s"$root/idx",
      kCentroids = 4, subspaces = 4, codes = 8)
    val queries = vecs(0 until 4)
    writeFlat(root, "q1", System.currentTimeMillis(), queries)
    graft.plans.PipelineCompiler.run(spark,
      graft.plans.PipelineSpec.fromJson(specJson(root, variant = "ivf_pq")))
    val got = spark.read.parquet(s"$root/out")
      .select("q_id", "n_id", "cosine", "rk")
      .as[(Long, Long, Double, Long)].collect().sorted.toSeq
    val want = graft.operators.Ann.ivfPqIndexTopK(
        queries.toDF("vec_id", "embedding"), s"$root/idx", k = 3, nProbe = 2)
      .select("q_id", "n_id", "cosine", "rk")
      .as[(Long, Long, Double, Long)].collect().sorted.toSeq
    assert(got.nonEmpty && got == want,
      "streamed PQ-index serving drifted from the batch answer")
    // an unknown variant is rejected at compile, not silently defaulted
    val bad = intercept[Exception] {
      graft.plans.PipelineCompiler.run(spark,
        graft.plans.PipelineSpec.fromJson(specJson(root, variant = "nope")))
    }
    assert(bad.getMessage != null && bad.getMessage.contains("variant"),
      s"unexpected: ${bad.getMessage}")
  }
}
