package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (r22): phase st_ann_topk — index build vs query
  * staging vs the 3-trigger streaming serve — to decide whether warm
  * model serving (pinning the centroid frame across triggers) is worth
  * an operator change or the line should be documented as-is.
  * Usage: runMain graft.tools.StAnnProfile <sfDir>
  */
object StAnnProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.applyJoinStrategy(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[stann] $name%-28s $dt%7.3f s")
      dt
    }
    (1 to 3).foreach { i =>
      println(s"--- iteration $i")
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      import ss.implicits._
      val e = graft.Tables.embeddings(ss, sfDir).select($"vec_id", $"embedding")
      val root = java.nio.file.Files.createTempDirectory("stann_prof").toString
      val idx = s"$root/idx"
      time("index build (trained)") {
        graft.operators.Ann.ivfIndexWriteTrained(e, idx,
          kCentroids = 16, iters = 5, seed = "ivf")
      }
      val qDir = s"$root/q"
      time("query staging") {
        e.filter($"vec_id" < 10)
          .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
          .repartition(3, $"vec_id")
          .write.mode("overwrite").parquet(qDir)
      }
      val out = s"$root/out/data"
      val ck = s"$root/ck"
      time("stream serve (3 triggers)") {
        val qs = ss.readStream.schema(ss.read.parquet(qDir).schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet").parquet(qDir)
        val writer = graft.streaming.StreamingPipelines.ackSink(qs, ck,
          org.apache.spark.sql.streaming.OutputMode.Append()) { (batch, _) =>
          graft.sources.Sinks.idempotentParquetAppend(
            graft.operators.Ann.ivfIndexTopK(batch, idx, k = 5, nProbe = 2),
            out, Seq("q_id", "n_id"))
        }
        graft.streaming.StreamingPipelines.runToCompletion(writer)
      }
      val out2 = s"$root/out2/data"
      val ck2 = s"$root/ck2"
      time("stream serve WARM handle") {
        val qs = ss.readStream.schema(ss.read.parquet(qDir).schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet").parquet(qDir)
        val serving = graft.operators.Ann.ivfServing(ss, idx)
        val writer = graft.streaming.StreamingPipelines.ackSink(qs, ck2,
          org.apache.spark.sql.streaming.OutputMode.Append()) { (batch, _) =>
          graft.sources.Sinks.idempotentParquetAppend(
            graft.operators.Ann.ivfIndexTopKServe(batch, serving,
              k = 5, nProbe = 2),
            out2, Seq("q_id", "n_id"))
        }
        try graft.streaming.StreamingPipelines.runToCompletion(writer)
        finally serving.close()
      }
      time("parity check (sorted collect)") {
        val a = ss.read.parquet(out).orderBy(col("q_id"), col("rk"),
          col("n_id")).collect().toSeq
        val b = ss.read.parquet(out2).orderBy(col("q_id"), col("rk"),
          col("n_id")).collect().toSeq
        require(a == b, s"warm-serve parity broken: ${a.size} vs ${b.size}")
      }
      time("one batch ivfIndexTopK") {
        graft.operators.Ann.ivfIndexTopK(
          ss.read.parquet(qDir).limit(4), idx, k = 5, nProbe = 2).count()
        ()
      }
      time("read-back + order") {
        ss.read.parquet(out)
          .select($"q_id", $"n_id", $"cosine", $"rk")
          .orderBy($"q_id", $"rk").count()
        ()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
