package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (r22): phase the cp_assembly composition with the
  * noop sink (guide §1.4 — the split bench lines use count(), which lets
  * the optimizer prune the expensive text columns, under-reporting the
  * clean phase) so the full line's ~4 s is attributable per stage.
  * Usage: runMain graft.tools.AssemblyProfile <sfDir>
  */
object AssemblyProfile {
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
    import spark.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Double = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      println(f"[asm] $name%-28s $dt%7.3f s")
      dt
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val rates = Seq("en" -> 0.8, "de" -> 0.5, "es" -> 0.25,
      "fr" -> 0.5, "zh" -> 0.1)
    val tmp = java.nio.file.Files.createTempDirectory("asm_prof").toString
    (1 to 3).foreach { i =>
      println(s"--- iteration $i")
      // full line, as declared (for reference)
      time("full cp_assembly") {
        noop(graft.Queries.all.find(_._1 == "cp_assembly").get._2
          .fn(spark, sfDir))
        spark.catalog.clearCache()
      }
      // phases, each consuming the STAGED predecessor, noop-sunk
      time("clean (segmentDedup noop)") {
        graft.operators.Corpus.segmentDedup(docs, segWords = 8, maxDf = 2)
          .select($"doc_id", $"clean_text".as("text"))
          .write.mode("overwrite").parquet(s"$tmp/cleaned")
      }
      val cleaned = spark.read.parquet(s"$tmp/cleaned")
      time("survivors (from staged)") {
        graft.operators.NearDup.survivors(cleaned).select($"doc_id")
          .write.mode("overwrite").parquet(s"$tmp/surv")
      }
      val surv = spark.read.parquet(s"$tmp/surv")
      val candidates = cleaned.join(surv, "doc_id")
        .join(docs.select($"doc_id", $"lang"), "doc_id")
      time("mix (from staged)") {
        graft.operators.Corpus.mixWeighted(candidates, rates, keepCols = true)
          .select($"doc_id", $"text")
          .write.mode("overwrite").parquet(s"$tmp/mixed")
      }
      val mixed = spark.read.parquet(s"$tmp/mixed")
      time("pack+order (from staged)") {
        noop(graft.operators.Corpus.packSequences(mixed, budget = 256)
          .orderBy($"doc_id"))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
