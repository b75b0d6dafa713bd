package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (r22): sub-phase segmentDedup's ~1.8 s inside
  * cp_assembly — is it the DOUBLE tokenize+explode (boiler agg and kept
  * anti-join each re-derive `segs` from the raw scan), the per-doc
  * reassembly shuffle, or the third tokenize for `_ntok`?
  * Usage: runMain graft.tools.SegProfile <sfDir>
  */
object SegProfile {
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[seg] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val segWords = 8
    val ts = graft.functions.TextFunctions.tokens(col("text"))
    val nSeg = ceil(size(ts) / lit(segWords.toDouble)).cast("int")
    val segArr = when(nSeg > 0,
        transform(sequence(lit(0), nSeg - 1),
          i => concat_ws(" ", slice(ts, i * segWords + 1, lit(segWords)))))
      .otherwise(array().cast("array<string>"))
    val segs = docs.select(col("doc_id"), posexplode(segArr))
      .withColumnRenamed("pos", "seg_idx").withColumnRenamed("col", "seg")
    (1 to 3).foreach { i =>
      println(s"--- iteration $i")
      time("tokenize only (noop)") { noop(docs.select(ts.as("t"))) }
      time("ntok only size(tokens) (noop)") { noop(docs.select(size(ts).as("n"))) }
      time("ntok regexp_count (noop)") {
        val t = trim(col("text"))
        noop(docs.select(when(t === "", 0)
          .otherwise(regexp_count(t, lit("\\s+")) + 1).as("n")))
      }
      time("segs explode pass (noop)") { noop(segs) }
      time("boiler agg (from segs, noop)") {
        noop(segs.groupBy(col("seg"))
          .agg(countDistinct(col("doc_id")).as("_df"))
          .filter(col("_df") > 2).select(col("seg")))
      }
      time("full segmentDedup (noop)") {
        noop(graft.operators.Corpus.segmentDedup(docs, segWords = 8, maxDf = 2))
      }
    }
    spark.stop()
  }
}
