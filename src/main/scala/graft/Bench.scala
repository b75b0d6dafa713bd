package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query against SPARK_GRAFT_SF_DIR and
  * prints one JSON line of per-query wall seconds. Each query executes as a
  * full action (count), so scan+shuffle+sink costs are all inside the
  * measurement. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up actions so JVM/codegen/streaming-machinery startup isn't
    // billed to the first query that happens to hit each engine path
    spark.read.parquet(s"$sfDir/region.parquet").count()
    locally {
      import org.apache.spark.sql.streaming.Trigger
      val raw = spark.read.parquet(s"$sfDir/region.parquet")
      val q = spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "region.parquet").parquet(sfDir)
        .groupBy("r_name").count()
        .writeStream.format("memory").queryName("bench_warm")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val failed = Seq.newBuilder[String]
    def timed(name: String, action: () => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      try action()
      catch { case e: Throwable =>
        // a query that dies must be VISIBLE in the bench line, not just a
        // fast-looking number
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop operator-internal caches INSIDE the measurement: a query that
      // persists pays for its own cache, and no query reads a predecessor's
      spark.catalog.clearCache()
      name -> dt
    }
    val results =
      Queries.all.map { case (name, q) =>
        timed(name, () => { q.fn(spark, sfDir).count(); () }) } ++
      // scale rehearsal: worst-case skewed corpora through the capped pair
      // generators — each skewed_* line should stay within ~2x of its
      // uniform twin above, or a cap has stopped doing its job
      operators.SkewRehearsal.queries(spark, sfDir).map { case (name, f) =>
        timed(name, () => { f(); () }) }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val fl = failed.result().map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}""")
    spark.stop()
  }
}
