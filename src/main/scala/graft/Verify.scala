package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query-name filter]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else scala.None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A thrown query must be VISIBLE in the artifact, not just stderr: round 9
    // lost 16 queries because failures were only logged and the driver read
    // "every dir present passed" as "everything passed". On failure we write
    // <outDir>/<name>/_FAILED (so the dir exists but is not readable parquet —
    // the driver's compare records an err row instead of silently skipping)
    // and collect everything into <outDir>/errors.json.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // per-query session isolation: a fresh SessionState (catalog, temp
      // views, session conf) per query, so a leaked temp view or conf
      // change in one query can never silently feed another's plan. The
      // SparkContext and cache manager stay shared — the cache-leak gate
      // below still sees everything.
      val sess = spark.newSession()
      try fn(sess, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(2000)}"
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg
        val d = Paths.get(s"$outDir/$name")
        Files.createDirectories(d)
        Files.writeString(d.resolve("_FAILED"), msg)
      }
      // operator-internal persist()s (minhash/simhash signature caches) are
      // per-corpus; queries run once each here, so drop them eagerly rather
      // than letting 64 caches accumulate until LRU eviction
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
    // enforce the operator cache-lifecycle contract (NearDup and friends
    // persist() internally and document session-managed cleanup): if any
    // query leaked a cached frame past its clearCache(), fail the run —
    // at 100 TB a leaked cache is executor memory gone for the session
    if (!spark.sharedState.cacheManager.isEmpty) {
      System.err.println("[verify] FATAL: cache manager non-empty at exit " +
        "— an operator leaked a persisted frame past its lifecycle")
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
