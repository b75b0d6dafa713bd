package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration — the one
  * place that encodes local-vs-cluster knobs so every entry point (CLI,
  * Verify, Bench, user code) starts from the same baseline. */
object Engine {

  /** Build a session. `master` defaults to `SPARK_MASTER` env or
    * local[SPARK_GRAFT_CPUS]; on a real cluster pass the cluster master (or
    * rely on spark-submit) — shuffle partitions should then be sized to
    * roughly 2-3× total executor cores, which callers can override via
    * `shufflePartitions`. */
  def session(appName: String = "graft",
              shufflePartitions: Option[Int] = None): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = shufflePartitions.map(_.toString).getOrElse(cpus)
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName(appName)
      .withExtensions(new GraftExtensions) // custom planner strategies at build
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
