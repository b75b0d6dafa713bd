package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch tool (r21 optimization round): dump `.explain("formatted")`
  * for a comma-separated list of declared queries into an output dir —
  * the plans/r21 before/after evidence. Not part of the library surface.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <names>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, namesCsv) = args.take(4)
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.Engine.applyJoinStrategy(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      graft.Queries.all.find(_._1 == n) match {
        case Some((_, q)) =>
          try {
            val df = q.fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[explain] wrote $n ($suffix)")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $n FAILED: ${e.getMessage}")
          }
        case scala.None =>
          System.err.println(s"[explain] unknown query: $n")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
