package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch A/B (r22, guide §6): time a list of declared queries under the
  * default parquet codec (snappy) vs zstd, same JVM, alternating, min of 3.
  * Aimed at the lines that write+read stores inside the timed body
  * (signature index build/absorb/compact, ANN index stores, staged
  * assembly) — codec choice is results-neutral (the oracle compares rows,
  * not files), so this is purely a time/bytes trade.
  * Usage: runMain graft.tools.CodecAB <sfDir> <names>
  */
object CodecAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tuned = spark.newSession()
    tuned.conf.set("spark.sql.parquet.compression.codec", "zstd")
    def time(ss: SparkSession, name: String): Double = {
      val q = graft.Queries.all.find(_._1 == name).get._2
      val t0 = System.nanoTime()
      q.fn(ss, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      ss.catalog.clearCache()
      dt
    }
    names.foreach { n =>
      // warm both paths once, then min of 3 alternating
      time(spark, n); time(tuned, n)
      val d = (1 to 3).map(_ => time(spark, n)).min
      val t = (1 to 3).map(_ => time(tuned, n)).min
      println(f"[ab] $n%-28s snappy $d%7.3f s   zstd $t%7.3f s   ratio ${t / d}%5.2f")
    }
    spark.stop()
  }
}
