package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (r22): shingle document-frequency distribution — how many
  * posting rows does the df>=2 keep-list prune actually remove?
  * Usage: runMain graft.tools.DfDist <sfDir>
  */
object DfDist {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val hv = graft.operators.NearDup.ngramHashRows(docs)
    val dfreq = hv.groupBy($"h").agg(count(lit(1)).as("_df"))
    dfreq.groupBy(
      when($"_df" === 1, "df=1").when($"_df" === 2, "df=2")
        .when($"_df" <= 10, "df 3-10").when($"_df" <= 1000, "df 11-1000")
        .otherwise("df>1000 (stop)").as("bucket"))
      .agg(count(lit(1)).as("distinct_shingles"), sum($"_df").as("posting_rows"))
      .orderBy($"bucket").show(20, false)
    spark.stop()
  }
}
