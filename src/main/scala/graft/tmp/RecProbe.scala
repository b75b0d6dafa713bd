package graft.tmp
import org.apache.spark.sql.SparkSession
object RecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.sql(
        """WITH RECURSIVE r(n, s) AS (
          SELECT 1, 1
          UNION ALL
          SELECT n + 1, s + n + 1 FROM r WHERE n < 5)
          SELECT * FROM r ORDER BY n""")
      df.show()
      println("RECURSIVE_OK")
    } catch { case e: Throwable => println(s"RECURSIVE_FAIL: ${e.getMessage.take(200)}") }
    spark.stop()
  }
}
