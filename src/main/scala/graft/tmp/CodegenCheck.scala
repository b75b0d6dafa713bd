package graft.tmp

import graft.functions.VectorFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: prove multiple ArrayDotProduct calls in one projection compile
  * under whole-stage codegen (CODEGEN_FACTORY_MODE=CODEGEN_ONLY would throw
  * on janino compile failure; also scan the generated code path). */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
                 (Array(0.5f, -1.0f), Array(2.0f, 2.0f)))
      .toDF("a", "b")
    // l2Distance computes three dot products → three acc vars in one method
    val out = df.select(
      VectorFunctions.dot($"a", $"b").as("d"),
      VectorFunctions.l2Distance($"a", $"b").as("l2"),
      VectorFunctions.dot($"a", $"a").as("aa"))
    out.collect().foreach(println)
    println("CODEGEN_OK")
    spark.stop()
  }
}
