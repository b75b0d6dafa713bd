package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bucketed-table contract: two tables written
  * `bucketBy(same n, join key)` equi-join WITHOUT either side shuffling
  * (the scan's bucket spec satisfies the join's distribution
  * requirement), and the downstream aggregation on the same key rides
  * the same partitioning. This is the co-located-join path a 100 TB
  * fact/fact join depends on — the shuffle it removes is the dominant
  * cost at that scale, so the property must not silently regress. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)

  test("bucketed-to-bucketed equi-join and keyed agg plan with zero shuffles") {
    val root = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val orders = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice")
    val items = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    try {
      Sinks.bucketedParquet(orders, "b_orders", Seq("o_orderkey"), 8,
        location = Some(s"$root/b_orders"))
      Sinks.bucketedParquet(items, "b_items", Seq("l_orderkey"), 8,
        location = Some(s"$root/b_items"))
      // merge hints force the sort-merge path: at this sf the tables fit
      // the broadcast threshold, which would hide the property under test
      val joined = spark.table("b_orders").hint("merge")
        .join(spark.table("b_items").hint("merge"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("tp"))
      val p = planOf(joined)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")
      // same query over the raw (unbucketed) parquet MUST shuffle — proves
      // the assertion above is the bucketing at work, not plan trivia
      val plain = orders.hint("merge")
        .join(items.hint("merge"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("tp"))
      assert(planOf(plain).contains("Exchange hashpartitioning"),
        "control query unexpectedly shuffle-free")
      // and the results are identical
      val got = joined.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      val want = plain.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(got == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
