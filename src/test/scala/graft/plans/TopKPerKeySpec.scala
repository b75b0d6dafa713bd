package graft.plans

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topK per key equals window row_number filter (total order)") {
    val df = graft.Tables.lineitem(spark, TestSpark.sf)
      .select($"l_suppkey", $"l_orderkey", $"l_extendedprice")
    val viaWindow = df.withColumn("rn", row_number().over(
        Window.partitionBy($"l_suppkey")
          .orderBy($"l_extendedprice".desc, $"l_orderkey")))
      .filter($"rn" <= 5).drop("rn")
      .collect().map(_.toString).sorted
    val viaTopK = TopKPerKey(df, Seq("l_suppkey"),
        Seq(TopKPerKey.desc("l_extendedprice"), TopKPerKey.asc("l_orderkey")), 5)
      .collect().map(_.toString).sorted
    assert(viaTopK.length == viaWindow.length)
    assert(viaTopK.sameElements(viaWindow))
  }

  test("k larger than group size returns whole groups") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = TopKPerKey(df, Seq("k"), Seq(TopKPerKey.asc("v")), 10)
    assert(out.count() == 3)
  }

  test("GraftExtensions injects TopKStrategy at session build (spark.sql.extensions path)") {
    import org.apache.spark.sql.SparkSession
    // build a SECOND session over the same SparkContext with the extensions
    // conf: clear the active/default session so getOrCreate constructs a
    // fresh one (instead of returning the shared test session), restore
    // after; never stop s2 — the SparkContext is shared
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions = what spark.sql.extensions does after instantiating
      // the class (the conf itself is static and fixed at SparkContext
      // creation, so it can't be exercised on the shared test context)
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark, "expected a fresh session")
      assert(s2.sessionState.planner.strategies.contains(TopKStrategy),
        "injected strategy not visible in the session planner")
      assert(!spark.sessionState.planner.strategies.contains(TopKStrategy) ||
             spark.experimental.extraStrategies.contains(TopKStrategy),
        "strategy must come from the extension, not leak from elsewhere")
    } finally {
      prev.foreach(SparkSession.setDefaultSession)
      SparkSession.setActiveSession(spark)
    }
  }

  test("physical plan contains partial and final TopKPerKeyExec with one exchange between") {
    val df = graft.Tables.orders(spark, TestSpark.sf)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val out = TopKPerKey(df, Seq("o_custkey"),
      Seq(TopKPerKey.desc("o_totalprice"), TopKPerKey.asc("o_orderkey")), 2)
    val plan = out.queryExecution.executedPlan.toString
    val nodes = "TopKPerKey ".r.findAllIn(plan).size
    assert(nodes == 2, s"expected partial+final TopKPerKey nodes:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_custkey"),
      s"expected key shuffle between partial and final:\n$plan")
  }
}
