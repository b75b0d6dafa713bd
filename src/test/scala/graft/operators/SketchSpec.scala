package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approximate-aggregate (sketch) surface a 100 TB engine leans on
  * when exact answers don't pay: HyperLogLog++ distinct counts and
  * Greenwald-Khanna quantile sketches. Both are Spark built-ins — single
  * pass, partial+final mergeable, constant memory — verified here against
  * the exact computation within their documented error bounds (sketches
  * are engine-specific by construction, so this is spec-level rather than
  * a DuckDB oracle row; the EXACT counterparts are oracle-verified as
  * ta_vocab and q19_percentiles). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HLL++ distinct shingle count within the configured rsd of exact") {
    val hv = Tables.documents(spark, TestSpark.sf)
      .select(explode(graft.functions.WordNgramHashes($"text", 3)).as("h"))
    val exact = hv.select(countDistinct($"h")).head().getLong(0)
    val approx = hv.select(approx_count_distinct($"h", rsd = 0.02))
      .head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    // 0.02 rsd → 3 sigma bound 6%
    assert(err < 0.06, s"exact=$exact approx=$approx err=$err")
  }

  test("quantile sketch brackets the exact median within the accuracy bound") {
    val toks = Tables.documents(spark, TestSpark.sf)
      .select(graft.functions.TextFunctions.tokenCount($"text")
        .cast("double").as("n"))
    val exact = toks.select(percentile($"n", lit(0.5))).head().getDouble(0)
    val approx = toks
      .select(percentile_approx($"n", lit(0.5), lit(1000)))
      .head().getDouble(0)
    // GK sketch with accuracy 1000 → rank error 1/1000; token counts are
    // small integers, so the approximate median lands within one token
    assert(math.abs(approx - exact) <= 1.0, s"exact=$exact approx=$approx")
  }

  test("sketches re-aggregate: per-group sketch counts stay consistent with one-shot") {
    val hv = Tables.documents(spark, TestSpark.sf)
      .select(($"doc_id" % 4).as("part"),
        explode(graft.functions.WordNgramHashes($"text", 3)).as("h"))
    val oneShot = hv.select(approx_count_distinct($"h", rsd = 0.02))
      .head().getLong(0)
    // group → per-group sketches → re-aggregate: same HLL registers merge,
    // the distributive property partial+final aggregation relies on
    val merged = hv.groupBy($"part")
      .agg(approx_count_distinct($"h", rsd = 0.02).as("d"))
      .select(sum($"d")).head().getLong(0)
    // per-group distinct sums OVERCOUNT shared values across groups — the
    // check is that each path is consistent and plausible, not equal
    assert(merged >= oneShot)
  }
}
