package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + sanity for the whole declared query surface at sf0.001. The real
  * correctness gate is the DuckDB oracle (tools/check.py at sf0.01); this
  * keeps `sbt test` honest about every entry running and returning the
  * declared shape. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // queries that legitimately may return zero rows at sf0.001
  private val mayBeEmpty = Set("dd_embed_cosine", "dd_minhash_lsh", "q11_anti_join")

  Queries.all.foreach { case (name, q) =>
    test(s"$name runs and is well-formed") {
      val df = q.fn(spark, TestSpark.sf)
      assert(df.columns.nonEmpty, "no columns")
      assert(df.columns.distinct.length == df.columns.length, "duplicate column names")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("cp_mix_temperature oracle renders driver-computed thresholds as literals") {
    // after the query runs (Verify's ordering), the oracle must carry the
    // JVM-pow thresholds as VALUES literals — never re-derive them through
    // DuckDB's pow, whose last-ulp behavior can differ on .5 boundaries
    Queries.all.toMap.apply("cp_mix_temperature").fn(spark, TestSpark.sf).count()
    val sql = SparkEntry.oracleSql("cp_mix_temperature")
    assert(sql.contains("VALUES"), sql)
    assert(!sql.contains("pow("), sql)
  }
}
