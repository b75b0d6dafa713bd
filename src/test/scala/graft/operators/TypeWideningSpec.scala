package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Widening-cast matrix — mirrors the reference's Value upcast tests
  * (mycelial `section/src/message.rs:590-917`): widening conversions are
  * value-preserving; narrowing/lossy casts do not silently corrupt
  * (they null out under try semantics, or error under ANSI).
  * Samples are seeded (deterministic), spanning extremes and random draws. */
class TypeWideningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val intSamples =
    Seq(Int.MinValue, -1, 0, 1, Int.MaxValue) ++ Seq.fill(50)(rnd.nextInt())
  private val longSamples =
    Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue) ++ Seq.fill(50)(rnd.nextLong())

  test("int → long widening preserves every value") {
    val df = intSamples.toDF("v")
    val back = Transforms.typecast("v", "int")(df).select("v").as[Long].collect()
    assert(back.sorted.sameElements(intSamples.map(_.toLong).sorted))
  }

  test("long → string renders exactly") {
    val df = longSamples.toDF("v")
    val s = Transforms.typecast("v", "string")(df).select("v").as[String].collect()
    assert(s.sorted.sameElements(longSamples.map(_.toString).toArray.sorted))
  }

  test("string digits → long round-trips; lossy strings do not silently coerce") {
    val good = Seq("1", "-42", "0").toDF("v")
    assert(Transforms.typecast("v", "int")(good).as[Long].collect().sorted
      .sameElements(Array(-42L, 0L, 1L)))
    // lossy: governed by ANSI mode — either an error (ANSI, the reference's
    // error-on-lossy parity) or null (legacy); never a wrong value
    val bad = Seq("1", "foo").toDF("v")
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    try {
      val out = Transforms.typecast("v", "int")(bad).collect()
      assert(ansi == "false")
      assert(out.map(r => Option(r.get(0))).count(_.isEmpty) == 1)
    } catch {
      case _: Throwable => assert(ansi == "true")
    }
  }

  test("integer-valued longs widen to exact doubles") {
    val xs = Seq.fill(50)(rnd.nextInt(2000000) - 1000000L) :+ 0L
    val d = Transforms.typecast("v", "real")(xs.toDF("v")).select("v").as[Double].collect()
    assert(d.sorted.sameElements(xs.map(_.toDouble).toArray.sorted))
  }
}
