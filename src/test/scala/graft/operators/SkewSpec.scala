package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals plain inner join, spread over salt buckets") {
    // skewed: 90% of left rows share one key
    val left = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex
      .toDF("k", "w")
    val plain = left.join(right, Seq("k")).select("k", "v", "w")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(left, right, Seq("k"), buckets = 8)
      .select("k", "v", "w").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("hash60 native expression matches the conv/md5 formulation") {
    val df = Seq("abc", "", "the quick brown fox", "日本語テキスト").toDF("s")
    val native = df.select(graft.functions.TextFunctions.hash60($"s")).as[Long].collect()
    val viaConv = df.select(
      conv(substring(md5($"s"), 1, 15), 16, 10).cast("long")).as[Long].collect()
    assert(native.sameElements(viaConv))
  }

  test("observed attaches metrics without changing the frame") {
    val df = Seq(("a", Some(1)), ("b", None)).toDF("k", "v")
    val out = Transforms.observed("tap", Some("v"))(df)
    assert(out.count() == 2)
    assert(out.columns.sameElements(df.columns))
  }
}
