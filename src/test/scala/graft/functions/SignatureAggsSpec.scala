package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The compact imperative aggregates must be VALUE-identical to the
  * declarative forms they replaced (the oracle SQL still computes those). */
class SignatureAggsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("MinhashSigAgg equals the per-slot min() construction") {
    import spark.implicits._
    val P = TextFunctions.MinhashP
    val perms = (0 until 32).map(TextFunctions.minhashPerm)
    val hv = Seq((1L, 17L), (1L, 990001L), (1L, 2147483646L),
        (2L, 0L), (2L, 5L), (3L, 123456789L))
      .toDF("doc_id", "h")
    val compact = hv.groupBy($"doc_id")
      .agg(MinhashSigAgg($"h", perms, P).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val declared = hv.groupBy($"doc_id").agg(
        min((lit(perms.head._1) * $"h" + lit(perms.head._2)) % P).as("s0"),
        perms.zipWithIndex.tail.map { case ((a, b), i) =>
          min((lit(a) * $"h" + lit(b)) % P).as(s"s$i")
        }: _*)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong(_))).toMap
    assert(compact.keySet == declared.keySet)
    compact.foreach { case (id, sig) => assert(sig == declared(id), s"doc $id") }
  }

  test("MinhashSigAgg: all-null group evaluates to null, like min()") {
    import spark.implicits._
    val perms = (0 until 4).map(TextFunctions.minhashPerm)
    val hv = Seq((1L, Some(9L)), (2L, None)).toDF("doc_id", "h")
    val rows = hv.groupBy($"doc_id")
      .agg(MinhashSigAgg($"h", perms, TextFunctions.MinhashP).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows == Map(1L -> false, 2L -> true))
  }

  test("SimhashAgg equals the per-bit sum majority construction") {
    import spark.implicits._
    val bits = 60
    val hv = Seq((1L, Some(0x0f0f0f0fL)), (1L, Some(0xff00ff00L)),
        (1L, Some(0x0ff00ff0L)), (2L, Some((1L << 59) | 7L)),
        (3L, None: Option[Long]))  // doc with only a null row -> 0 signature
      .toDF("doc_id", "h")
    val compact = hv.groupBy($"doc_id")
      .agg(SimhashAgg($"h", bits).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val declared = hv.groupBy($"doc_id").agg(
        count($"h").as("_n"),
        (0 until bits).map(j =>
          sum(shiftright($"h", j).bitwiseAND(lit(1L))).as(s"_c$j")): _*)
      .select($"doc_id",
        (0 until bits).map { j =>
          when(coalesce(col(s"_c$j"), lit(0L)) * 2 > $"_n",
            shiftleft(lit(1L), j)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compact == declared)
    assert(compact(3L) == 0L)
  }

  test("partial aggregation path: many partitions merge to the same values") {
    import spark.implicits._
    val perms = (0 until 8).map(TextFunctions.minhashPerm)
    val base = (1 to 500).map(i => ((i % 7).toLong, (i * 1046527L) % 2147483647L))
    val one = base.toDF("doc_id", "h").coalesce(1)
    val many = base.toDF("doc_id", "h").repartition(13)
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy($"doc_id")
      .agg(MinhashSigAgg($"h", perms, TextFunctions.MinhashP).as("sig"),
        SimhashAgg($"h", 60).as("sh"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(run(one) == run(many))
  }
}
