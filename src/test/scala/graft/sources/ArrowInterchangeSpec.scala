package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Arrow IPC shard round-trips: every supported type survives
  * bit-exactly (timestamps at micros, floats element-exact), nulls at
  * row and list-element level, batch boundaries invisible, one shard
  * per partition. */
class ArrowInterchangeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  test("all supported types + nulls round-trip exactly") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("t", TimestampType), StructField("bin", BinaryType),
      StructField("vf", ArrayType(FloatType)),
      StructField("vd", ArrayType(DoubleType))))
    val rows = Seq(
      Row(1L, 10, 1.5, 2.5f, "héllo\nworld", true,
        ts("2024-03-01 12:34:56.789123"), Array[Byte](1, 2, -3),
        Seq(1.0f, -2.25f), Seq(3.5, 4.5)),
      Row(2L, null, null, null, "", false, null, null,
        Seq(null, 7.5f), null),
      Row(null, 30, Double.MinPositiveValue, Float.MaxValue, "日本語", null,
        ts("1969-12-31 23:59:59.000001"), Array.empty[Byte],
        Seq.empty[Float], Seq(0.0)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJavaList), schema)
    val dir = Files.createTempDirectory("arrow_rt").toString
    ArrowInterchange.writeArrow(df, dir)
    val back = ArrowInterchange.readArrow(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val a = df.collect().map(normalize).toSet
    val b = back.collect().map(normalize).toSet
    assert(a == b, s"round-trip changed rows:\n  in: $a\n  out: $b")
  }

  private def normalize(r: Row): Seq[Any] =
    r.toSeq.map {
      case bytes: Array[Byte] => bytes.toSeq
      case x => x
    }

  private implicit class SeqRows(s: Seq[Row]) {
    def asJavaList: java.util.Collection[Row] = {
      val l = new java.util.ArrayList[Row](s.size); s.foreach(l.add); l
    }
  }

  test("multi-batch + multi-partition: one shard per partition, order-free content parity") {
    val df = spark.range(0, 10000).select(
      $"id", ($"id" * 2.5).as("x"),
      concat(lit("doc_"), $"id").as("name")).repartition(7)
    val dir = Files.createTempDirectory("arrow_mp").toString
    ArrowInterchange.writeArrow(df, dir, batchRows = 128) // many batches/shard
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow"))
    assert(shards.length == 7, s"expected 7 shards, got ${shards.length}")
    val back = ArrowInterchange.readArrow(spark, dir)
    assert(back.count() == 10000)
    assert(back.agg(sum($"id"), sum($"x")).head() ==
      df.agg(sum($"id"), sum($"x")).head())
    assert(back.filter($"name" === "doc_9999").count() == 1)
  }

  private def concat(cols: org.apache.spark.sql.Column*) =
    org.apache.spark.sql.functions.concat(cols: _*)
  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)
  private def sum(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.sum(c)

  test("early-terminating consumer (LIMIT) leaves no leaked reader") {
    val df = spark.range(0, 5000).select($"id", ($"id" * 1.5).as("x"))
      .repartition(2)
    val dir = Files.createTempDirectory("arrow_limit").toString
    ArrowInterchange.writeArrow(df, dir, batchRows = 64)
    // LIMIT stops the row iterator mid-shard; the task-completion
    // listener must close the reader/allocator (an unclosed Arrow
    // allocator throws on child-allocator close at JVM checks)
    val got = ArrowInterchange.readArrow(spark, dir).limit(5).collect()
    assert(got.length == 5)
    // and a full re-read of the same shards still works afterwards
    assert(ArrowInterchange.readArrow(spark, dir).count() == 5000)
  }

  test("unsupported types fail fast at write time") {
    val df = spark.range(3).select($"id",
      org.apache.spark.sql.functions.struct($"id").as("nested"))
    val dir = Files.createTempDirectory("arrow_bad").toString
    val e = intercept[IllegalArgumentException] {
      ArrowInterchange.writeArrow(df, dir)
    }
    assert(e.getMessage.contains("unsupported"))
  }
}
