package graft.sources

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: ANY frame over the supported type set — random schema,
  * random rows, nulls anywhere legal — survives the Arrow IPC round-trip
  * value-exactly. Complements ArrowInterchangeSpec's fixed cases with
  * shapes nobody thought to write down (the GraphPropertiesSpec
  * discipline applied to the interchange boundary). Case count kept
  * small: every case runs two Spark jobs. */
object ArrowPropertiesSpec extends Properties("ArrowInterchange") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val genField: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, DoubleType, FloatType, StringType, BooleanType,
    BinaryType, TimestampType, ArrayType(FloatType), ArrayType(DoubleType))

  private def genValue(dt: DataType): Gen[Any] = {
    val base: Gen[Any] = dt match {
      case LongType => Gen.choose(Long.MinValue, Long.MaxValue)
      case IntegerType => Gen.choose(Int.MinValue, Int.MaxValue)
      case DoubleType => Gen.oneOf(Gen.choose(-1e12, 1e12),
        Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1.5e300))
      case FloatType => Gen.choose(-1e6f, 1e6f)
      case StringType => Gen.oneOf(Gen.alphaNumStr.map(_.take(40)),
        Gen.const("日本語\nüñî\tcode"), Gen.const(""))
      case BooleanType => Gen.oneOf(true, false)
      case BinaryType => Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.take(32).toArray)
      case TimestampType => Gen.choose(-62135596800000L, 253402300799000L)
        .map { ms =>
          val t = new java.sql.Timestamp(ms)
          t.setNanos((math.abs(ms) % 1000).toInt * 1000000 +
            (math.abs(ms) % 997).toInt * 1000) // micros survive, nanos don't exist here
          t
        }
      case ArrayType(et, _) =>
        Gen.choose(0, 6).flatMap(n => Gen.listOfN(n,
          Gen.frequency(9 -> genValue(et), 1 -> Gen.const(null))).map(_.toSeq))
      case other => sys.error(s"no generator for $other")
    }
    Gen.frequency(6 -> base, 1 -> Gen.const(null))
  }

  private val genFrame: Gen[(StructType, List[Row])] = for {
    nCols <- Gen.choose(1, 5)
    types <- Gen.listOfN(nCols, genField)
    schema = StructType(types.zipWithIndex.map { case (t, i) =>
      StructField(s"c$i", t, nullable = true) })
    nRows <- Gen.choose(0, 40)
    rows <- Gen.listOfN(nRows,
      Gen.sequence[List[Any], Any](types.map(genValue)).map(Row.fromSeq(_)))
  } yield (schema, rows)

  private def normalize(r: Row): Seq[Any] = r.toSeq.map {
    case b: Array[Byte] => b.toSeq
    case x => x
  }

  property("write → read is value-exact for any supported frame") =
    forAll(genFrame) { case (schema, rows) =>
      val jl = new java.util.ArrayList[Row](rows.size)
      rows.foreach(jl.add)
      val df = spark.createDataFrame(jl, schema).repartition(2)
      val dir = java.nio.file.Files.createTempDirectory("arrow_prop").toString
      ArrowInterchange.writeArrow(df, dir, batchRows = 16)
      val back =
        if (rows.isEmpty) {
          // zero rows → zero shards (writers only open for non-empty
          // partitions); readArrow requires at least one shard, by design
          try { ArrowInterchange.readArrow(spark, dir); false }
          catch { case _: IllegalArgumentException => true }
        } else {
          val got = ArrowInterchange.readArrow(spark, dir)
          got.schema.map(f => (f.name, f.dataType)) ==
            schema.map(f => (f.name, f.dataType)) &&
            got.collect().map(normalize).sortBy(_.toString()).toSeq ==
              df.collect().map(normalize).sortBy(_.toString()).toSeq
        }
      back
    }
}
