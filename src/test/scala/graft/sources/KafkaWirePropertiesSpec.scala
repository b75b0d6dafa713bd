package graft.sources

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: ANY record batch — random keys/values (nulls, empties,
  * arbitrary bytes), random codec — survives the v2 wire encode/decode
  * round-trip value-exactly. Complements KafkaWireSpec's fixed cases:
  * compression codecs meet payloads nobody thought to write down
  * (binary that looks like frame magic, incompressible noise, runs of
  * zeros). */
object KafkaWirePropertiesSpec extends Properties("KafkaWireBatch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val genBytes: Gen[Array[Byte]] = Gen.oneOf(
    // arbitrary noise (incompressible)
    Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)),
    // runs of one byte (maximally compressible)
    Gen.choose(0, 400).flatMap(n =>
      Gen.choose(Byte.MinValue, Byte.MaxValue).map(b => Array.fill(n)(b))),
    // empty
    Gen.const(Array.empty[Byte]),
    // bytes that spell codec frame magics mid-payload
    Gen.const(Array[Byte](0x1f, 0x8b.toByte, 0x08) ++
      Array[Byte](0x04, 0x22, 0x4d, 0x18) ++ "sNaPpY".getBytes("UTF-8")))

  private val genKey: Gen[Array[Byte]] =
    Gen.oneOf(genBytes, Gen.const(null: Array[Byte]))

  private val genRecords: Gen[Seq[(Array[Byte], Array[Byte])]] =
    Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.zip(genKey, genBytes)).map(_.toSeq))

  private def sameBytes(a: Array[Byte], b: Array[Byte]): Boolean =
    (a == null && b == null) ||
      (a != null && b != null && java.util.Arrays.equals(a, b))

  property("encode/decode round-trip, every codec") =
    forAll(genRecords, Gen.choose(0, 4)) { (recs, codec) =>
      val got = KafkaWire.readRecordSet(
        KafkaWire.recordBatchV2(recs, codec), partition = 3)
      got.size == recs.size &&
        got.map(_.offset) == recs.indices.map(_.toLong) &&
        got.forall(_.partition == 3) &&
        got.zip(recs).forall { case (r, (k, v)) =>
          sameBytes(r.key, k) && sameBytes(r.value, v)
        }
    }
}
