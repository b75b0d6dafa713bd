package graft.functions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: [[BpeMergesApply.compute]] (one flat expression over a
  * merge window) must agree with folding [[BpeMergeApply.compute]] merge
  * by merge in rank order, for ANY parts array and ANY merge list —
  * including merges whose products feed later merges, merges that never
  * match, and single/empty parts. The equivalence is what lets bpeTrain
  * swap the 64-deep expression chain for the flat window without
  * changing a single encode. */
object BpePropertiesSpec extends Properties("BpeMergesApply") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val genSym: Gen[String] = Gen.oneOf("a", "b", "c", "ab", "bc", "ca")

  private val genParts: Gen[Array[String]] =
    Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, genSym).map(_.toArray))

  // merges over the symbol closure: pairs of anything the alphabet or
  // earlier merges could have produced, so chained windows really chain
  private val genMerge: Gen[(String, String)] = for {
    l <- Gen.oneOf("a", "b", "c", "ab", "bc", "abc", "abab")
    r <- Gen.oneOf("a", "b", "c", "ab", "ca", "bca")
  } yield (l, r)

  private val genMerges: Gen[Seq[(String, String)]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, genMerge).map(_.toSeq))

  private def arr(parts: Array[String]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      parts.map(org.apache.spark.unsafe.types.UTF8String.fromString))

  private def strings(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  property("flat window == rank-ordered fold of single merges") =
    forAll(genParts, genMerges) { (parts, merges) =>
      val flat = strings(BpeMergesApply.compute(arr(parts),
        merges.map(_._1).toArray, merges.map(_._2).toArray))
      val folded = merges.foldLeft(arr(parts): org.apache.spark.sql.catalyst.util.ArrayData) {
        case (acc, (l, r)) => BpeMergeApply.compute(acc, l, r)
      }
      flat == strings(folded)
    }

  property("no merge list is the identity") =
    forAll(genParts) { parts =>
      strings(BpeMergesApply.compute(arr(parts),
        Array.empty, Array.empty)) == parts.toSeq
    }

  property("token mass is conserved: concatenation never changes") =
    forAll(genParts, genMerges) { (parts, merges) =>
      strings(BpeMergesApply.compute(arr(parts),
        merges.map(_._1).toArray, merges.map(_._2).toArray))
        .mkString == parts.mkString
    }
}
