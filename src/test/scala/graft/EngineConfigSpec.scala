package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SHJ kill switch must be all-or-nothing: r21 ADVICE found "0m"/"off"
  * half-applied (preferSortMergeJoin false + a zero/garbage AQE threshold).
  * Any value Spark cannot read as a positive byte count now disables BOTH
  * knobs, restoring stock sort-merge behavior. */
class EngineConfigSpec extends AnyFunSuite {

  test("positive byte strings enable SHJ, passed through verbatim") {
    assert(Engine.shjThresholdFrom("128m").contains("128m"))
    assert(Engine.shjThresholdFrom(" 1g ").contains("1g"))
    assert(Engine.shjThresholdFrom("134217728").contains("134217728"))
  }

  test("every off-ish spelling fully disables") {
    for (v <- Seq("", "0", "0m", "0g", "off", "none", "false", "  "))
      assert(Engine.shjThresholdFrom(v).isEmpty, s"'$v' must disable")
  }

  test("negative and garbage values disable rather than half-apply") {
    for (v <- Seq("-128m", "12 potatoes", "m128"))
      assert(Engine.shjThresholdFrom(v).isEmpty, s"'$v' must disable")
  }

  test("parquet codec: trimmed pass-through, empty keeps Spark's default") {
    assert(Engine.parquetCodecFrom("zstd").contains("zstd"))
    assert(Engine.parquetCodecFrom(" snappy ").contains("snappy"))
    assert(Engine.parquetCodecFrom("").isEmpty)
    assert(Engine.parquetCodecFrom("   ").isEmpty)
  }
}
