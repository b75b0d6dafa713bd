package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md's headline claims rotted once (round 9: "91/91" while 112
  * queries were declared and 16 were silently broken). This spec re-reads
  * the doc and fails when the claimed oracle-verified query count no longer
  * matches `SparkEntry` reality, so the claim can only change together with
  * the code it describes. (The ScalaTest total is runtime-generated —
  * ScalaCheck properties fan out — so that claim stays prose.)
  */
class CoverageClaimsSpec extends AnyFunSuite {

  test("COVERAGE.md's N/N oracle claim equals the declared query surface") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      "UTF-8")
    val claim = """\*\*(\d+)/(\d+) hash-identical""".r
      .findFirstMatchIn(text)
      .getOrElse(fail("COVERAGE.md no longer states an N/N hash-identical claim"))
    assert(claim.group(1) == claim.group(2), "claim must be all-green N/N")
    val claimed = claim.group(1).toInt
    assert(claimed == SparkEntry.queries.size,
      s"COVERAGE.md claims $claimed oracle-verified queries but " +
        s"SparkEntry.queries declares ${SparkEntry.queries.size} — update both together")
  }

  test("COVERAGE.md's section-registry count equals SectionRegistry reality") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      "UTF-8")
    val claim = """\((\d+) section types""".r.findFirstMatchIn(text)
      .getOrElse(fail("COVERAGE.md no longer states a section-type count"))
    assert(claim.group(1).toInt == graft.plans.SectionRegistry.entries.size,
      s"COVERAGE.md claims ${claim.group(1)} section types but the registry " +
        s"has ${graft.plans.SectionRegistry.entries.size}")
  }

  test("every declared query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // capture-and-inject oracles (Q.dynamicOpt) are None until their query
    // has run — Verify always runs queries before dumping oracle_sql.json,
    // so at dump time they are present; here they are legitimately absent.
    val capture = Queries.all.collect {
      case (name, qq) if qq.captureOracle => name
    }.toSet
    assert((q -- o -- capture).isEmpty,
      s"queries without oracle: ${(q -- o -- capture).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }
}
