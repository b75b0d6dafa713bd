package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's host-degradation guard: a clean-by-contention
  * signals run on a silently slowed host must not overwrite a genuinely
  * fast committed record (seen live in r14: ~2.5× at loadavg 0.1). */
class BenchGuardSpec extends AnyFunSuite {

  private def canary(scale: Double): Map[String, Double] =
    Seq("q1" -> 0.2, "q2" -> 0.1, "q3" -> 0.45, "q4" -> 0.3, "q5" -> 0.8,
      "q6" -> 0.15).map { case (k, v) => k -> v * scale }.toMap

  test("comparable speed -> ~1.0, no block") {
    val d = Bench.canaryDegradation(canary(1.0), canary(1.05))
    assert(d.exists(r => r > 0.9 && r < 1.2))
  }

  test("2.5x host slowdown -> ratio ~2.5") {
    val d = Bench.canaryDegradation(canary(1.0), canary(2.5))
    assert(d.exists(r => r > 2.2 && r < 2.8))
  }

  test("median is robust to one noisy line") {
    val cur = canary(1.0) + ("q1" -> 10.0) // one wild outlier
    val d = Bench.canaryDegradation(canary(1.0), cur)
    assert(d.exists(_ < 1.4), s"one outlier must not block the record: $d")
  }

  test("faster run reports < 1") {
    val d = Bench.canaryDegradation(canary(1.0), canary(0.6))
    assert(d.exists(_ < 0.8))
  }

  test("too few shared lines -> None (never block on thin evidence)") {
    assert(Bench.canaryDegradation(
      Map("q1" -> 1.0, "q2" -> 1.0), Map("q1" -> 9.0, "q2" -> 9.0)).isEmpty)
    assert(Bench.canaryDegradation(Map.empty, canary(1.0)).isEmpty)
  }
}
