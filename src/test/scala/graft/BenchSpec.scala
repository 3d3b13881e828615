package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench pollution guardrail is a pure function — tested with
  * run-shaped inputs instead of deliberately loading the machine. */
class BenchSpec extends AnyFunSuite {

  private def quiet(n: Int): (Map[String, Double], Map[String, List[Double]]) = {
    val best = (1 to n).map(i => s"q$i" -> 1.0).toMap
    // warm spread 2% of min — a quiet box
    val warm = (1 to n).map(i => s"q$i" -> List(1.01, 1.02)).toMap
    (best, warm)
  }

  test("quiet run: no query suspect, not polluted") {
    val (best, warm) = quiet(20)
    assert(Bench.pollutionVerdict(best, warm) == (0.0, false))
  }

  test("loaded run: symmetric multi-x scatter on many queries trips the marker") {
    // the BENCH_r07 signature: a chunk of queries with warm samples
    // scattering far beyond their minimum
    val (best, warm) = quiet(20)
    val loadedWarm = warm ++ (1 to 5).map(i => s"q$i" -> List(1.1, 3.4)).toMap
    val (frac, polluted) = Bench.pollutionVerdict(best, loadedWarm)
    assert(polluted && math.abs(frac - 0.25) < 1e-9, s"($frac, $polluted)")
  }

  test("isolated outlier below the 10% query fraction does not trip it") {
    val (best, warm) = quiet(20)
    val oneOff = warm + ("q1" -> List(1.0, 9.9))
    val (frac, polluted) = Bench.pollutionVerdict(best, oneOff)
    assert(!polluted && math.abs(frac - 0.05) < 1e-9, s"($frac, $polluted)")
  }

  test("boundary: spread must EXCEED 50% of min; fraction must EXCEED 10%") {
    // exactly-at-threshold spread (0.5 * min) is not suspect
    val best = Map("a" -> 2.0, "b" -> 2.0)
    val warm = Map("a" -> List(1.0, 2.0), "b" -> List(2.0, 2.0))
    assert(Bench.pollutionVerdict(best, warm) == (0.0, false))
    // exactly 10% suspect is not polluted; the next query over is
    val best10 = (1 to 10).map(i => s"q$i" -> 1.0).toMap
    val warm10 = (1 to 10).map(i => s"q$i" -> List(1.0, 1.01)).toMap +
      ("q1" -> List(1.0, 2.0))
    assert(Bench.pollutionVerdict(best10, warm10) == (0.1, false))
  }

  test("round-17 spread: one disturbed pass among agreeing samples is not suspect") {
    // 4 warm samples (passes=5): two quiet samples agree to 1%, one
    // external burst hit a third — the reported min is reproducible,
    // so the query must NOT count as suspect
    val best = (1 to 10).map(i => s"q$i" -> 1.0).toMap
    val warm = (1 to 10).map(i => s"q$i" -> List(1.01, 4.2, 1.02, 3.9)).toMap
    assert(Bench.pollutionVerdict(best, warm) == (0.0, false))
    // genuinely unstable: NO two samples agree -> every query suspect
    val unstable = (1 to 10).map(i => s"q$i" -> List(1.7, 4.2, 2.9, 6.1)).toMap
    assert(Bench.pollutionVerdict(best, unstable) == (1.0, true))
  }

  test("no warm samples (passes < 3): unjudgeable, not marked") {
    val best = Map("a" -> 1.0)
    assert(Bench.pollutionVerdict(best, Map("a" -> List(1.2))) == (0.0, false))
    assert(Bench.pollutionVerdict(best, Map.empty) == (0.0, false))
  }
}
