package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's contention guards (no Spark needed — pure logic).
  *
  * Round 9's driver bench recorded ~2x inflation on nearly every query
  * (q43 18.7s vs 2.9s on a quiet machine) because machine contention
  * spanned all three min-of-3 reps. The guards that make such a run
  * self-labeling are (a) the start/mid/end canary ratio and (b) the
  * suspect list vs the previous round's stored values — this spec pins
  * the value-scraping (the driver stores a TRUNCATED, string-escaped
  * tail) and the suspect predicate's two gates.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("scrapeQueryTimes reads a driver-truncated escaped tail") {
    // Verbatim shape of BENCH_r09.json: the bench line survives only as an
    // escaped string inside the "tail" field, cut mid-map.
    val stored =
      """{"n": 9, "rc": 0, "tail": "q27_zero_pad_union\":0.349,\"q43_minhash_neardup\":18.655,""" +
        """\"q99_neardup_components\":6.037},\"errors\":{}", "parsed": null}"""
    val m = Bench.scrapeQueryTimes(stored)
    assert(m("q43_minhash_neardup") == 18.655)
    assert(m("q99_neardup_components") == 6.037)
    // The head-truncated first entry loses its opening quote — the name
    // still matches because the escaped quote of the PREVIOUS pair ends it.
    assert(m.contains("q27_zero_pad_union"))
  }

  test("scrapeQueryTimes also reads a clean un-escaped bench line") {
    val clean = """{"queries":{"q01_pricing_summary":0.420,"q02_filter_project":0.100}}"""
    assert(Bench.scrapeQueryTimes(clean) ==
      Map("q01_pricing_summary" -> 0.42, "q02_filter_project" -> 0.1))
  }

  test("scrapeQueryTimes drops failed (-1) timings") {
    val m = Bench.scrapeQueryTimes(""""q05_revenue_by_nation":-1.000,"q06_broadcast_join_part":0.2""")
    assert(!m.contains("q05_revenue_by_nation") && m.contains("q06_broadcast_join_part"))
  }

  test("contendedRule: intra-run spread, cross-round floor, and the no-baseline case") {
    // mid/end agree, no baseline: clean
    assert(!Bench.contendedRule(0.2, 0.21, None, 2.0))
    // contention arrives mid-run: mid 3x end
    assert(Bench.contendedRule(0.6, 0.2, None, 2.0))
    // whole-run contention (the round-9 mode): intra-run spread is flat but
    // both points sit 2.5x over the previous round's floor
    assert(Bench.contendedRule(0.5, 0.52, Some(0.2), 2.0))
    // same flat points, baseline matches: clean
    assert(!Bench.contendedRule(0.21, 0.2, Some(0.2), 2.0))
  }

  test("scrapeCanaryFloor reads mid/end from a stored (escaped) canary blob") {
    val stored = """...\"canary\":{\"query\":\"q01\",\"start\":0.596,\"mid\":0.193,\"end\":0.202,..."""
    assert(Bench.scrapeCanaryFloor(stored) === Some(0.193))
    val clean = """"canary":{"query":"q01","start":0.3,"mid":0.25,"end":0.21,"spread":1.2}"""
    assert(Bench.scrapeCanaryFloor(clean) === Some(0.21))
    assert(Bench.scrapeCanaryFloor("no canary here") === None)
  }

  test("minAcrossRounds: a contended newer round cannot launder a regression " +
       "past a clean older floor") {
    // The round-10 failure mode: r9 was recorded under whole-run contention
    // (q43 18.655s), so r10's still-inflated 6.204s passed vs the NEWEST
    // file. With the cross-round min, the clean r8 floor (2.7s) is the
    // baseline and the 6.2s value fires.
    val r8clean     = """{"queries":{"q43_minhash_neardup":2.700,"q01_pricing_summary":0.190}}"""
    val r9contended = """{"queries":{"q43_minhash_neardup":18.655,"q01_pricing_summary":0.510}}"""
    val merged = Bench.minAcrossRounds(Seq(r8clean, r9contended))
    assert(merged("q43_minhash_neardup") == 2.700)
    assert(merged("q01_pricing_summary") == 0.190)
    // r10's 6.204s: clean vs the contended newest (6.2 < 2x18.7) but suspect
    // vs the true cross-round floor.
    assert(!Bench.suspectRule(cur = 6.204, prev = 18.655))
    assert(Bench.suspectRule(cur = 6.204, prev = merged("q43_minhash_neardup")))
  }

  test("minAcrossRounds: partial (tail-truncated) rounds contribute only the " +
       "queries they still carry") {
    val full    = """{"queries":{"q01_a":0.300,"q02_b":1.000}}"""
    val partial = """tail cut ...\"q02_b\":0.400}"""
    val merged = Bench.minAcrossRounds(Seq(full, partial))
    assert(merged == Map("q01_a" -> 0.3, "q02_b" -> 0.4))
    assert(Bench.minAcrossRounds(Nil).isEmpty)
  }

  test("suspectRule: relative gate, absolute floor, and failure guards") {
    assert(Bench.suspectRule(cur = 6.0, prev = 2.0))     // 3x and +4s: suspect
    assert(!Bench.suspectRule(cur = 3.9, prev = 2.0))    // <2x: clean
    assert(!Bench.suspectRule(cur = 0.25, prev = 0.1))   // 2.5x but sub-second jitter: clean
    assert(!Bench.suspectRule(cur = -1.0, prev = 2.0))   // failed query: handled by errors, not suspects
    assert(!Bench.suspectRule(cur = 6.0, prev = -1.0))   // failed previous round: no baseline
    // Boundary: exactly 2x is NOT suspect (strict >)
    assert(!Bench.suspectRule(cur = 4.0, prev = 2.0))
  }
}
