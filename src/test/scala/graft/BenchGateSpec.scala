package graft

import org.scalatest.funsuite.AnyFunSuite

/** Table tests for the POST-SWEEP half of the bench
  * measurement-of-record gate ([[Bench.finalTarget]], v3.1) and its
  * shared-row outcome input ([[Bench.sharedOutcomeOf]]) — every
  * admission/demotion path the r18 review hardened. */
class BenchGateSpec extends AnyFunSuite {

  private val Rec = "BENCH_LOCAL.json"
  private val Rej = "BENCH_LOCAL.rejected.json"

  private def ft(fileTarget: String, ratio: Option[Double] = Some(2.0),
      incumbentRatio: Double = 2.0, configOk: Boolean = true,
      force: Boolean = false, partial: Boolean = false,
      errors: Boolean = false,
      outcome: Option[(Double, Double, Int)] = None,
      bestOutcome: Option[(Double, Double, Int)] = None): String =
    Bench.finalTarget(fileTarget, ratio, incumbentRatio, configOk, force,
      partial, errors, outcome, bestOutcome)._1

  test("outcome admission: a window-rejected faster sweep is admitted") {
    assert(ft(Rej, outcome = Some((117.4, 123.5, 175))) == Rec)
    // equality is enough — "not slower" cannot be inflation
    assert(ft(Rej, outcome = Some((123.5, 123.5, 175))) == Rec)
  }

  test("outcome admission requires the pinned config (r18 review #1)") {
    // a smaller-sf/more-core sweep is faster for incommensurable
    // reasons: it must stay in the rejected file
    assert(ft(Rej, configOk = false, outcome = Some((30.0, 123.5, 175))) == Rej)
  }

  test("outcome admission never fires without coverage, on slower sweeps, on partial/errored/forced runs") {
    assert(ft(Rej, outcome = None) == Rej)
    assert(ft(Rej, outcome = Some((130.0, 123.5, 175))) == Rej)
    assert(ft(Rej, partial = true, outcome = Some((1.0, 123.5, 175))) == Rej)
    assert(ft(Rej, errors = true, outcome = Some((1.0, 123.5, 175))) == Rej)
    // force leaves whatever the window gate (overridden by force
    // upstream) decided — finalTarget never touches forced runs
    assert(ft(Rej, force = true, outcome = Some((1.0, 123.5, 175))) == Rej)
  }

  test("band demotion: an admitted sweep whose outcome is >10% worse is demoted (r18 review #3)") {
    assert(ft(Rec, ratio = Some(1.8), outcome = Some((140.0, 123.5, 175))) == Rej)
    // within the 10% tolerance a legitimate code-cost change stands —
    // at an equal-or-better window than the incumbent's
    assert(ft(Rec, ratio = Some(1.8), incumbentRatio = 1.8,
      outcome = Some((130.0, 123.5, 175))) == Rec)
    assert(ft(Rec, ratio = Some(1.7), incumbentRatio = 1.8,
      outcome = Some((130.0, 123.5, 175))) == Rec)
    // no coverage -> no demotion evidence -> stands
    assert(ft(Rec, ratio = Some(1.8), outcome = None) == Rec)
  }

  test("anti-ratchet: a WORSE-window band admission gets zero slowdown tolerance (r18 advice)") {
    // window worse than the incumbent's: even a 1% slower shared sum
    // is demoted — repeated band-admitted reruns could otherwise each
    // land 10% slower at a 0.05-looser window and ratchet the record
    assert(ft(Rec, ratio = Some(1.85), incumbentRatio = 1.8,
      outcome = Some((124.8, 123.5, 175))) == Rej)
    // a worse-window rerun that is NOT slower may still overwrite
    // (its stamped window then LOWERS nothing, but the record's rows
    // are equal-or-faster — not inflation by construction)
    assert(ft(Rec, ratio = Some(1.85), incumbentRatio = 1.8,
      outcome = Some((123.5, 123.5, 175))) == Rec)
    // equal windows keep the legitimate-code-cost tolerance
    assert(ft(Rec, ratio = Some(1.8), incumbentRatio = 1.8,
      outcome = Some((124.8, 123.5, 175))) == Rec)
    // no incumbent on disk (MaxValue sentinel): any window counts as
    // equal-or-better, tolerance applies
    assert(ft(Rec, ratio = Some(2.2), incumbentRatio = Double.MaxValue,
      outcome = Some((124.8, 123.5, 175))) == Rec)
  }

  test("best-ever anchor: band demotion ratchets against BENCH_BEST, not the incumbent (r19 verdict #1)") {
    // incumbent drifted slower (a prior band admission at 130.0);
    // anchored on it alone this 142.0 s sweep would pass the 10%
    // tolerance (142 ≤ 130×1.10) — against the best-ever 123.5 it
    // must demote: the amortized-ratchet hole
    assert(ft(Rec, ratio = Some(1.8), incumbentRatio = 1.8,
      outcome = Some((142.0, 130.0, 175)),
      bestOutcome = Some((142.0, 123.5, 175))) == Rej)
    // within 10% of the BEST record a legitimate code-cost change
    // still stands, regardless of what the incumbent says
    assert(ft(Rec, ratio = Some(1.8), incumbentRatio = 1.8,
      outcome = Some((130.0, 130.0, 175)),
      bestOutcome = Some((130.0, 123.5, 175))) == Rec)
    // no best file yet (None): falls back to the incumbent anchor —
    // the pre-r20 behavior, unchanged
    assert(ft(Rec, ratio = Some(1.8), incumbentRatio = 1.8,
      outcome = Some((142.0, 130.0, 175)), bestOutcome = None) == Rec)
    // worse-window zero-tolerance also anchors on best: equal to the
    // incumbent but slower than best -> demoted
    assert(ft(Rec, ratio = Some(1.85), incumbentRatio = 1.8,
      outcome = Some((130.0, 130.0, 175)),
      bestOutcome = Some((130.0, 123.5, 175))) == Rej)
    // outcome ADMISSION (rejected->admitted) still compares vs the
    // incumbent: it requires <= with no tolerance, so it cannot
    // ratchet, and a sweep faster than the current record should
    // admit even when an old best is faster still
    assert(ft(Rej, outcome = Some((125.0, 130.0, 175)),
      bestOutcome = Some((125.0, 123.5, 175))) == Rec)
  }

  test("legacy fast windows and custom out files are never second-guessed") {
    // ratio <= 1.3: a genuinely fast window needs no outcome proof
    assert(ft(Rec, ratio = Some(1.2), outcome = Some((999.0, 123.5, 175))) == Rec)
    // gate never ran (filtered/custom-file runs)
    assert(ft("/tmp/bench_filtered.json", ratio = None,
      outcome = Some((999.0, 123.5, 175))) == "/tmp/bench_filtered.json")
  }

  test("sharedOutcomeOf: 90% coverage guard and sums") {
    val prev = (1 to 10).map(i => s"q$i" -> 1.0).toMap
    // full overlap
    val full = Bench.sharedOutcomeOf(prev.map { case (k, _) => k -> 2.0 }, prev)
    assert(full.contains((20.0, 10.0, 10)))
    // 9 of 10 = exactly the 90% floor
    val nine = prev - "q10"
    assert(Bench.sharedOutcomeOf(nine.map { case (k, _) => k -> 2.0 }, prev)
      .contains((18.0, 9.0, 9)))
    // 8 of 10: below coverage -> None (a trimmed catalog can't game it)
    val eight = nine - "q9"
    assert(Bench.sharedOutcomeOf(eight, prev).isEmpty)
    // empty incumbent -> None
    assert(Bench.sharedOutcomeOf(prev, Map.empty).isEmpty)
    // degenerate incumbent (r18 advice): a 1-row prev floors the 90%
    // guard to 0 — the max(1, …) floor must still require a real
    // shared row, so a disjoint result set can never produce the
    // vacuous (0.0 <= 0.0) outcome admission
    val one = Map("qx" -> 1.0)
    assert(Bench.sharedOutcomeOf(Map("qy" -> 0.5), one).isEmpty)
    assert(Bench.sharedOutcomeOf(Map("qx" -> 0.5), one).contains((0.5, 1.0, 1)))
  }
}
