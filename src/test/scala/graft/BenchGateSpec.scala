package graft

import org.scalatest.funsuite.AnyFunSuite

/** The regression-gate policy ([[BenchGate]]) — pure math, no Spark.
  *
  * Round-10 ground truth this spec encodes: the gate's first outing
  * flagged 8 queries and quiet-machine A/Bs showed all 8 were phantom —
  * artifacts of comparing against noise-DEFLATED contended baselines.
  * The trusted-baseline policy must make that whole failure class
  * impossible: a contended round followed by a quiet round flags zero
  * unchanged queries.
  */
class BenchGateSpec extends AnyFunSuite {

  test("seedFallback: corrected figure wins when present") {
    assert(BenchGate.seedFallback(raw = 2.0, corrected = 1.8, noise = 1.1).contains(1.8))
  }

  test("seedFallback: dead-band — raw stands unchanged when noise is inside the band") {
    // the r10 ADVICE hole: prev = raw/noise with no dead-band deflated a
    // noise-1.2 baseline ~17% against an undeflated current figure
    assert(BenchGate.seedFallback(raw = 1.0, corrected = -1.0, noise = 1.2).contains(1.0))
    assert(BenchGate.seedFallback(raw = 1.0, corrected = -1.0, noise = 1.29).contains(1.0))
  }

  test("seedFallback: a contended measurement seeds NOTHING — not corrected, not raw/noise") {
    // the r11 phantom class: dedup_prefix_jaccard's trusted seed was the
    // d823ed5 corrected estimate 1.10 (raw 2.35 at noise 2.1); its first
    // QUIET measurement, 1.74 s — an actual raw IMPROVEMENT — then
    // flagged as a 1.6x "regression". A contended corrected figure is a
    // deflation estimate, never a baseline.
    assert(BenchGate.seedFallback(raw = 2.35, corrected = 1.10, noise = 2.1).isEmpty)
    // and the raw/noise path is the same estimate by another name
    assert(BenchGate.seedFallback(raw = 2.0, corrected = -1.0, noise = 2.0).isEmpty)
    assert(BenchGate.seedFallback(raw = 2.0, corrected = -1.0, noise = 1.3).isEmpty)
  }

  test("seedFallback: failed query seeds nothing") {
    assert(BenchGate.seedFallback(raw = -1.0, corrected = -1.0, noise = 1.0).isEmpty)
  }

  test("nextTrusted: a quiet successful measurement replaces the baseline") {
    assert(BenchGate.nextTrusted(Some(2.0), cur = 1.5, quiet = true, ok = true).contains(1.5))
    assert(BenchGate.nextTrusted(None, cur = 1.5, quiet = true, ok = true).contains(1.5))
  }

  test("nextTrusted: a contended measurement carries the previous trusted forward untouched") {
    assert(BenchGate.nextTrusted(Some(2.0), cur = 0.5, quiet = false, ok = true).contains(2.0))
    assert(BenchGate.nextTrusted(None, cur = 0.5, quiet = false, ok = true).isEmpty)
  }

  test("nextTrusted: a failed query never updates the baseline") {
    assert(BenchGate.nextTrusted(Some(2.0), cur = -1.0, quiet = true, ok = false).contains(2.0))
  }

  test("regression: quiet growth beyond 1.5x trusted is flagged") {
    assert(BenchGate.regression(Some(1.0), cur = 2.0, quiet = true, ok = true).contains((1.0, 2.0)))
  }

  test("regression: growth below ratio, below floor, or without a baseline is not flagged") {
    assert(BenchGate.regression(Some(1.0), cur = 1.4, quiet = true, ok = true).isEmpty)
    assert(BenchGate.regression(Some(0.2), cur = 0.4, quiet = true, ok = true).isEmpty)
    assert(BenchGate.regression(None, cur = 9.0, quiet = true, ok = true).isEmpty)
  }

  test("regression: a contended current measurement never flags") {
    assert(BenchGate.regression(Some(1.0), cur = 9.0, quiet = false, ok = true).isEmpty)
  }

  test("the r10 phantom-flag class is impossible: contended round then quiet round, unchanged query") {
    // round A (quiet): true capability 1.94 s → trusted = 1.94
    val afterQuiet = BenchGate.nextTrusted(None, cur = 1.94, quiet = true, ok = true)
    assert(afterQuiet.contains(1.94))
    // round B (contended, probe factor ~3.6): raw 1.94 deflates to a
    // phantom 0.54 "corrected" figure — the baseline must NOT absorb it
    val afterContended = BenchGate.nextTrusted(afterQuiet, cur = 0.54, quiet = false, ok = true)
    assert(afterContended.contains(1.94))
    // and the contended figure itself flags nothing
    assert(BenchGate.regression(afterQuiet, cur = 0.54, quiet = false, ok = true).isEmpty)
    // round C (quiet again): the unchanged 1.94 s query vs trusted 1.94 — zero flags
    assert(BenchGate.regression(afterContended, cur = 1.94, quiet = true, ok = true).isEmpty)
    // whereas the old corrected-basis gate WOULD have flagged it: 1.94 > 1.5 × 0.54
    assert(1.94 > BenchGate.RegressionRatio * 0.54)
  }

  test("seedKey: once the trusted field exists, an absent query seeds NOTHING — never its corrected figure") {
    // the resurrection hole: query X contended in round N (no trusted
    // entry, deflated corrected 0.54 for a true 1.94 s) must not become
    // round N+1's baseline
    assert(BenchGate.seedKey(trusted = -1.0, fileHasTrusted = true,
      raw = 1.94, corrected = 0.54, noise = 3.6).isEmpty)
    // a recorded trusted figure always wins
    assert(BenchGate.seedKey(1.94, fileHasTrusted = true, 1.0, 0.5, 3.0).contains(1.94))
    // pre-trusted files still seed via the dead-band fallback
    assert(BenchGate.seedKey(-1.0, fileHasTrusted = false, 1.0, -1.0, 1.2).contains(1.0))
  }

  test("nextProbeBase: one fast run moves the anchor at most a half-band step; slow runs leave it") {
    // a single 2x-fast anomaly must not deadlock the gate dormant: the
    // anchor steps down only to prev/1.15, and the machine's TYPICAL
    // state (0.10) is still comparable against the stepped anchor
    val step1 = BenchGate.nextProbeBase(prev = 0.10, cur = 0.05, comparable = true)
    assert(step1 === 0.10 / BenchGate.AnchorStep)
    assert(BenchGate.comparable(curProbeBase = 0.10, trustedProbeBase = step1))
    // consecutive fast runs keep walking down
    val step2 = BenchGate.nextProbeBase(step1, 0.05, comparable = true)
    assert(step2 < step1 && step1 < 0.10)
    // within-band states and incomparable states leave the anchor alone
    assert(BenchGate.nextProbeBase(0.05, 0.06, comparable = true) === 0.05)
    assert(BenchGate.nextProbeBase(0.05, 0.15, comparable = false) === 0.05)
    // first run ever seeds directly
    assert(BenchGate.nextProbeBase(-1.0, 0.08, comparable = true) === 0.08)
  }

  test("comparable: a probe base inside the dead-band of the trusted base compares; 2x slower does not") {
    assert(BenchGate.comparable(curProbeBase = 0.055, trustedProbeBase = 0.050))
    // faster machine states always compare (times can only shrink)
    assert(BenchGate.comparable(curProbeBase = 0.030, trustedProbeBase = 0.050))
    // the round-11 near-miss: 0.104 vs 0.050 — a 2x slower machine state
    // measured an unchanged query 1.38 -> 2.47 s at within-run noise 1.00
    assert(!BenchGate.comparable(curProbeBase = 0.104, trustedProbeBase = 0.050))
    assert(!BenchGate.comparable(curProbeBase = 0.050, trustedProbeBase = -1.0))
  }

  test("a real quiet-vs-quiet regression still surfaces after a contended interlude") {
    val t = BenchGate.nextTrusted(None, cur = 1.0, quiet = true, ok = true)
    val carried = BenchGate.nextTrusted(t, cur = 0.3, quiet = false, ok = true)
    assert(BenchGate.regression(carried, cur = 2.0, quiet = true, ok = true).contains((1.0, 2.0)))
  }

  test("adoptable: an anomalously fast run cannot rewrite baselines (the r11 ADVICE mirror)") {
    // anchor 0.10, trusted 2.0 s measured there. One anomalous probe
    // 0.05 run (within the repo's observed 2-3x drift) measures the
    // unchanged query at ~1.0 s. One-sided comparable() accepts the run
    // for FLAGGING (a fast state can't mint a false flag) — but adoption
    // must refuse it, else the next normal 0.10 run is still comparable
    // (0.10 < 1.3 x 0.087) and phantom-flags the unchanged 2.0 s query.
    val tpb0 = 0.10
    assert(BenchGate.comparable(curProbeBase = 0.05, trustedProbeBase = tpb0))
    val tpb1 = BenchGate.nextProbeBase(tpb0, 0.05, comparable = true)
    assert(!BenchGate.adoptable(curProbeBase = 0.05, anchor = tpb1))
    // trusted stays 2.0 (quiet-for-adoption is false on this state)
    val trusted = BenchGate.nextTrusted(Some(2.0), cur = 1.0, quiet = false, ok = true)
    assert(trusted.contains(2.0))
    // the next normal-state run: still comparable against the stepped
    // anchor, and the unchanged query flags nothing
    assert(BenchGate.comparable(0.10, tpb1))
    assert(BenchGate.regression(trusted, cur = 2.0, quiet = true, ok = true).isEmpty)
    // whereas adopting the fast-state figure WOULD have phantom-flagged
    assert(2.0 > BenchGate.RegressionRatio * 1.0)
    // the band arithmetic that makes state-scaled phantoms impossible
    assert(BenchGate.QuietFactor * BenchGate.AnchorStep < BenchGate.RegressionRatio)
    // and a state inside one AnchorStep of the anchor adopts normally
    assert(BenchGate.adoptable(0.095, 0.10) && BenchGate.adoptable(0.11, 0.10))
    assert(BenchGate.adoptable(0.08, -1.0)) // first run ever seeds freely
  }

  test("stepUpAnchor: a durable mid-band state unfreezes adoption; a transient one cannot") {
    // the 1.15–1.3x gap: comparable every run (dormancy never starts),
    // never adoptable (min-ratchet anchor) — the freeze band
    val anchor = 0.10
    val cur = 0.12 // durable 1.2x state, inside the band
    assert(BenchGate.comparable(cur, anchor))
    assert(!BenchGate.adoptable(cur, anchor))
    // runs 1-2: not yet durable — anchor holds, adoption still frozen
    assert(BenchGate.stepUpAnchor(anchor, cur, staleRuns = 1) === anchor)
    assert(BenchGate.stepUpAnchor(anchor, cur, staleRuns = 2) === anchor)
    // run 3: durable — one AnchorStep up restores adoption immediately
    val stepped = BenchGate.stepUpAnchor(anchor, cur, staleRuns = 3)
    assert(math.abs(stepped - 0.115) < 1e-12)
    assert(BenchGate.adoptable(cur, stepped),
      "one step must cover the whole band: QuietFactor / AnchorStep < AnchorStep")
    // anywhere in the band, one step suffices (band arithmetic)
    assert(BenchGate.QuietFactor / BenchGate.AnchorStep < BenchGate.AnchorStep)
    // an adoptable or faster state never steps the anchor up
    assert(BenchGate.stepUpAnchor(anchor, 0.11, staleRuns = 5) === anchor)
    assert(BenchGate.stepUpAnchor(anchor, 0.08, staleRuns = 5) === anchor)
  }

  test("nextFlag: a real regression stays on the report after trusted self-heals, and clears on revert") {
    // round N: 2.0 s query regresses to 4.0 s, quiet — fresh flag, and
    // nextTrusted adopts 4.0 (the self-heal that made flags one-shot)
    val fresh = BenchGate.regression(Some(2.0), cur = 4.0, quiet = true, ok = true)
    val flagN = BenchGate.nextFlag(None, fresh, cur = 4.0, quiet = true, ok = true)
    assert(flagN.contains((2.0, 4.0)))
    val trustedN = BenchGate.nextTrusted(Some(2.0), 4.0, quiet = true, ok = true)
    assert(trustedN.contains(4.0))
    // round N+1: still 4.0 s — regression() vs the healed trusted is
    // silent, but the sticky record persists with the PRE-flag baseline
    assert(BenchGate.regression(trustedN, 4.1, quiet = true, ok = true).isEmpty)
    val flagN1 = BenchGate.nextFlag(flagN, None, cur = 4.1, quiet = true, ok = true)
    assert(flagN1.contains((2.0, 4.1)))
    // contended and failed rounds carry the record untouched
    assert(BenchGate.nextFlag(flagN1, None, cur = 1.0, quiet = false, ok = true) === flagN1)
    assert(BenchGate.nextFlag(flagN1, None, cur = -1.0, quiet = true, ok = false) === flagN1)
    // the slowdown reverts: a quiet measurement within 1.5x of the
    // PRE-flag trusted clears the record
    assert(BenchGate.nextFlag(flagN1, None, cur = 2.1, quiet = true, ok = true).isEmpty)
    // a re-flag on an already-flagged query keeps the ORIGINAL baseline
    assert(BenchGate.nextFlag(Some((2.0, 4.0)), Some((4.0, 9.0)), 9.0, quiet = true, ok = true)
      .contains((2.0, 9.0)))
  }
}
