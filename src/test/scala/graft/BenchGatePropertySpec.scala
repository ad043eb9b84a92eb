package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the trusted-baseline gate: across ARBITRARY
  * sequences of contended/quiet rounds and machine states, an UNCHANGED
  * query whose quiet measurements wobble within the probe dead-band can
  * never flag — the invariant the round-10 phantom class violated. A
  * genuine 2× regression, once measured quiet on a comparable machine
  * after a quiet baseline exists, always flags.
  */
class BenchGatePropertySpec extends AnyFunSuite {

  private case class Round(quiet: Boolean, wobble: Double, deflation: Double)

  private val roundGen = for {
    quiet <- Gen.oneOf(true, false)
    // quiet measurements wobble within the dead-band stratum (< 1.3x
    // spread in either direction is impossible; wobble stays ≤ 1.15)
    wobble <- Gen.choose(1.0 / 1.15, 1.15)
    // contended rounds deflate by up to 4x (the r10 observation)
    deflation <- Gen.choose(1.0, 4.0)
  } yield Round(quiet, wobble, deflation)

  private def runs(seed: Long, n: Int): List[Round] =
    Gen.listOfN(n, roundGen).apply(Gen.Parameters.default, Seed(seed)).get

  test("an unchanged query never flags, whatever the contention history") {
    val trueTime = 2.0
    (1L to 300L).foreach { seed =>
      var trusted: Option[Double] = None
      runs(seed, 20).foreach { r =>
        val cur = if (r.quiet) trueTime * r.wobble else trueTime / r.deflation
        val flag = BenchGate.regression(trusted, cur, r.quiet, ok = true)
        assert(flag.isEmpty,
          s"phantom flag on unchanged query: seed=$seed round=$r trusted=$trusted cur=$cur")
        trusted = BenchGate.nextTrusted(trusted, cur, r.quiet, ok = true)
      }
    }
  }

  test("a genuine 2x regression flags on its first quiet measurement after a quiet baseline") {
    val before = 2.0; val after = 4.0
    (1L to 300L).foreach { seed =>
      var trusted: Option[Double] = None
      var baselineSeen = false
      runs(seed, 10).foreach { r =>
        val cur = if (r.quiet) before * r.wobble else before / r.deflation
        trusted = BenchGate.nextTrusted(trusted, cur, r.quiet, ok = true)
        baselineSeen ||= r.quiet
      }
      if (baselineSeen) {
        // the regression lands, the next quiet round must flag
        assert(BenchGate.regression(trusted, after, quiet = true, ok = true).isDefined,
          s"missed a real 2x regression: seed=$seed trusted=$trusted")
      }
    }
  }

  test("an unchanged query whose cost SCALES with machine state never flags (two-sided adoption)") {
    // the r11 ADVICE model: quiet query times are proportional to the
    // run's probe base (same CPU scaling), states drift 0.04-0.16 across
    // runs. The full gate pipeline — anchor walk, two-sided adoption,
    // dormant re-anchor — must never flag. The arithmetic guarantee:
    // adoption state > anchor/AnchorStep, flagging state < QuietFactor x
    // anchor, so the time ratio is < 1.15 x 1.3 = 1.495 < 1.5.
    val costPerState = 20.0
    (1L to 300L).foreach { seed =>
      val states = Gen.listOfN(25, Gen.choose(0.04, 0.16))
        .apply(Gen.Parameters.default, Seed(seed)).get
      var trusted: Option[Double] = None
      var tpb = -1.0
      var dormant = 0
      states.foreach { s =>
        val comparable0 = tpb <= 0 || BenchGate.comparable(s, tpb)
        dormant = if (comparable0) 0 else dormant + 1
        val reanchored = !comparable0 && dormant >= BenchGate.DormantRecoveryRuns
        if (reanchored) { trusted = None; tpb = -1.0; dormant = 0 }
        val comparable = reanchored || comparable0
        val newTpb = BenchGate.nextProbeBase(tpb, s, comparable)
        val adopt = BenchGate.adoptable(s, newTpb)
        val cur = costPerState * s
        val flag = BenchGate.regression(trusted, cur, quiet = comparable, ok = true)
        assert(flag.isEmpty,
          s"state-scaled phantom flag: seed=$seed state=$s tpb=$tpb trusted=$trusted cur=$cur")
        trusted = BenchGate.nextTrusted(trusted, cur, quiet = adopt, ok = true)
        tpb = newTpb
      }
    }
  }

  test("a real 2x slowdown stays flagged every quiet round until it reverts, then clears") {
    val before = 2.0; val after = 4.0
    (1L to 300L).foreach { seed =>
      var trusted: Option[Double] = Some(before)
      var flag: Option[(Double, Double)] = None
      // the slowdown lands, then an arbitrary contended/quiet history
      // follows — the record must survive every round of it
      runs(seed, 12).foreach { r =>
        val cur = if (r.quiet) after * r.wobble else after / r.deflation
        val fresh = BenchGate.regression(trusted, cur, r.quiet, ok = true)
        flag = BenchGate.nextFlag(flag, fresh, cur, r.quiet, ok = true)
        trusted = BenchGate.nextTrusted(trusted, cur, r.quiet, ok = true)
        if (r.quiet) assert(flag.isDefined,
          s"sticky flag lost while the slowdown persists: seed=$seed round=$r")
        flag.foreach { case (p, _) => assert(p === before,
          s"pre-flag baseline drifted: seed=$seed flag=$flag") }
      }
      // the regression reverts: the first quiet measurement near the
      // pre-flag baseline clears the record
      val reverted = before * 1.1
      val fresh = BenchGate.regression(trusted, reverted, quiet = true, ok = true)
      flag = BenchGate.nextFlag(flag, fresh, reverted, quiet = true, ok = true)
      assert(flag.isEmpty, s"flag failed to clear on revert: seed=$seed")
    }
  }

  test("the probe-base anchor always recovers within one normal round of a fast anomaly") {
    (1L to 300L).foreach { seed =>
      val states = Gen.listOfN(15, Gen.choose(0.04, 0.16))
        .apply(Gen.Parameters.default, Seed(seed)).get
      var tpb = states.head
      states.tail.foreach { s =>
        val comp = BenchGate.comparable(s, tpb)
        tpb = BenchGate.nextProbeBase(tpb, s, comp)
        // the anchor can never fall more than one half-band step below
        // the slowest state that was ever comparable — so a machine
        // sitting AT the anchor's own state is always comparable
        assert(BenchGate.comparable(tpb * 1.001, tpb))
      }
    }
  }
}
