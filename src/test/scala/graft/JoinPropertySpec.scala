package graft

import graft.ops.{AsOfJoin, RangeJoin}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based equivalence for the join operators: on random inputs the
  * scale-shaped implementation must equal a brute-force reference computed
  * in plain Scala. Seeded generators keep runs deterministic.
  */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  test("bucketed range join ≡ brute force on random points/intervals") {
    val gen = for {
      nP <- Gen.choose(0, 60)
      points <- Gen.listOfN(nP, Gen.choose(-500L, 500L))
      nI <- Gen.choose(0, 25)
      intervals <- Gen.listOfN(nI, for {
        s <- Gen.choose(-500L, 500L)
        len <- Gen.choose(-50L, 300L) // includes empty/negative intervals
      } yield (s, s + len))
      bucket <- Gen.oneOf(7L, 100L, 1000L) // below, near, above interval scale
    } yield (points, intervals, bucket)
    (1 to 12).foreach { i =>
      val (points, intervals, bucket) = sample(gen, i.toLong)
      val p = points.zipWithIndex.map { case (t, id) => (id.toLong, t) }.toDF("pid", "t")
      val iv = intervals.zipWithIndex.map { case ((s, e), id) => (id.toLong, s, e) }
        .toDF("iid", "start_ms", "end_ms")
      val got = RangeJoin.pointsInIntervals(p, iv, "t", "start_ms", "end_ms", bucket)
        .select($"iid", $"pid").as[(Long, Long)].collect().toSet
      val expected = (for {
        ((s, e), iid) <- intervals.zipWithIndex
        (t, pid) <- points.zipWithIndex
        if t >= s && t < e
      } yield (iid.toLong, pid.toLong)).toSet
      assert(got === expected, s"seed $i: bucket=$bucket")
    }
  }

  test("as-of join (both directions) ≡ brute force on random keyed series") {
    val gen = for {
      nL <- Gen.choose(0, 40)
      left <- Gen.listOfN(nL, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 300L)))
      nR <- Gen.choose(0, 40)
      right <- Gen.listOfN(nR, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 300L)))
    } yield (left, right.distinct) // distinct right (key, ts): tie winner is unspecified
    (1 to 12).foreach { i =>
      val (left, right) = sample(gen, 100L + i)
      val l = left.zipWithIndex.map { case ((k, t), id) => (id.toLong, k, t) }
        .toDF("lid", "k", "ts")
      val r = right.map { case (k, t) => (k, t, s"v$k:$t") }.toDF("k", "ts", "rv")
      Seq(false, true).foreach { forward =>
        val got = AsOfJoin.asOfLeft(l, r, "k", "ts", Seq("rv"), forward = forward)
          .select($"lid", $"rv").as[(Long, Option[String])].collect().toMap
        left.zipWithIndex.foreach { case ((k, t), id) =>
          val candidates = right.filter { case (rk, rt) =>
            rk == k && (if (forward) rt >= t else rt <= t)
          }
          val want = (if (forward) candidates.sortBy(_._2).headOption
                      else candidates.sortBy(-_._2).headOption)
            .map { case (rk, rt) => s"v$rk:$rt" }
          assert(got(id.toLong) === want, s"seed $i forward=$forward lid=$id")
        }
      }
    }
  }
}
