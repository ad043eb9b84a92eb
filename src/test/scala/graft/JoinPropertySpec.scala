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

  test("session concurrency ≡ brute-force sweep on random events") {
    val D = graft.ops.TimeSeries.DayMs
    val gapMs = 1800000L
    val gen = for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 5L)
        t <- Gen.choose(0L, 3 * D - 1)
      } yield (u, t))
    } yield evs
    (1 to 12).foreach { i =>
      val evs = sample(gen, 100L + i)
      val df = evs.zipWithIndex
        .map { case ((u, t), id) => (id.toLong, u, t) }
        .toDF("event_id", "user_id", "ts_ms")
      val got = graft.ops.Analytics.sessionConcurrency(df, gapMs)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      // brute force: islands per user → ±1 transitions → instant-order sweep
      val sessions = evs.groupBy(_._1).values.flatMap { us =>
        val ts = us.map(_._2).sorted
        ts.tail.foldLeft(List((ts.head, ts.head))) { case (acc @ ((s, e) :: rest), t) =>
          if (t - e > gapMs) (t, t) :: acc else (s, t) :: rest
          case (Nil, _) => Nil // unreachable
        }
      }.toList
      val deltas = sessions.flatMap { case (s, e) => Seq((s, 1L), (e + 1, -1L)) }
      val byTs = deltas.groupBy(_._1).view.mapValues(_.map(_._2).sum).toList.sortBy(_._1)
      val running = byTs.scanLeft((Long.MinValue, 0L)) {
        case ((_, acc), (t, net)) => (t, acc + net)
      }.tail
      val days = deltas.map { case (t, _) => Math.floorDiv(t, D) }.distinct.sorted
      val expected = days.map { d =>
        val carry = running.filter(_._1 < d * D).lastOption.map(_._2).getOrElse(0L)
        val inDay = running.filter(r => r._1 >= d * D && r._1 < (d + 1) * D).map(_._2)
        val peak = (carry :: inDay).max
        val starts = sessions.count(s => Math.floorDiv(s._1, D) == d).toLong
        d -> (starts, peak)
      }.toMap
      assert(got === expected, s"seed $i")
    }
  }

  test("open orders ≡ brute-force interval count on random orders") {
    val D = graft.ops.TimeSeries.DayMs
    val gen = for {
      nO <- Gen.choose(1, 15)
      orders <- Gen.listOfN(nO, Gen.choose(0L, 5L)) // order day
      lines <- Gen.listOfN(nO, Gen.choose(0, 3)) // lines per order
      offs <- Gen.listOfN(nO * 3, Gen.choose(0L, 6L)) // ship-day offsets ≥ 0
    } yield (orders, lines, offs)
    (1 to 12).foreach { i =>
      val (orderDays, lineCounts, offs) = sample(gen, 200L + i)
      val orders = orderDays.zipWithIndex
        .map { case (pd, k) => (k.toLong, new java.sql.Timestamp(pd * D)) }
        .toDF("o_orderkey", "o_orderdate")
      val lineRows = orderDays.zipWithIndex.flatMap { case (pd, k) =>
        (0 until lineCounts(k)).map(j =>
          (k.toLong, new java.sql.Timestamp((pd + offs(k * 3 + j)) * D)))
      }
      val lines = lineRows.toDF("l_orderkey", "l_shipdate")
      val got = graft.ops.TimeSeries.openOrders(orders, lines)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      // brute: per order with ≥1 line, interval [pd, max ship day]
      val iv = orderDays.zipWithIndex.collect {
        case (pd, k) if lineCounts(k) > 0 =>
          (pd, pd + (0 until lineCounts(k)).map(j => offs(k * 3 + j)).max)
      }
      val days = iv.flatMap { case (p, s) => Seq(p, s + 1) }.distinct.sorted
      val expected = days.map { d =>
        d -> (iv.count(_._1 == d).toLong, iv.count(o => o._1 <= d && o._2 >= d).toLong)
      }.toMap
      assert(got === expected, s"seed $i")
    }
  }
}
