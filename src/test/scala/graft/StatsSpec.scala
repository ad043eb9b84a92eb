package graft

import graft.ops.Stats
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The integer-exact statistics family: each operator checked against an
  * independent in-memory reference computation (not just "runs").
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("mannWhitney matches the textbook midrank computation") {
    // two arms with a known shift; replicate the salted arm assignment
    // per user, then compute U by brute-force pair counting: U_a =
    // #(a > b) + 0.5 #(a == b) over all cross-arm pairs — the doubled
    // u2_a must equal 2·U_a exactly
    val rows = (1 to 200).map { i =>
      (i.toLong % 40, "t", (i % 7).toDouble + (i % 3) * 0.5)
    }
    val df = rows.toDF("user_id", "event_type", "value")
    val out = Stats.mannWhitney(df)
      .as[(String, Long, Long, Long, Long)].collect().head

    val armOf = df.select($"user_id",
      pmod(Cols.hash60(concat(lit("ab:"), $"user_id")), lit(2L)).as("arm"))
      .distinct().as[(Long, Long)].collect().toMap
    val (as, bs) = rows.partition { case (u, _, _) => armOf(u) == 0L }
    val u2 = (for (a <- as; b <- bs) yield {
      if (a._3 > b._3) 2L else if (a._3 == b._3) 1L else 0L
    }).sum
    assert(out._2 === as.size.toLong)
    assert(out._3 === bs.size.toLong)
    assert(out._4 === u2, "doubled U mismatch vs brute-force pair count")
    assert(out._5 === Math.floorDiv(u2 * 10000L, 2L * as.size * bs.size))
  }

  test("mannWhitney: identical distributions give auc_e4 = 5000") {
    // every user contributes the same single value → all ties → U = n_a·n_b/2
    val df = (1 to 100).map(i => (i.toLong, "t", 1.0)).toDF("user_id", "event_type", "value")
    val (_, nA, nB, u2, auc) =
      Stats.mannWhitney(df).as[(String, Long, Long, Long, Long)].collect().head
    assert(u2 === nA * nB)          // 2·U = 2·(n_a·n_b/2)
    assert(auc === 5000L)
  }

  test("mannWhitney property: doubled U equals brute-force pair counting on random data") {
    // seeded ScalaCheck draws (deterministic, same style as
    // ClickstreamPropertySpec) — heavy ties on purpose via a small value
    // domain, multiple event types per draw
    val rowsGen: Gen[List[(Long, String, Double)]] = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, for {
        user <- Gen.choose(1L, 25L)
        tpe <- Gen.oneOf("a", "b")
        v <- Gen.choose(0, 4)
      } yield (user, tpe, v.toDouble / 2.0))
    } yield rows
    // the hash60('ab:'||u) % 2 arm, recomputed locally from md5
    def arm(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ab:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 2
    }
    (1 to 12).flatMap(i => rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { rows =>
        val df = rows.toDF("user_id", "event_type", "value")
        val got = Stats.mannWhitney(df).collect().map(r => r.getString(0) -> r).toMap
        rows.groupBy(_._2).foreach { case (tpe, trows) =>
          val (as, bs) = trows.partition(r => arm(r._1) == 0L)
          val u2 = (for (a <- as; b <- bs) yield {
            if (a._3 > b._3) 2L else if (a._3 == b._3) 1L else 0L
          }).sum
          val r = got(tpe)
          assert(r.getLong(1) === as.size.toLong && r.getLong(2) === bs.size.toLong,
            s"type $tpe arm sizes")
          assert(r.getLong(3) === u2, s"type $tpe doubled U vs brute force")
          if (as.nonEmpty && bs.nonEmpty)
            assert(r.getLong(4) === Math.floorDiv(u2 * 10000L, 2L * as.size * bs.size))
          else assert(r.isNullAt(4), s"type $tpe empty arm must yield NULL auc")
        }
      }
  }

  test("hhi: monopoly is 10^6 ppm, uniform is 10^6/n with effective n") {
    val mono = (1 to 50).map(_ => (1L, "t")).toDF("user_id", "event_type")
    val m = Stats.hhi(mono.withColumn("event_type", lit("t")))
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(m._4 === 1000000L && m._5 === 1L)

    val uniform = (1 to 50).map(i => (i.toLong, "t")).toDF("user_id", "event_type")
    val u = Stats.hhi(uniform).as[(String, Long, Long, Long, Long)].collect().head
    assert(u._4 === 1000000L / 50 && u._5 === 50L)
  }

  test("gini: perfect equality 0; extreme concentration near (n-1)/n") {
    val equal = (1 to 10).map(i => (i.toLong, 100.0)).toDF("o_custkey", "o_totalprice")
    assert(Stats.gini(equal).as[(Long, Long, Long)].collect().head._3 === 0L)

    // one whale: G = (n-1)/n with a whole-dollar whale; 9/10 → 9000 e4
    val whale = ((1 to 9).map(i => (i.toLong, 0.0)) :+ (10L, 1000.0))
      .toDF("o_custkey", "o_totalprice")
    assert(Stats.gini(whale).as[(Long, Long, Long)].collect().head._3 === 9000L)
  }

  test("hourSpearman: a perfectly monotone relationship gives rho_e4 = 10000") {
    // hour h gets h+1 purchase events and h+1 total events → identical
    // rankings; ts lands inside hour h via h*3600000 + 1
    val rows = for {
      h <- 0 until 24
      i <- 0 to h
    } yield (h * 3600000L + 1000L + i, "purchase", i.toLong)
    val df = rows.toDF("ts_ms", "event_type", "user_id")
    val (n, d2, rho) = Stats.hourSpearman(df).as[(Long, Long, Long)].collect().head
    assert(n === 24L && d2 === 0L && rho === 10000L)
  }

  test("hourSpearman: reversed relationship gives rho_e4 = -10000") {
    // purchases rise with hour while total activity falls: hour h has
    // 3·(24-h) filler events and h+1 purchases, so totals 73-2h strictly
    // fall while purchases strictly rise → exactly opposite ranks
    val rows = (for {
      h <- 0 until 24
      i <- 0 until 3 * (24 - h)
    } yield (h * 3600000L + 1000L + i, "view", i.toLong)) ++ (for {
      h <- 0 until 24
      i <- 0 to h
    } yield (h * 3600000L + 2000L + i, "purchase", i.toLong))
    val df = rows.toDF("ts_ms", "event_type", "user_id")
    val (n, _, rho) = Stats.hourSpearman(df).as[(Long, Long, Long)].collect().head
    assert(n === 24L && rho === -10000L)
  }

  test("countMinEstimates: estimate dominates exact; exact-width sketch is tight") {
    // 30 keys, key i appears i times → top-20 well defined
    val rows = for { k <- 1 to 30; _ <- 1 to k } yield Tuple1(k.toLong)
    val df = rows.toDF("user_id")
    val out = graft.ops.Stats.countMinEstimates(df, "user_id", depth = 4, width = 8, topK = 20)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 20)
    // CM's one-sided error: estimate ≥ exact, overcount = est − exact ≥ 0
    out.foreach { case (_, _, exact, est, over) =>
      assert(est >= exact && over === est - exact)
    }
    // rank 1 is the heaviest key (30, count 30)
    val r1 = out.find(_._2 === 1L).get
    assert(r1._1 === 30L && r1._3 === 30L)
    // a wide sketch (no collisions possible: width >> keys) is exact
    val wide = graft.ops.Stats.countMinEstimates(df, "user_id", depth = 4, width = 4096, topK = 20)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(wide.forall(_._5 === 0L), "width 4096 over 30 keys must be collision-free")
  }

  test("labelPropStep: each node adopts its heaviest neighbor, min-id ties") {
    import graft.ops.Analytics
    // triangle with weights: 1-2 (w5), 2-3 (w5), 1-3 (w2)
    val pairs = Seq((1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 2L))
      .toDF("item_a", "item_b", "n_ab")
    val labels = Analytics.labelPropStep(pairs)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(labels(1L) === ((2L, 5L)))  // heaviest edge 1-2
    assert(labels(3L) === ((2L, 5L)))  // heaviest edge 2-3
    // node 2 ties between nbr 1 and nbr 3 at w5 → smallest neighbor id
    assert(labels(2L) === ((1L, 5L)))
  }

  test("seqPairs: direction respected, same-day ties dropped, confidence exact") {
    import graft.ops.Analytics
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // customers 1..4 all buy part 10 first, part 20 later; customer 5
    // buys both same day (tie → dropped); customer 6 buys only part 10
    val orders = Seq(
      (101L, 1L, d("2024-01-01")), (102L, 1L, d("2024-02-01")),
      (103L, 2L, d("2024-01-01")), (104L, 2L, d("2024-02-01")),
      (105L, 3L, d("2024-01-01")), (106L, 3L, d("2024-02-01")),
      (107L, 4L, d("2024-01-01")), (108L, 4L, d("2024-02-01")),
      (109L, 5L, d("2024-03-01")), (110L, 6L, d("2024-01-05"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (101L, 10L), (102L, 20L), (103L, 10L), (104L, 20L),
      (105L, 10L), (106L, 20L), (107L, 10L), (108L, 20L),
      (109L, 10L), (109L, 20L), (110L, 10L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Analytics.seqPairs(orders, lineitem)
      .as[(Long, Long, Long, Long, Long)].collect()
    // only 10 → 20 survives: support 4 (cust 5's same-day tie excluded),
    // 6 customers ever bought part 10 → confidence 4/6 = 6666 e4
    assert(out.toList === List((10L, 20L, 4L, 6L, 6666L)))
  }

  test("seqPairs: a reseller-sized assortment is dropped by the fan-out cap") {
    import graft.ops.Analytics
    import java.sql.Date
    // customer 99 "buys" 1001 distinct parts on consecutive days — alone
    // worth ~500k ordered pairs; three normal customers share 10 → 20
    val reseller = (1 to 1001).map(i =>
      (1000L + i, 99L, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))))
    val normal = Seq(
      (101L, 1L, Date.valueOf("2024-01-01")), (102L, 1L, Date.valueOf("2024-02-01")),
      (103L, 2L, Date.valueOf("2024-01-01")), (104L, 2L, Date.valueOf("2024-02-01")),
      (105L, 3L, Date.valueOf("2024-01-01")), (106L, 3L, Date.valueOf("2024-02-01")))
    val orders = (reseller ++ normal).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val resellerItems = (1 to 1001).map(i => (1000L + i, 5000L + i))
    val normalItems = Seq(
      (101L, 10L), (102L, 20L), (103L, 10L), (104L, 20L), (105L, 10L), (106L, 20L))
    val lineitem = (resellerItems ++ normalItems).toDF("l_orderkey", "l_partkey")
    val out = Analytics.seqPairs(orders, lineitem)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // the reseller is dropped pre-join: only 10 → 20 survives, and n_a
    // counts the 3 capped buyers of part 10, not the reseller's copies
    assert(out === List((10L, 20L, 3L, 3L, 10000L)))
    // cap above the assortment → the pair explosion is back (support 1
    // pairs admitted to make the fan-out visible)
    val uncapped = Analytics.seqPairs(orders, lineitem,
      minPairCount = 1L, maxAssortment = 2000)
    assert(uncapped.count() === 1001L * 1000L / 2 + 1)
  }

  test("exactValueRanks: ceil-rank statistics, sharded rank equals the naive sort") {
    // 10 values $1..$10 scattered across ids: p50 → rank 5 → $5,
    // p90 → rank 9 → $9, p99 → rank ⌈9.9⌉ = 10 → $10
    val rows = (1 to 10).map(i => ((11 - i).toLong, 0L, "e", 0L, i.toDouble))
      .toDF("event_id", "user_id", "event_type", "ts_ms", "value")
    val got = Stats.exactValueRanks(rows)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List((50L, 5L, 500L), (90L, 9L, 900L), (99L, 10L, 1000L)))
    // tie-heavy fixture: the sharded rank must agree with a naive
    // single-partition sort rank (same ceil targets) value-for-value
    val ties = (1 to 500).map(i => (i.toLong, 0L, "e", 0L, (i % 7).toDouble))
      .toDF("event_id", "user_id", "event_type", "ts_ms", "value")
    val sharded = Stats.exactValueRanks(ties)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    val naive = ties
      .select(org.apache.spark.sql.functions.round($"value" * 100).cast("long").as("c"),
        $"event_id")
      .orderBy($"c", $"event_id").as[(Long, Long)].collect().map(_._1)
    val expect = List(50L, 90L, 99L).map(p =>
      (p, (p * 500 + 99) / 100, naive(((p * 500 + 99) / 100).toInt - 1)))
    assert(sharded === expect)
  }

  test("compactionPlan: bins respect the target and partition the files") {
    val df = (1 to 5000).map(i => Tuple1(i.toLong)).toDF("user_id")
    val plan = Stats.compactionPlan(df, "user_id", nBuckets = 32, targetRows = 1000L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(plan.map(_._3).sum === 5000L, "bins must cover every row")
    assert(plan.map(_._2).sum === 32L, "bins must cover every file")
    // contiguity: each bin's bucket range never overlaps the next bin's
    plan.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4, s"bins overlap: $a then $b")
      case _ =>
    }
    // next-fit bound: every bin except the last stops once it crosses the
    // target, so no bin (except possibly one oversized file) exceeds
    // target + max single file
    val maxFile = df.select(pmod(Cols.hash60($"user_id"), lit(32L)).as("b"))
      .groupBy($"b").count().agg(max($"count")).as[Long].collect().head
    plan.dropRight(1).foreach { bin =>
      assert(bin._3 <= 1000L + maxFile, s"bin over target+maxFile: $bin")
    }
  }

  test("permFdr: real effect passes BH, flat series doesn't, p-counts exact") {
    // arm-dependent values for type "eff" (value 100 iff production arm 0)
    // make the observed diff the maximum any re-randomization could reach
    // only by reproducing the exact split → p_num = 1; type "flat" is
    // constant, so EVERY replicate ties the observed 0 → p_num = p_den
    val armOf = (1L to 40L).toDF("user_id")
      .select($"user_id",
        pmod(Cols.hash60(concat(lit("ab:"), $"user_id")), lit(2L)).as("arm"))
      .as[(Long, Long)].collect().toMap
    val rows = (1L to 40L).flatMap { u =>
      Seq((u, "eff", if (armOf(u) == 0L) 100.0 else 0.0), (u, "flat", 5.0))
    }
    val got = Stats.permFdr(rows.toDF("user_id", "event_type", "value"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val (_, n0, n1, obsDiff, pNumE, pDenE, pE6E, rnkE, rawE, bhE) = got("eff")
    assert(n0 === armOf.values.count(_ == 0L) && n1 === armOf.values.count(_ == 1L))
    assert(obsDiff === 100L * 100 * 10000) // mean0 100.00, mean1 0
    assert(pNumE === 1L && pDenE === 65L && pE6E === 1000000L / 65L)
    assert(rnkE === 1L && rawE === 1L && bhE === 1L)
    val (_, _, _, obsF, pNumF, pDenF, pE6F, rnkF, rawF, bhF) = got("flat")
    assert(obsF === 0L && pNumF === 65L && pDenF === 65L && pE6F === 1000000L)
    assert(rnkF === 2L && rawF === 0L && bhF === 0L)
  }

  test("welchScreen matches the quantized-Welch pipeline computed by hand") {
    // 300 users, one value each; replicate the salted arm split, then run
    // the declared integer pipeline (floor at each declared scale) in
    // plain Scala and require bit equality
    val rows = (1 to 300).map(i => (i.toLong, "t", (i % 11).toDouble + (i % 4) * 0.25))
    val df = rows.toDF("user_id", "event_type", "value")
    val out = Stats.welchScreen(df)
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Long)].collect().head

    val armOf = df.select($"user_id",
      pmod(Cols.hash60(concat(lit("ab:"), $"user_id")), lit(2L)).as("arm"))
      .distinct().as[(Long, Long)].collect().toMap
    val cents = rows.map { case (u, _, v) => (armOf(u), Math.round(v * 100)) }
    def moments(arm: Long) = {
      val xs = cents.collect { case (a, c) if a == arm => c }
      (xs.size.toLong, xs.sum, xs.map(c => BigInt(c) * c).sum)
    }
    val (n0, s0, q0) = moments(0L); val (n1, s1, q1) = moments(1L)
    def vOf(n: Long, s: Long, q: BigInt): Long =
      ((BigInt(n) * q - BigInt(s) * s) / (BigInt(n) * (n - 1))).toLong
    val (v0, v1) = (vOf(n0, s0, q0), vOf(n1, s1, q1))
    val se2 = Math.floorDiv(v0 * 100000000L, n0) + Math.floorDiv(v1 * 100000000L, n1)
    val d = Math.floorDiv(s0 * 10000L, n0) - Math.floorDiv(s1 * 10000L, n1)
    val t2 = (BigInt(d) * d * 10000 / BigInt(se2)).toLong
    assert(out === (("t", n0, n1,
      Math.floorDiv(s0 * 10000L, n0), Math.floorDiv(s1 * 10000L, n1),
      se2, Some(t2), if (t2 > 38416L) 1L else 0L)))
  }

  test("welchScreen: degenerate arms are excluded, zero variance gives null t²") {
    // "tiny" has 1 user in one arm → the n>1 filter drops the whole type;
    // "flat" has identical values everywhere → se2_e8 = 0 → null t², flag 0
    val flat = (1 to 100).map(i => (i.toLong, "flat", 5.0))
    val armOf = flat.toDF("user_id", "event_type", "value")
      .select($"user_id",
        pmod(Cols.hash60(concat(lit("ab:"), $"user_id")), lit(2L)).as("arm"))
      .distinct().as[(Long, Long)].collect().toMap
    val loneUser = armOf.collectFirst { case (u, 0L) => u }.get
    val tiny = Seq((loneUser, "tiny", 1.0), (loneUser, "tiny", 2.0),
      (armOf.collectFirst { case (u, 1L) => u }.get, "tiny", 3.0))
    val got = Stats.welchScreen((flat ++ tiny).toDF("user_id", "event_type", "value"))
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Long)]
      .collect().toList
    assert(got.map(_._1) === List("flat"), "single-observation arm must drop the type")
    assert(got.head._7 === None && got.head._8 === 0L)
  }

  test("didScreen: differences out the shared trend; a missing cell drops the type") {
    // one user per arm, one event per (arm, period) at the midpoint cut
    // (mid = ⌊(0+100)/2⌋ = 50, pre ≤ 50 < post): control climbs 1.00 →
    // 2.00 (the shared trend), treatment 1.00 → 5.00, so the DiD is the
    // extra 3.00 = 3,000,000 e4 — not treatment's raw 4.00 climb. "solo"
    // has no post-period rows → all-cells filter drops it.
    val armOf = (1 to 50).map(i => Tuple1(i.toLong)).toDF("user_id")
      .select($"user_id",
        pmod(Cols.hash60(concat(lit("ab:"), $"user_id")), lit(2L)).as("arm"))
      .distinct().as[(Long, Long)].collect().toMap
    val u0 = armOf.collectFirst { case (u, 0L) => u }.get
    val u1 = armOf.collectFirst { case (u, 1L) => u }.get
    val rows = Seq(
      (u0, "t", 0L, 1.0), (u0, "t", 100L, 2.0),
      (u1, "t", 0L, 1.0), (u1, "t", 100L, 5.0),
      (u0, "solo", 0L, 1.0), (u1, "solo", 40L, 1.0))
    val got = Stats.didScreen(rows.toDF("user_id", "event_type", "ts_ms", "value"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toList
    assert(got === List(("t", 1L, 1L, 1L, 1L,
      1000000L, 2000000L, 1000000L, 5000000L, 3000000L)))
  }

  test("ksTest matches brute-force sup |F_a − F_b| on the cent grid") {
    val rows = (1 to 240).map { i =>
      (i.toLong % 50, "t", (i % 9).toDouble + (i % 4) * 0.25)
    }
    val df = rows.toDF("user_id", "event_type", "value")
    val (_, nA, nB, dE6) =
      Stats.ksTest(df).as[(String, Long, Long, Option[Long])].collect().head
    val armOf = df.select($"user_id",
      pmod(Cols.hash60(concat(lit("ab:"), $"user_id")), lit(2L)).as("arm"))
      .distinct().as[(Long, Long)].collect().toMap
    val (as, bs) = rows.partition { case (u, _, _) => armOf(u) == 0L }
    val centsA = as.map(r => Math.round(r._3 * 100)).sorted
    val centsB = bs.map(r => Math.round(r._3 * 100)).sorted
    val grid = (centsA ++ centsB).distinct.sorted
    val dn = grid.map { v =>
      val cumA = centsA.count(_ <= v).toLong
      val cumB = centsB.count(_ <= v).toLong
      Math.abs(cumA * centsB.size - cumB * centsA.size)
    }.max
    assert(nA === as.size.toLong && nB === bs.size.toLong)
    assert(dE6 === Some(Math.floorDiv(dn * 1000000L, nA * nB)))
  }

  test("ksTest: identical distributions give d_e6 = 0; disjoint supports give 10⁶") {
    // "same": every user contributes the one value → both CDFs jump
    // together → D = 0. "split": arm decides the value exactly → at the
    // lower value one CDF is 1 and the other 0 → D = 1
    val same = (1 to 100).map(i => (i.toLong, "same", 2.5))
    val armOf = same.toDF("user_id", "event_type", "value")
      .select($"user_id",
        pmod(Cols.hash60(concat(lit("ab:"), $"user_id")), lit(2L)).as("arm"))
      .distinct().as[(Long, Long)].collect().toMap
    val split = (1 to 100).map(i =>
      (i.toLong, "split", if (armOf(i.toLong) == 0L) 1.0 else 9.0))
    val got = Stats.ksTest((same ++ split).toDF("user_id", "event_type", "value"))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got("same") === Some(0L))
    assert(got("split") === Some(1000000L))
  }

  test("srmCheck: a one-armed type flags, counts match the recomputed arms") {
    val df = (1 to 100).map(i => (i.toLong, "good", 1.0))
      .toDF("user_id", "event_type", "value")
    val armOf = df.select($"user_id",
      pmod(Cols.hash60(concat(lit("ab:"), $"user_id")), lit(2L)).as("arm"))
      .distinct().as[(Long, Long)].collect().toMap
    val armZero = armOf.collect { case (u, 0L) => u }.toList
    // "bad" sees only arm-0 users (a broken exposure filter) — SRM must fire
    val bad = armZero.flatMap(u => Seq((u, "bad", 1.0), (u, "bad", 2.0)))
    val got = graft.ops.Stats.srmCheck((df.as[(Long, String, Double)].collect() ++ bad)
        .toSeq.toDF("user_id", "event_type", "value"))
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val (nA, nB) = (armZero.size.toLong, (armOf.size - armZero.size).toLong)
    assert(got("good")._2 === nA && got("good")._3 === nB)
    assert(got("good")._4 ===
      Math.floorDiv((nA - nB) * (nA - nB) * 10000L, nA + nB))
    // duplicate events must not double-count exposed users
    assert(got("bad")._2 === nA && got("bad")._3 === 0L)
    assert(got("bad")._4 === nA * 10000L && got("bad")._5 === 1L)
  }

  test("powerMde: hand-computed design numbers on a two-point distribution") {
    // force exact moments: every user emits one value, arm decides it —
    // arm 0 → $1.00, arm 1 → $3.00 (cents 100 / 300)
    val users = (1 to 80).map(_.toLong)
    val armOf = users.toDF("user_id")
      .select($"user_id",
        pmod(Cols.hash60(concat(lit("ab:"), $"user_id")), lit(2L)).as("arm"))
      .as[(Long, Long)].collect().toMap
    // two values per arm so the variance is non-degenerate and exact:
    // arm 0 ∈ {100, 300} cents alternating, arm 1 ∈ {100, 300} too →
    // both arms share variance; alternation by user index keeps it exact
    val rows = users.zipWithIndex.map { case (u, i) =>
      (u, "t", if (i % 2 == 0) 1.0 else 3.0)
    }
    val got = graft.ops.Stats.powerMde(rows.toDF("user_id", "event_type", "value"))
      .as[(String, Long, Long, Long, Long, Double, Option[Long])].collect().head
    // independent reference with BigInt floors
    val (a, b) = rows.partition { case (u, _, _) => armOf(u) == 0L }
    def moments(xs: Seq[Double]) = {
      val c = xs.map(x => BigInt(Math.round(x * 100)))
      (BigInt(c.size), c.sum, c.map(x => x * x).sum)
    }
    val (n0, s0, q0) = moments(a.map(_._3)); val (n1, s1, q1) = moments(b.map(_._3))
    def fd(x: BigInt, y: BigInt) = { val q = x / y; if (x % y < 0) q - 1 else q }
    val v0 = fd(n0 * q0 - s0 * s0, n0 * (n0 - 1))
    val v1 = fd(n1 * q1 - s1 * s1, n1 * (n1 - 1))
    val vp = fd((n0 - 1) * v0 + (n1 - 1) * v1, n0 + n1 - 2)
    val mde2 = fd(BigInt(78490) * vp * (n0 + n1), n0 * n1)
    val mean = fd(s0 + s1, n0 + n1)
    val nReq = fd(BigInt(2) * vp * 78490 * 400, mean * mean * 10000) + 1
    assert((got._2, got._3) === ((n0.toLong, n1.toLong)))
    assert(got._4 === vp.toLong)
    assert(got._5 === mde2.toLong)
    assert(got._6 === BigDecimal(Math.sqrt(mde2.toDouble / 10000.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._7 === Some(nReq.toLong))
  }

  test("hazardCurve: hand-built life table with right censoring") {
    // max day = 10, horizon 2 → censor day 8.
    //  u1 days {0,1,2}  → churned at offset 2
    //  u2 days {0..10}  → active past censor → censored at offset 8
    //  u3 day  {5}      → churned at offset 0
    //  u4 days {9,10}   → first activity after censor → excluded
    //  u5 days {3,6}    → churned at offset 3
    val rows =
      Seq(0, 1, 2).map(d => (1L, d.toLong)) ++
        (0 to 10).map(d => (2L, d.toLong)) ++
        Seq((3L, 5L)) ++ Seq((4L, 9L), (4L, 10L)) ++
        Seq((5L, 3L), (5L, 6L))
    val got = Stats
      .hazardCurve(rows.toDF("user_id", "day"), "user_id", col("day"), horizonDays = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List(
      (0L, 4L, 1L, 2500L),
      (2L, 3L, 1L, 3333L),
      (3L, 2L, 1L, 5000L),
      (8L, 1L, 0L, 0L)))
  }

  test("growthDecomposition: volume priced at the reference mean, rate is the complement") {
    // mid = 50. "t": ref {1.00, 2.00} (n=2, 300c), cur {2.00, 3.00,
    // 4.00} (n=3, 900c) → Δ = 600c; volume = +1 event at mean 150c =
    // 1.5e6 e4; rate = 3·(300−150) = 450c = 4.5e6 e4 (exact here).
    // "solo" has no current-half rows → dropped.
    val rows = Seq(
      ("t", 0L, 1.0), ("t", 0L, 2.0),
      ("t", 100L, 2.0), ("t", 100L, 3.0), ("t", 100L, 4.0),
      ("solo", 0L, 9.0))
    val got = Stats.growthDecomposition(rows.toDF("event_type", "ts_ms", "value"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toList
    assert(got === List(
      ("t", 2L, 3L, 300L, 900L, 600L, 1500000L, 4500000L)))
  }

  test("seasonalityStrength: pure weekly pattern reads 10000; mixed reads the exact ratio") {
    val DayMs = 86400000L
    // "t": two weeks, dow-0 days carry 3 events, every other day 1 —
    // within every dow group the daily counts are constant, so ALL
    // variance is between-dow: eta2 = 10000 exactly. peak dow 0 (mean
    // 3.0), trough ties at mean 1.0 -> smallest dow = 1.
    val t = (0 until 14).flatMap { day =>
      val n = if (day % 7 == 0) 3 else 1
      Seq.fill(n)(("t", day * DayMs))
    }
    // "u": day 0 has 1 event, day 7 has 3, every other day 1. By the SS
    // identities: N=14, S=16, Σx²=22 → den=(14·22−256)·10⁶; group term
    // A = ⌊16·10⁶/2⌋ + 6·⌊4·10⁶/2⌋ = 20·10⁶ → num = 24·10⁶ →
    // eta2 = ⌊24·10⁴/52⌋ = 4615
    val u = (0 until 14).flatMap { day =>
      val n = if (day == 7) 3 else 1
      Seq.fill(n)(("u", day * DayMs))
    }
    val got = Stats.seasonalityStrength((t ++ u).toDF("event_type", "ts_ms"))
      .as[(String, Long, Option[Long], Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("t") === ("t", 14L, Some(10000L), 0L, 30000L, 1L, 10000L))
    assert(got("u") === ("u", 14L, Some(4615L), 0L, 20000L, 1L, 10000L))
  }

  test("BootCdf60 equals the Poisson(1) CDF floors recomputed from scratch") {
    // the shared constants are load-bearing in BOTH engines (the oracle
    // embeds them as literals) — pin them against an independent
    // recomputation so a typo cannot silently skew every weight
    var cdf = 0.0
    var p = math.exp(-1.0)
    val expected = (0 until 7).map { k =>
      cdf += p; p /= (k + 1)
      math.floor(cdf * math.pow(2, 60)).toLong
    }
    assert(Stats.BootCdf60 === expected)
    // and the thresholds are strictly increasing, all below 2^60
    assert(Stats.BootCdf60 === Stats.BootCdf60.sorted)
    assert(Stats.BootCdf60.last < (1L << 60))
  }

  test("bootstrapCi matches a brute-force replicate computation") {
    // independent reference: draw the same hash weights row by row, then
    // compute every replicate mean and the band/variance in BigInt —
    // the operator's one-scan aggregate must agree exactly
    val rows = (1 to 100).map { i =>
      (i.toLong, "t", (i % 7).toDouble + (i % 3) * 0.5)
    }
    val df = rows.toDF("event_id", "event_type", "value")
    val got = Stats.bootstrapCi(df)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // (event_type, n, mean_e4, replicates, boot_lo_e4, boot_hi_e4, boot_var_e8)

    val wOf = df.select($"event_id").distinct()
      .crossJoin((0 until 32).toDF("b"))
      .select($"event_id", $"b",
        Stats.BootCdf60
          .map(t => (Cols.hash60(
            concat_ws(":", lit("boot"), $"event_id", $"b")) >= t).cast("long"))
          .reduce(_ + _).as("w"))
      .as[(Long, Int, Long)].collect()
      .map { case (id, b, w) => (id, b) -> w }.toMap
    val cents = rows.map { case (id, _, v) => id -> math.round(v * 100) }.toMap
    val ms = (0 until 32).flatMap { b =>
      val nb = rows.map { case (id, _, _) => wOf((id, b)) }.sum
      val sb = rows.map { case (id, _, _) => wOf((id, b)) * cents(id) }.sum
      if (nb > 0) Some(Math.floorDiv(sb * 10000L, nb)) else None
    }
    val bCount = ms.size.toLong
    val sm = ms.map(BigInt(_)).sum
    val qm = ms.map(m => BigInt(m) * BigInt(m)).sum
    val varE8 = ((BigInt(bCount) * qm - sm * sm) /
      (BigInt(bCount) * BigInt(bCount - 1))).toLong
    assert(got._2 === 100L)
    assert(got._3 === Math.floorDiv(rows.map(r => cents(r._1)).sum * 10000L, 100L))
    assert(got._4 === bCount)
    assert(got._5 === ms.min)
    assert(got._6 === ms.max)
    assert(got._7 === varE8)
    assert(got._5 <= got._3 && got._3 <= got._6,
      "point estimate outside the bootstrap band")
  }

  test("psi: identical halves read zero; a shifted half clamps and flags") {
    // mid = ⌊(0+100)/2⌋ = 50. Type "t": both halves are one event per
    // cent value {0,100,…,900} — every bin has p = q, psi exactly 0.
    // Type "s": same reference half, but the current half piles 10
    // events on value 20.00 → clamps into the top bin; expected psi is
    // recomputed here from the smoothed-share formula term by term.
    val ref = (0 to 9).map(v => ("t", 0L, v.toDouble)) ++
      (0 to 9).map(v => ("s", 0L, v.toDouble))
    val cur = (0 to 9).map(v => ("t", 100L, v.toDouble)) ++
      (1 to 10).map(_ => ("s", 100L, 20.0))
    val got = Stats.psi((ref ++ cur).toDF("event_type", "ts_ms", "value"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("t") === ("t", 10L, 10L, 0L, 0L))

    def term(nr: Long, nc: Long): Long = {
      val p = (nr + 1.0) / 20.0
      val q = (nc + 1.0) / 20.0
      BigDecimal((p - q) * math.log(p / q) * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expected = (0 until 9).map(_ => term(1L, 0L)).sum + term(1L, 10L)
    assert(got("s") === ("s", 10L, 10L, expected, 1L))
    assert(expected > 2000L, "shifted half must cross the 0.2 alert line")
  }

  test("sprtTrace: winning arm crosses the upper Wald boundary on the right day, losing arm the lower") {
    // one user per arm (arm = hash of user_id): find one of each
    def armOf(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ab:$u".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val u0 = (1L to 50L).find(armOf(_) == 0L).get
    val u1 = (1L to 50L).find(armOf(_) == 1L).get
    // arm u0: 10 successes/day (value 40 > 35) — llr climbs 9530/day and
    // must cross +29444 on day 4 (3·9530 = 28590 < 29444 ≤ 4·9530);
    // arm u1: 10 failures/day (value 30) — llr falls 10540/day, crossing
    // −29444 on day 3
    val rows =
      (for (d <- 0 until 5; i <- 0 until 10) yield
        (u0, "t", d * 86400000L + i, 40.0)) ++
      (for (d <- 0 until 5; i <- 0 until 10) yield
        (u1, "t", d * 86400000L + i, 30.0))
    val got = Stats.sprtTrace(rows.toDF("user_id", "event_type", "ts_ms", "value"))
      .select("arm", "day", "n_cum", "s_cum", "llr_e4", "decision")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    (0 until 5).foreach { d =>
      val w = got((0L, d.toLong)); val l = got((1L, d.toLong))
      assert(w._3 === (d + 1) * 10L && w._4 === (d + 1) * 10L)
      assert(w._5 === (d + 1) * 10L * 953L)
      assert(w._6 === (if ((d + 1) * 9530L >= 29444L) "accept_h1" else "continue"))
      assert(l._4 === 0L && l._5 === (d + 1) * 10L * -1054L)
      assert(l._6 === (if ((d + 1) * 10540L >= 29444L) "accept_h0" else "continue"))
    }
    // the crossing days themselves
    assert(got((0L, 2L))._6 === "continue" && got((0L, 3L))._6 === "accept_h1")
    assert(got((1L, 1L))._6 === "continue" && got((1L, 2L))._6 === "accept_h0")
  }

  test("madAnomalies: a 10x spike can't inflate its own yardstick; in-band wobble never flags") {
    // type "s": six 10-count days + one 100-count day. Median stays 10
    // (a mean-based baseline would move to ~23), MAD is 0 → clamps to 1,
    // and only the spike (dev 90 > 3) flags.
    val spike = (for (d <- 0 until 6; i <- 0 until 10)
      yield (1L, "s", d * 86400000L + i, 1.0)) ++
      (0 until 100).map(i => (1L, "s", 6 * 86400000L + i, 1.0))
    // type "w": wobble {8,10,12,10,9,11,10} → med 10, MAD 1, all devs ≤ 2
    val wob = Seq(8, 10, 12, 10, 9, 11, 10)
    val wobble = for (d <- wob.indices; i <- 0 until wob(d))
      yield (1L, "w", d * 86400000L + i, 1.0)
    val got = Stats.madAnomalies((spike ++ wobble).toDF("user_id", "event_type", "ts_ms", "value"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("s", 6L)) === (("s", 6L, 100L, 10L, 0L, 90L, 1L)))
    (0L to 5L).foreach(d => assert(got(("s", d))._7 === 0L))
    wob.indices.foreach { d =>
      val r = got(("w", d.toLong))
      assert(r._4 === 10L && r._5 === 1L && r._7 === 0L)
    }
  }

  test("captureRecapture matches an independent replication of the hash captures and Chapman math") {
    def caught(salt: String, eventId: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$salt$eventId".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 10 == 0
    }
    // 40 users × 3 events each (event_id = user*10+k) — enough that both
    // samples catch some users and miss others
    val rows = for (u <- 1L to 40L; k <- 0L until 3L)
      yield (u * 10 + k, u, "t", k * 1000L, 1.0)
    val got = Stats.captureRecapture(
      rows.toDF("event_id", "user_id", "event_type", "ts_ms", "value"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    val byUser = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val s1 = byUser.filter(_._2.exists(caught("cr1:", _))).keySet
    val s2 = byUser.filter(_._2.exists(caught("cr2:", _))).keySet
    val (n1, n2, m, nAct) = (s1.size.toLong, s2.size.toLong, (s1 & s2).size.toLong, 40L)
    val nHat = Math.floorDiv((n1 + 1) * (n2 + 1), m + 1) - 1
    assert(got === (("t", n1, n2, m, nAct, nHat,
      Math.floorDiv((nHat - nAct) * 10000L, nAct))))
    assert(m > 0 && m < n1.min(n2), "fixture must have partial overlap to exercise the estimator")
  }

  test("holtBacktest matches a plain-Scala fold of the same integer recurrences") {
    // deterministic bumpy series: counts 1..12 with a 3-period wobble
    val counts = (0 until 12).map(d => 3L + d + (d % 3) * 2L)
    val rows = for (d <- counts.indices; i <- 0 until counts(d).toInt)
      yield (1L, "t", d * 86400000L + i, 1.0)
    val got = Stats.holtBacktest(rows.toDF("user_id", "event_type", "ts_ms", "value"))
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    // reference: the same recurrences in plain Scala
    var l = counts.head * 10000L; var b = 0L; var he = 0L; var ne = 0L; var n = 0L
    counts.tail.zip(counts).foreach { case (y, py) =>
      val fc = l + b
      he += math.abs(y * 10000L - fc)
      ne += math.abs(y - py) * 10000L
      n += 1
      val l2 = Math.floorDiv(y * 10000L + fc, 2L)
      b = Math.floorDiv(l2 - l + b, 2L)
      l = l2
    }
    assert(got === (("t", 12L, n, Math.floorDiv(he, n), Math.floorDiv(ne, n),
      if (Math.floorDiv(he, n) < Math.floorDiv(ne, n)) 1L else 0L)))
    // a constant series: Holt and naive both score zero error, no win
    val flat = for (d <- 0 until 6; i <- 0 until 4)
      yield (1L, "f", d * 86400000L + i, 1.0)
    val gf = Stats.holtBacktest(flat.toDF("user_id", "event_type", "ts_ms", "value"))
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(gf === (("f", 6L, 5L, 0L, 0L, 0L)))
  }

  test("holtWinters: matches a plain-Scala fold; beats Holt on a weekly series; ties flat") {
    // strongly weekly series over 4 weeks: Mondays (day % 7 == 0) spike
    // 10 → 50. Holt pays the full spike error every week; Holt–Winters
    // learns the slot after the first hit
    val counts = (0 until 28).map(d => if (d % 7 == 0) 50L else 10L)
    val rows = for (d <- counts.indices; i <- 0 until counts(d).toInt)
      yield (1L, "w", d * 86400000L + i, 1.0)
    val got = Stats.holtWintersBacktest(rows.toDF("user_id", "event_type", "ts_ms", "value"))
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    // reference: the same integer recurrences in plain Scala
    var l = counts.head * 10000L; var b = 0L
    val s = Array.fill(7)(0L)
    var lh = l; var bh = 0L; var hwe = 0L; var he = 0L; var n = 0L
    counts.indices.tail.foreach { d =>
      val y = counts(d) * 10000L
      val dow = d % 7
      hwe += math.abs(y - (l + b + s(dow)))
      he += math.abs(y - (lh + bh))
      n += 1
      val l2 = Math.floorDiv(y - s(dow) + l + b, 2L)
      val b2 = Math.floorDiv(l2 - l + b, 2L)
      s(dow) = Math.floorDiv(y - l2 + s(dow), 2L)
      l = l2; b = b2
      val lh2 = Math.floorDiv(y + lh + bh, 2L)
      bh = Math.floorDiv(lh2 - lh + bh, 2L)
      lh = lh2
    }
    val (hwMae, hMae) = (Math.floorDiv(hwe, n), Math.floorDiv(he, n))
    assert(got === (("w", 28L, n, hwMae, hMae, if (hwMae < hMae) 1L else 0L)))
    assert(got._6 === 1L, "weekly spike series: Holt–Winters must win")
    // a constant series: both models exact after day 1, no winner
    val flat = for (d <- 0 until 9; i <- 0 until 4)
      yield (1L, "f", d * 86400000L + i, 1.0)
    val gf = Stats.holtWintersBacktest(flat.toDF("user_id", "event_type", "ts_ms", "value"))
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(gf === (("f", 9L, 8L, 0L, 0L, 0L)))
  }

  test("cusum: a mid-series level shift alarms on the hand-computed day; a flat series never does") {
    // type "f": constant 10.00/day for 10 days — zero deviations, no alarm.
    // type "s": days 0-4 at 10.00, days 5-9 at 40.00. Mean-of-daily-means
    // = 2500 cents; dev = -1500 before, +1500 after. c+ walks 1500/day
    // from day 5 and crosses the 2000-cent limit on day 6 (3000 > 2000);
    // c- peaked at 5*1500 = 7500 during the low half WITHOUT alarming
    // only if... it crosses too (7500 > 2000, day 1) — so the alarm day
    // is the FIRST crossing of either side: day 1 on the negative side.
    val rows =
      (0 until 10).map(d => (1L, "f", d * 86400000L, 10.0)) ++
      (0 until 10).map(d => (1L, "s", d * 86400000L, if (d < 5) 10.0 else 40.0))
    val got = Stats.cusum(rows.toDF("user_id", "event_type", "ts_ms", "value"))
      .select("event_type", "n_days", "max_cusum_pos", "max_cusum_neg", "alarm_day", "alarm")
      .as[(String, Long, Long, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("f") === (("f", 10L, 0L, 0L, None, 0L)))
    // shift type: c- maxes at 5·1500 = 7500 (low half), c+ at 5·1500 =
    // 7500 (high half); first crossing is day 1 (c- = 3000 > 2000)
    assert(got("s") === (("s", 10L, 7500L, 7500L, Some(1L), 1L)))
  }
}
