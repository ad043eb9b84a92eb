package graft

import graft.ops.Clickstream
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over random event streams (SURVEY.md §5.4).
  * Uses seeded ScalaCheck generators directly (deterministic runs, no
  * scalatestplus bridge needed); generation is bounded so each property
  * stays fast while still hitting gap boundaries and checkout orderings.
  */
class ClickstreamPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 1000L

  private val eventsGen: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(
      n,
      for {
        user <- Gen.choose(1L, 4L)
        ts <- Gen.choose(0L, 8000L)
        tpe <- Gen.oneOf("click", "view", "purchase")
      } yield (user, ts, tpe))
  } yield rows

  private def samples(count: Int): Seq[List[(Long, Long, String)]] =
    (1 to count).flatMap(i =>
      eventsGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def df(rows: List[(Long, Long, String)]): DataFrame =
    rows.zipWithIndex
      .map { case ((u, t, tp), i) => (i.toLong, u, tp, t) }
      .toDF("event_id", "user_id", "event_type", "ts_ms")

  test("invariants: snapshot <= count; windows well-formed, non-overlapping; counts partition") {
    samples(15).foreach { rows =>
      val sessions = Clickstream.sessionize(df(rows), Gap)
        .select("user_id", "event_count", "checkout_event_count", "win_begin_ms", "win_end_ms")
        .as[(Long, Long, Long, Long, Long)].collect().toList
      sessions.foreach { case (_, n, snap, b, e) =>
        assert(snap <= n)
        assert(b < e)
      }
      sessions.groupBy(_._1).values.foreach { ss =>
        ss.map(s => (s._4, s._5)).sorted.sliding(2).foreach {
          case Seq((_, e1), (b2, _)) => assert(e1 <= b2)
          case _ =>
        }
      }
      // sessions partition the events: qualifying-event counts sum up
      assert(sessions.map(_._2).sum === rows.count(_._3 != "purchase"))
    }
  }

  test("invariant: percent_buy in [0, 100], exactly integer division") {
    samples(10).foreach { rows =>
      val kpis = Clickstream.userKpis(Clickstream.sessionize(df(rows), Gap), 5000L)
        .select("session_count", "buy_session_count", "percent_buy")
        .as[(Long, Long, Double)].collect().toList
      kpis.foreach { case (n, buys, pct) =>
        assert(buys <= n)
        assert(pct >= 0.0 && pct <= 100.0)
        assert(pct === (buys * 100 / n).toDouble)
      }
    }
  }

  test("property: declarative and typed-Aggregator sessionizers agree on random streams") {
    // random ts in a small range forces same-timestamp ties, exercising
    // the shared inclusive checkout tie rule (ADVICE r2)
    def canon(d: DataFrame) = d
      .select("user_id", "session_seq", "event_count", "checkout_event_count",
        "dept_list", "win_begin_ms", "win_end_ms")
      .as[(Long, Long, Long, Long, String, Long, Long)].collect().toSet
    samples(12).foreach { rows =>
      assert(
        canon(Clickstream.sessionize(df(rows), Gap)) ===
          canon(Clickstream.sessionizeTyped(df(rows), Gap)))
    }
  }

  test("invariant: input arrival order never changes session results") {
    samples(8).foreach { rows =>
      def run(rs: List[(Long, Long, String)]) =
        Clickstream.sessionize(df(rs), Gap)
          .select("user_id", "session_seq", "event_count", "checkout_event_count", "dept_list")
          .as[(Long, Long, Long, Long, String)].collect().toSet
      // the order-independent formulation (SURVEY §2.2): reversing arrival
      // order (event_ids reassigned) must leave every session identical
      assert(run(rows) === run(rows.reverse))
    }
  }
}
