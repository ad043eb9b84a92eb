package graft

import graft.ops.Clickstream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-sequence tests for the batch clickstream operators — the
  * FIXTURES.md §1 hand-built sequences, mapped onto the events-table
  * analog (purchase = order_checkout; event_type = department).
  * Gap = 1000 ms like the reference (ClickstreamProcessor.java:129).
  */
class ClickstreamSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 1000L

  private def ev(rows: (Long, Long, String)*): DataFrame =
    rows.zipWithIndex
      .map { case ((user, ts, tpe), i) => (i.toLong, user, tpe, ts) }
      .toDF("event_id", "user_id", "event_type", "ts_ms")

  private def sess(df: DataFrame) =
    Clickstream.sessionize(df, Gap)
      .select("user_id", "session_seq", "event_count", "checkout_event_count",
        "dept_list", "win_begin_ms", "win_end_ms")
      .as[(Long, Long, Long, Long, String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toList

  test("buy session: counts, snapshot, sorted dept set") {
    // browse Kitchen/Garden/Kitchen then checkout (FIXTURES buy session)
    val got = sess(ev(
      (1L, 1000L, "kitchen"), (1L, 1100L, "garden"), (1L, 1200L, "kitchen"),
      (1L, 1300L, "purchase")))
    assert(got === List((1L, 1L, 3L, 3L, "garden,kitchen", 1000L, 2300L)))
  }

  test("no-buy session: checkout_event_count = 0, survives KPI denominators") {
    val got = sess(ev((2L, 1000L, "books"), (2L, 1100L, "books")))
    assert(got === List((2L, 1L, 2L, 0L, "books", 1000L, 2100L)))
  }

  test("gap split: silence >= gap starts a new session") {
    val got = sess(ev((1L, 1000L, "a"), (1L, 1999L, "a"), (1L, 2999L, "a")))
    // 1999 merges (gap 999 < 1000), 2999 starts fresh (gap 1000 >= 1000)
    assert(got === List(
      (1L, 1L, 2L, 0L, "a", 1000L, 2999L),
      (1L, 2L, 1L, 0L, "a", 2999L, 3999L)))
  }

  test("gap sensitivity: one-pass session counts across thresholds") {
    val df = ev(
      (1L, 0L, "a"), (1L, 500L, "a"), (1L, 2000L, "a"), // gaps: null, 500, 1500
      (2L, 0L, "a")) // gap: null
    val got = Clickstream.gapSensitivity(df, Seq(400L, 1000L, 2000L))
      .as[(Long, Long)].collect().sortBy(_._1).toList
    assert(got === List((400L, 4L), (1000L, 3L), (2000L, 2L)))
    // the production threshold agrees with the sessionizer's output
    val sessions = Clickstream.sessionize(df, 1000L).count()
    assert(sessions === 3L)
  }

  test("post-checkout browse: snapshot excludes later events") {
    val got = sess(ev((1L, 1000L, "a"), (1L, 1100L, "purchase"), (1L, 1200L, "b")))
    assert(got === List((1L, 1L, 2L, 1L, "a,b", 1000L, 2200L)))
  }

  test("multi-checkout: last checkout wins") {
    val got = sess(ev(
      (1L, 1000L, "a"), (1L, 1100L, "purchase"), (1L, 1200L, "b"),
      (1L, 1300L, "purchase"), (1L, 1400L, "c")))
    // snapshot at second checkout: qualifying events at ts <= 1300 → a, b
    assert(got === List((1L, 1L, 3L, 2L, "a,b,c", 1000L, 2400L)))
  }

  test("user KPIs: integer-division percent widened to double") {
    val sessions = Clickstream.sessionize(ev(
      (1L, 1000L, "a"), (1L, 1100L, "purchase"),
      (2L, 1000L, "a"), (2L, 1050L, "purchase"),
      (3L, 1000L, "a")), Gap)
    val kpi = Clickstream.userKpis(sessions, 10000L)
      .select("win_start_ms", "session_count", "buy_session_count", "percent_buy", "win_end_ms")
      .as[(Long, Long, Long, Double, Long)].collect().toList
    // 3 sessions, 2 buys → 2*100 div 3 = 66 → 66.0 (not 66.67)
    assert(kpi === List((0L, 3L, 2L, 66.0, 10000L)))
  }

  test("departments: per-window session counts from exploded dept sets") {
    val sessions = Clickstream.sessionize(ev(
      (1L, 1000L, "kitchen"), (1L, 1100L, "garden"),
      (2L, 1000L, "kitchen"),
      (3L, 1000L, "purchase")), Gap) // dept_list empty → no rows
    val got = Clickstream.departments(sessions, 10000L)
      .select("department", "department_count", "win_start_ms", "win_end_ms")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List(("garden", 1L, 0L, 10000L), ("kitchen", 2L, 0L, 10000L)))
  }

  test("session features: position, dwell, gap; null gap on session firsts") {
    // user 1: session 1 = events at 1000/1100/1400, session 2 = event at 5000
    val got = Clickstream.sessionFeatures(ev(
      (1L, 1000L, "a"), (1L, 1100L, "b"), (1L, 1400L, "a"), (1L, 5000L, "c")), Gap)
      .select("event_id", "session_seq", "event_idx", "ms_since_start", "gap_ms")
      .as[(Long, Long, Long, Long, Option[Long])]
      .collect().sortBy(_._1).toList
    assert(got === List(
      (0L, 1L, 1L, 0L, None),
      (1L, 1L, 2L, 100L, Some(100L)),
      (2L, 1L, 3L, 400L, Some(300L)),
      (3L, 2L, 1L, 0L, None)))
  }

  test("session features plan: one shuffle for all three windows") {
    // session assignment partitions by user_id; the per-session windows are
    // sub-clustered under the same hash partitioning (prefix key), so Spark
    // must add sorts only — a second exchange would double the shuffle cost
    // of the hottest stage at 100 TB
    val plan = Clickstream.sessionFeatures(ev(
      (1L, 1000L, "a"), (1L, 1100L, "b"), (2L, 1000L, "a")), Gap)
      .queryExecution.executedPlan.toString()
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected exactly 1 shuffle, plan:\n$plan")
  }

  test("entry conversion: sessions keyed by first event type, buy share e4") {
    val got = Clickstream.entryConversion(ev(
      // user 1 session 1: enters on "view", buys → converted
      (1L, 1000L, "view"), (1L, 1100L, "purchase"),
      // user 1 session 2: enters on "click", no buy
      (1L, 9000L, "click"),
      // user 2: enters on "view", no buy
      (2L, 1000L, "view"), (2L, 1200L, "click")), Gap)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List(
      ("click", 1L, 0L, 0L),
      ("view", 2L, 1L, 5000L)))
  }

  test("depth conversion: qualifying-depth buckets, 10+ cap, checkout share e4") {
    val deep = (0 until 11).map(i => (2L, 1000L + i * 10, "view")) :+
      ((2L, 1200L, "purchase"))
    val got = Clickstream.depthConversion(ev(Seq(
      // user 1 session 1: depth 2, buys; session 2: depth 1, no buy
      (1L, 1000L, "view"), (1L, 1100L, "click"), (1L, 1150L, "purchase"),
      (1L, 9000L, "view"),
      // user 3: checkout-only session — depth 0 but converted
      (3L, 1000L, "purchase")) ++ deep: _*), Gap)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List(
      (0L, 1L, 1L, 10000L),
      (1L, 1L, 0L, 0L),
      (2L, 1L, 1L, 10000L),
      (10L, 1L, 1L, 10000L))) // user 2's depth 11 folds into the 10+ bucket
  }

  test("dwell by type: lead gaps within sessions, histogram quantiles, boundaries dropped") {
    val got = Clickstream.dwellByType(ev(
      // user 1, one session: view→100ms→click→200ms→view→300ms→click(last)
      (1L, 0L, "view"), (1L, 100L, "click"), (1L, 300L, "view"), (1L, 600L, "click"),
      // user 2: the second event is exactly one gap away → NEW session,
      // so the first event contributes no dwell across the boundary
      (2L, 0L, "view"), (2L, Gap, "view")), Gap)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    // view: dwells {100, 300} → lower median 100, p95 300; click: {200}
    assert(got === List(
      ("click", 1L, 200L, 200L, 200L, 200L),
      ("view", 2L, 400L, 100L, 300L, 300L)))
  }

  test("window-boundary bucketing uses session end - 1 ms (SURVEY §2.4)") {
    // session of one event at 8999: end = 9999 → bucket (9999-1)=9998 → window [0,10000)
    // session of one event at 9000: end = 10000 → (10000-1)=9999 → window [0,10000)
    // session of one event at 9001: end = 10001 → 10000 → window [10000,20000)
    val sessions = Clickstream.sessionize(ev(
      (1L, 8999L, "a"), (2L, 9000L, "a"), (3L, 9001L, "a")), Gap)
    val got = Clickstream.userKpis(sessions, 10000L)
      .select("win_start_ms", "session_count").as[(Long, Long)]
      .collect().sortBy(_._1).toList
    assert(got === List((0L, 2L), (10000L, 1L)))
  }
}
