package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The flatMapGroupsWithState sessionizer must agree with the built-in
  * session_window pipeline on the golden sequences.
  */
class CustomStateSessionizerSpec extends SparkSpec {
  import spark.implicits._


  private def ce(user: Int, ts: Long, eventType: String, productType: String): CE =
    CE("ip", ts, "web", eventType, productType, user, 0L, 0L)

  test("custom-state sessions match the declarative sessionizer") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CE]
    val q = CustomStateSessionizer
      .sessions(spark, ClickstreamStreams.fromClickEvents(input.toDF()))
      .writeStream.format("memory").queryName("cs_state").outputMode("append").start()
    try {
      input.addData(Seq(
        ce(1, 1000L, "browse", "Kitchen"),
        ce(1, 1100L, "browse", "Garden"),
        ce(1, 1300L, "order_checkout", "N/A"),
        ce(1, 3000L, "browse", "Books"), // gap >= 1s → second session
        ce(2, 1000L, "browse", "")))
      q.processAllAvailable()
      input.addData(ce(99, 10_000_000L, "browse", "N/A")) // advance watermark
      q.processAllAvailable()
      input.addData(ce(99, 20_000_000L, "browse", "N/A"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cs_state")
      .filter(col("user_id").isin(1, 2))
      .select("user_id", "event_count", "checkout_event_count", "dept_list",
        "win_begin_ms", "win_end_ms")
      .as[(Long, Long, Long, String, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 2L, 2L, "Garden,Kitchen", 1000L, 2300L),
      (1L, 1L, 0L, "Books", 3000L, 4000L),
      (2L, 0L, 0L, "", 1000L, 2000L)))
  }

  test("custom-state sessionizer replays real sf0.001 events identically to batch") {
    import graft.ops.Clickstream
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts_ms"), col("event_type"))
      .as[(Long, Long, String)].collect().sortBy(r => (r._2, r._1)).toList
    // map onto the ClickEvent semantics the same way sessionizeTyped does:
    // purchase plays order_checkout (non-qualifying), others are departments
    val input = MemoryStream[(Long, Long, String, String)]
    val stream = input.toDF().toDF("user_id", "ts_ms", "event_type", "product_type")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = CustomStateSessionizer
      .sessions(spark, stream, gapMs = Clickstream.DefaultGapMs)
      .writeStream.format("memory").queryName("cs_state_real").outputMode("append").start()
    try {
      input.addData(ev.map { case (u, t, et) =>
        if (et == "purchase") (u, t, "order_checkout", "N/A") else (u, t, et, et)
      })
      q.processAllAvailable()
      // flush: advance the watermark far past every real session
      input.addData((999999L, ev.map(_._2).max + 100L * Clickstream.DefaultGapMs, "browse", "N/A"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cs_state_real")
      .filter(col("user_id") =!= 999999L)
      .select("user_id", "event_count", "checkout_event_count", "dept_list",
        "win_begin_ms", "win_end_ms")
      .as[(Long, Long, Long, String, Long, Long)].collect().toSet
    val batch = Clickstream.sessionize(graft.Tables.events(spark, dir))
      .select("user_id", "event_count", "checkout_event_count", "dept_list",
        "win_begin_ms", "win_end_ms")
      .as[(Long, Long, Long, String, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("tie rule: qualifying event sharing the last checkout's ts is counted") {
    import CustomStateSessionizer.{finish, Ev}
    def ev(t: Long, et: String, pt: String) = Ev(1, new java.sql.Timestamp(t), et, pt)
    // the browse at ts=1300 shares the checkout's timestamp: it must be in
    // the snapshot regardless of buffer order (ADVICE r2 pin, shared with
    // UserAggregateTyped)
    val s = finish(List(
      ev(1000, "browse", "A"),
      ev(1300, "order_checkout", "N/A"),
      ev(1300, "browse", "B"),
      ev(1400, "browse", "C")), gapMs = 1000L)
    assert(s.event_count === 3L)
    assert(s.checkout_event_count === 2L) // A and the tied B; not C
  }

  test("split: strict gap rule (delta >= gap starts a new session)") {
    import CustomStateSessionizer.{split, Ev}
    def ev(t: Long) = Ev(1, new java.sql.Timestamp(t), "a", "A")
    val evs = List(ev(1000), ev(1500), ev(2499), ev(5000))
    // 2499-1500=999 < 1000 merges; session_window semantics: [t, t+gap)
    assert(split(evs, 1000L).map(_.map(_.ts_ms)) ===
      List(List(1000L, 1500L, 2499L), List(5000L)))
    // exactly-at-gap splits (matches Clickstream.withSessionIds and
    // session_window's half-open windows)
    assert(split(List(ev(1000), ev(2000)), 1000L).map(_.map(_.ts_ms)) ===
      List(List(1000L), List(2000L)))
  }
}
