package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The timer-driven transformWithState sessionizer must agree with the
  * declarative session_window pipeline and the batch sessionizer —
  * completing the 1≡2≡3 equivalence across all three formulations.
  * Requires the RocksDB state store provider — set per test, restored.
  */
class TimerSessionizerSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }


  private def ce(user: Int, ts: Long, eventType: String, productType: String): CE =
    CE("ip", ts, "web", eventType, productType, user, 0L, 0L)

  test("timer sessions match the declarative sessionizer on the golden sequence") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[CE]
      val q = TimerSessionizer
        .sessions(spark, ClickstreamStreams.fromClickEvents(input.toDF()))
        .writeStream.format("memory").queryName("cs_timer").outputMode("append").start()
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
      val got = spark.table("cs_timer")
        .filter(col("user_id").isin(1, 2))
        .select("user_id", "event_count", "checkout_event_count", "dept_list",
          "win_begin_ms", "win_end_ms")
        .as[(Long, Long, Long, String, Long, Long)].collect().toSet
      assert(got === Set(
        (1L, 2L, 2L, "Garden,Kitchen", 1000L, 2300L),
        (1L, 1L, 0L, "Books", 3000L, 4000L),
        (2L, 0L, 0L, "", 1000L, 2000L)))
    }
  }

  test("timer re-arms across micro-batches: a session spanning batches stays merged") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[CE]
      val q = TimerSessionizer
        .sessions(spark, ClickstreamStreams.fromClickEvents(input.toDF()))
        .writeStream.format("memory").queryName("cs_timer_rearm").outputMode("append").start()
      try {
        // batch 1 arms a timer at 1500+gap; batch 2 extends the same
        // session (delta 900 < gap 1000) so the timer must be deleted and
        // re-armed at 2400+gap, NOT fire at the old expiry
        input.addData(ce(1, 1000L, "browse", "Kitchen"), ce(1, 1500L, "browse", "Garden"))
        q.processAllAvailable()
        input.addData(ce(1, 2400L, "browse", "Books"))
        q.processAllAvailable()
        input.addData(ce(99, 10_000_000L, "browse", "N/A"))
        q.processAllAvailable()
        input.addData(ce(99, 20_000_000L, "browse", "N/A"))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("cs_timer_rearm")
        .filter(col("user_id") === 1)
        .select("user_id", "event_count", "dept_list", "win_begin_ms", "win_end_ms")
        .as[(Long, Long, String, Long, Long)].collect().toSet
      // one merged session, not two — the re-armed timer held the window open
      assert(got === Set((1L, 3L, "Books,Garden,Kitchen", 1000L, 3400L)))
    }
  }

  test("timer sessionizer replays real sf0.001 events identically to batch") {
    withRocksDb {
      import graft.ops.Clickstream
      implicit val sqlCtx = spark.sqlContext
      val dir = "/root/testdata/sf0.001"
      val ev = graft.Tables.events(spark, dir)
        .select(col("user_id"), col("ts_ms"), col("event_type"))
        .as[(Long, Long, String)].collect().sortBy(r => (r._2, r._1)).toList
      val input = MemoryStream[(Long, Long, String, String)]
      val stream = input.toDF().toDF("user_id", "ts_ms", "event_type", "product_type")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      val q = TimerSessionizer
        .sessions(spark, stream, gapMs = Clickstream.DefaultGapMs)
        .writeStream.format("memory").queryName("cs_timer_real").outputMode("append").start()
      try {
        input.addData(ev.map { case (u, t, et) =>
          if (et == "purchase") (u, t, "order_checkout", "N/A") else (u, t, et, et)
        })
        q.processAllAvailable()
        input.addData((999999L, ev.map(_._2).max + 100L * Clickstream.DefaultGapMs, "browse", "N/A"))
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("cs_timer_real")
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
  }
}
