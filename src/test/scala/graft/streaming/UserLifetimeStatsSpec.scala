package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** transformWithState keyed lifetime accumulator: state persists across
  * micro-batches and re-emits updated totals (Update mode). Requires the
  * RocksDB state store provider — set per test, restored after.
  */
class UserLifetimeStatsSpec extends SparkSpec {
  import spark.implicits._

  test("lifetime totals accumulate across micro-batches per user") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String, Double)]
      val events = input.toDF().toDF("user_id", "event_type", "value")
      val q = UserLifetimeStats.totals(spark, events)
        .writeStream.format("memory").queryName("s_lifetime")
        .outputMode("update").start()
      try {
        input.addData((1L, "browse", 0.0), (1L, "purchase", 10.5), (2L, "browse", 0.0))
        q.processAllAvailable()
        input.addData((1L, "purchase", 4.5))
        q.processAllAvailable()
      } finally q.stop()
      // last emission per user carries the lifetime totals
      val last = spark.table("s_lifetime")
        .groupBy($"user_id")
        .agg(max(struct($"n_events", $"n_purchases", $"total_spend")).as("t"))
        .select($"user_id", $"t.n_events", $"t.n_purchases", $"t.total_spend")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(last === Set(
        (1L, 3L, 2L, 15.0), // state carried the first batch into the second
        (2L, 1L, 0L, 0.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
