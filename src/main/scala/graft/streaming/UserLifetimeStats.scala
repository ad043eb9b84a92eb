package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** Per-user lifetime KPIs via `transformWithState` — the Spark 4.x
  * arbitrary-state API (the successor to flatMapGroupsWithState and the
  * closest analog of Flink's keyed ValueState that the reference's
  * operators build on).
  *
  * Unlike the windowed sessionizers (whose state the watermark retires),
  * this operator maintains explicitly-managed per-key state that lives
  * for the key's lifetime: a running event/purchase/spend accumulator per
  * user, re-emitted whenever the user appears in a micro-batch.
  *
  * Scale: state is one small record per user, stored in the RocksDB state
  * store (transformWithState requires the RocksDB provider — the off-heap
  * backend), partitioned by the grouping key; `TTLConfig` is the eviction
  * dial for inactive users (NONE here: lifetime semantics by design).
  */
object UserLifetimeStats {

  final case class EventIn(user_id: Long, event_type: String, value: Double)
  final case class Totals(n_events: Long, n_purchases: Long, total_spend: Double)
  final case class UserTotals(
      user_id: Long, n_events: Long, n_purchases: Long, total_spend: Double)

  /** The keyed state machine: one ValueState[Totals] per user. */
  class Processor extends StatefulProcessor[Long, EventIn, UserTotals] {
    @transient private var totals: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[Totals](
        "totals", Encoders.product[Totals], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[EventIn],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      var t = if (totals.exists()) totals.get() else Totals(0L, 0L, 0.0)
      rows.foreach { e =>
        t = Totals(
          t.n_events + 1,
          t.n_purchases + (if (e.event_type == "purchase") 1 else 0),
          t.total_spend + (if (e.event_type == "purchase") e.value else 0.0))
      }
      totals.update(t)
      Iterator.single(UserTotals(key, t.n_events, t.n_purchases, t.total_spend))
    }
  }

  /** Running lifetime totals per user; input needs `user_id`,
    * `event_type`, `value`. Emits the updated totals for each user seen in
    * the micro-batch (Update mode).
    */
  def totals(spark: SparkSession, events: DataFrame): Dataset[UserTotals] = {
    import spark.implicits._
    events
      .select(
        col("user_id").cast("long").as("user_id"),
        col("event_type"),
        coalesce(col("value").cast("double"), lit(0.0)).as("value"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
