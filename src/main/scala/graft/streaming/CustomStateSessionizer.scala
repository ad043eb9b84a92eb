package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset state-machine path (SURVEY.md §4's "exact Flink
  * pane emulation" option). The built-in `session_window` aggregation
  * (ClickstreamStreams.sessions) is the default; this operator exists for
  * semantics the declarative form can't express — per-event state
  * machines, incremental buffers with custom eviction, cross-session
  * logic — and demonstrates event-time timeouts.
  *
  * Semantics match the reference pipeline: buffer a user's events, and
  * when the event-time timeout fires (watermark ≥ last event + gap),
  * split the buffer on gap boundaries, emit every closed session, retain
  * the still-open tail.
  *
  * Scale: state per user is the open-session buffer only (closed sessions
  * are emitted and dropped); timeout eviction is driven by the watermark,
  * so state size is bounded by in-flight sessions — same bound as the
  * built-in session store.
  */
object CustomStateSessionizer {

  /** `ts` stays a Timestamp: the watermark tag must survive into the
    * typed Dataset for EventTimeTimeout to resolve.
    */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String, product_type: String) {
    def ts_ms: Long = ts.getTime
  }

  final case class Session(
      user_id: Long,
      event_count: Long,
      checkout_event_count: Long,
      dept_list: String,
      win_begin_ms: Long,
      win_end_ms: Long)

  private def qualifying(e: Ev): Boolean =
    e.product_type != null && e.product_type.nonEmpty && e.product_type != "N/A"

  /** Split a sorted buffer into gap-delimited sessions. */
  private[streaming] def split(sorted: List[Ev], gapMs: Long): List[List[Ev]] =
    sorted.foldLeft(List.empty[List[Ev]]) {
      case (Nil, e) => List(List(e))
      case (cur :: done, e) if e.ts_ms - cur.head.ts_ms < gapMs => (e :: cur) :: done
      case (acc, e) => List(e) :: acc
    }.map(_.reverse).reverse

  private[streaming] def finish(events: List[Ev], gapMs: Long): Session = {
    var count = 0L
    var snapshot = 0L
    val depts = scala.collection.mutable.SortedSet.empty[String]
    // inclusive tie rule shared with UserAggregateTyped.finish and the
    // declarative sessionizers: the snapshot counts qualifying events with
    // ts <= the LAST checkout's ts, regardless of sort position at ties
    val lastCheckoutTs = events.iterator
      .filter(_.event_type == "order_checkout").map(_.ts_ms)
      .foldLeft(Long.MinValue)(math.max)
    events.foreach { e =>
      if (qualifying(e)) {
        count += 1; depts += e.product_type
        if (e.ts_ms <= lastCheckoutTs) snapshot += 1
      }
    }
    Session(
      events.head.user_id, count, snapshot, depts.mkString(","),
      events.head.ts_ms, events.last.ts_ms + gapMs)
  }

  def sessions(
      spark: SparkSession,
      events: DataFrame,
      gapMs: Long = 1000L,
      watermark: String = "0 seconds"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_type"), col("product_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (_: Long, it: Iterator[Ev], state: GroupState[List[Ev]]) => {
          val buf = state.getOption.getOrElse(Nil) ++ it
          if (buf.isEmpty) Iterator.empty
          else {
            val sorted = buf.sortBy(e => (e.ts_ms, e.event_type))
            val wm = state.getCurrentWatermarkMs()
            val (closed, open) = split(sorted, gapMs)
              .partition(s => s.last.ts_ms + gapMs <= wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(open.flatten)
              state.setTimeoutTimestamp(open.flatten.map(_.ts_ms).max + gapMs)
            }
            closed.iterator.map(finish(_, gapMs))
          }
        })
  }
}
