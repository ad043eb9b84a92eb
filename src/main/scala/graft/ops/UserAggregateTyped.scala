package graft.ops

import graft.model.ClickEvent
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed accumulator-style session aggregate — the fidelity twin of the
  * declarative formulation in [[Clickstream.sessionize]] /
  * [[graft.streaming.ClickstreamStreams.sessions]].
  *
  * Replays the reference's `UserAggregate.add` semantics
  * (UserAggregate.java:17-38): qualifying events (product_type not in
  * {"", "N/A", null}, UserAggregate.java:19) bump the count and the
  * department set; the checkout snapshot counts qualifying events at or
  * before the LAST checkout's timestamp (UserAggregate.java:30-33, last
  * checkout wins; inclusive tie rule shared with the declarative twin —
  * see finish()). The result is fully order-independent. The reference's
  * pane-merge `merge()` bug (summing snapshots, UserAggregate.java:46-53)
  * is intentionally NOT replicated: merge concatenates buffers and
  * `finish` replays in timestamp order, which equals the reference's
  * intended single-pane semantics (SURVEY.md §2.2, §7.3).
  *
  * Usable as an untyped UDAF over any grouping (user, session window):
  * `udaf(UserAggregateTyped)` — registered for SQL by
  * [[graft.Tables.registerAll]].
  */
/** eventCount / orderCheckoutEventCount / sorted dept list (array for
  * deterministic comparison; the reference's HashSet is unordered).
  */
final case class SessionOut(
    eventCount: Int,
    orderCheckoutEventCount: Int,
    deptList: Seq[String],
    eventKey: Int)

object UserAggregateTyped extends Aggregator[ClickEvent, List[ClickEvent], SessionOut] {

  private def qualifying(e: ClickEvent): Boolean =
    e.product_type != null && e.product_type.nonEmpty && e.product_type != "N/A"

  override def zero: List[ClickEvent] = Nil

  override def reduce(buf: List[ClickEvent], e: ClickEvent): List[ClickEvent] = e :: buf

  override def merge(a: List[ClickEvent], b: List[ClickEvent]): List[ClickEvent] = a ::: b

  override def finish(buf: List[ClickEvent]): SessionOut = {
    var count = 0
    var snapshot = 0
    val depts = scala.collection.mutable.SortedSet.empty[String]
    // Tie rule (ADVICE r2): the snapshot counts qualifying events with
    // ts <= the LAST checkout's ts — inclusive at equal timestamps —
    // matching the declarative twin (Clickstream.sessionize's
    // `ts_ms <= checkout_ts_ms` filter) and the DuckDB oracle exactly.
    // A replay that snapshots the running count at the checkout's sort
    // position would exclude a qualifying event sharing the checkout's
    // timestamp but sorting after it.
    var lastCheckoutTs = Long.MinValue
    buf.foreach { e =>
      if (e.event_type == "order_checkout" && e.eventtimestamp > lastCheckoutTs)
        lastCheckoutTs = e.eventtimestamp
    }
    buf.foreach { e =>
      if (qualifying(e)) {
        count += 1
        depts += e.product_type
        if (e.eventtimestamp <= lastCheckoutTs) snapshot += 1
      }
    }
    SessionOut(count, snapshot, depts.toSeq, eventKey = 1)
  }

  override def bufferEncoder: Encoder[List[ClickEvent]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ClickEvent]]()

  override def outputEncoder: Encoder[SessionOut] = Encoders.product[SessionOut]
}
