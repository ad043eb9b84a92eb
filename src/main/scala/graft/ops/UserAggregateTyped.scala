package graft.ops

import graft.model.ClickEvent
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed accumulator-style session aggregate — the fidelity twin of the
  * declarative formulation in [[Clickstream.sessionize]] /
  * [[graft.streaming.ClickstreamStreams.sessions]].
  *
  * Replays the reference's `UserAggregate.add` semantics
  * (UserAggregate.java:17-38) event-by-event in event-time order:
  * qualifying events (product_type not in {"", "N/A", null},
  * UserAggregate.java:19) bump the count and the department set; an
  * `order_checkout` event snapshots the *running* count
  * (UserAggregate.java:30-33, last checkout wins). The reference's
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
    // replay in event-time order (stable on ts, then globalseq) — the
    // watermark guarantees the reference saw sessions in this order
    buf.sortBy(e => (e.eventtimestamp, e.globalseq)).foreach { e =>
      if (qualifying(e)) {
        count += 1
        depts += e.product_type
      }
      if (e.event_type == "order_checkout") {
        snapshot = count // running-count snapshot; last checkout wins
      }
    }
    SessionOut(count, snapshot, depts.toSeq, eventKey = 1)
  }

  override def bufferEncoder: Encoder[List[ClickEvent]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ClickEvent]]()

  override def outputEncoder: Encoder[SessionOut] = Encoders.product[SessionOut]
}
