package graft.ops

import graft.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream: funnel progression
  * and cohort retention — the two reports every clickstream deployment
  * ends up building on top of sessionization.
  */
object Analytics {

  /** Ordered funnel: how many users progress through `stages` IN ORDER
    * (each stage strictly after their entry into the previous one —
    * min-time semantics: the earliest qualifying event per stage), with an
    * optional conversion window: every later stage must land within
    * `withinMs` of the user's FUNNEL ENTRY (their stage-1 time) — the
    * product-analytics "converted within 24 h" report. Output: one row per
    * stage (stage_idx, stage, n_users), n_users monotonically
    * non-increasing.
    *
    * Scale: stage k is a hash aggregate over the events of one type,
    * semi-restricted by the (shrinking) stage-(k-1) user set — a chain of
    * |stages| aggregates and joins where the joined side only ever
    * shrinks; AQE broadcasts it as soon as it fits. The per-stage counts
    * are 1-row aggregates unioned at the end — no driver actions, the
    * whole funnel is one lazy plan.
    */
  def funnel(
      events: DataFrame,
      stages: Seq[String],
      withinMs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // reached(k): users with their earliest valid stage-k timestamp __t
    // and their funnel entry time __t0 (the deadline anchor)
    val reached = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val candidates = events.filter(col("event_type") === stage)
        val qualified = prev match {
          case None => candidates.withColumn("__t0_src", col("ts_ms"))
          case Some(p) =>
            val deadline = withinMs
              .map(w => col("ts_ms") <= col("__t0") + lit(w))
              .getOrElse(lit(true))
            candidates
              .join(p.select(col("user_id"), col("__t").as("__prev_t"), col("__t0")), "user_id")
              .filter(col("ts_ms") > col("__prev_t") && deadline)
              .withColumn("__t0_src", col("__t0"))
        }
        Some(
          qualified
            .groupBy(col("user_id"))
            .agg(min(col("ts_ms")).as("__t"), min(col("__t0_src")).as("__t0")))
    }.flatten
    reached.zip(stages).zipWithIndex
      .map { case ((df, stage), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(
            lit((i + 1).toLong).as("stage_idx"),
            lit(stage).as("stage"),
            col("n_users"))
      }
      .reduce(_.union(_))
  }

  /** Cohort retention: users grouped by the day of their first-ever event
    * (the cohort), counted on each subsequent day they were active.
    * Output: (cohort_day, day_offset, n_users) — the classic retention
    * triangle, in epoch days.
    *
    * Scale: one hash aggregate for the cohort map (user → first day,
    * map-side combined) joined back onto the events — at 100 TB the
    * cohort map is |users| rows, orders below the event count, and the
    * join key is the aggregation key so the shuffle is shared. The final
    * distinct-count collapses (user, cohort, offset) duplicates first —
    * partial aggregation does most of that work map-side.
    */
  def retention(events: DataFrame): DataFrame = {
    val day = Cols.floorDiv(col("ts_ms"), TimeSeries.DayMs)
    val cohorts = events
      .groupBy(col("user_id"))
      .agg(min(day).as("cohort_day"))
    events
      .select(col("user_id"), day.as("day"))
      .join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Event-type transition matrix (first-order Markov counts): for each
    * user's time-ordered event sequence, count consecutive (from → to)
    * pairs, with the per-from-type share in exact integer ten-thousandths.
    * Output: (from_type, to_type, n_transitions, share_e4).
    *
    * Scale: one window over (user_id) — the same shuffle key as
    * sessionization, so a pre-partitioned/bucketed event table reuses the
    * exchange — then a hash aggregate onto the tiny |types|² matrix. The
    * share window runs over that matrix, not the events. Counts are
    * non-negative so integral division is exact floor.
    */
  def transitions(events: DataFrame): DataFrame = {
    val seq = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val byFrom = Window.partitionBy(col("from_type"))
    events
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(seq))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn(
        "share_e4",
        Cols.floorDiv(col("n_transitions") * 10000, sum(col("n_transitions")).over(byFrom)))
      .select(col("from_type"), col("to_type"), col("n_transitions"), col("share_e4"))
  }

  /** Pairwise audience overlap between segments: for every unordered pair
    * of `segCol` values, the distinct-`idCol` intersection size and exact
    * Jaccard in integer ten-thousandths. Pairs with an empty intersection
    * are absent (inner-join semantics — at scale most pairs of a
    * high-cardinality segmentation never meet, and emitting the cross
    * product of segments would be its own blow-up).
    *
    * Scale: the distinct (seg, id) table shuffles once on id for the
    * self-join; per-id fan-out is the id's segment count (bounded by
    * |segments|, typically ≤ tens). Segment sizes are a tiny aggregate
    * broadcast onto the pair counts.
    */
  def segmentOverlap(events: DataFrame, segCol: String = "event_type", idCol: String = "user_id"): DataFrame = {
    val tu = events.select(col(segCol).as("seg"), col(idCol).as("id")).distinct()
    val sizes = tu.groupBy(col("seg")).agg(count(lit(1)).as("n"))
    tu.select(col("seg").as("seg_a"), col("id"))
      .join(tu.select(col("seg").as("seg_b"), col("id")), "id")
      .filter(col("seg_a") < col("seg_b"))
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("seg").as("seg_a"), col("n").as("n_a"))), "seg_a")
      .join(broadcast(sizes.select(col("seg").as("seg_b"), col("n").as("n_b"))), "seg_b")
      .select(
        col("seg_a"), col("seg_b"), col("n_a"), col("n_b"), col("n_common"),
        Cols.floorDiv(col("n_common") * 10000, col("n_a") + col("n_b") - col("n_common"))
          .as("jaccard_e4"))
  }

  /** Hour-of-day seasonality profile per event type: counts and the
    * within-type share in integer ten-thousandths. Hour is derived from
    * the epoch-millisecond remainder (UTC) — pure integer math, no
    * timezone surface for the oracle to disagree on.
    *
    * Scale: one hash aggregate onto |types| × 24 rows; the share window
    * runs over that tiny table.
    */
  def hourProfile(events: DataFrame): DataFrame = {
    val hour = Cols.floorDiv(pmod(col("ts_ms"), lit(TimeSeries.DayMs)), 3600000L)
    val byType = Window.partitionBy(col("event_type"))
    events
      .groupBy(col("event_type"), hour.as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn(
        "share_e4",
        Cols.floorDiv(col("n_events") * 10000, sum(col("n_events")).over(byType)))
  }
}
