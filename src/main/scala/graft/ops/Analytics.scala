package graft.ops

import graft.Cols
import org.apache.spark.sql.DataFrame
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
}
