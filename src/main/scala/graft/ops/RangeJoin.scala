package graft.ops

import graft.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join: points against `[start, end)` intervals
  * with NO shared equi-key.
  *
  * The naive formulation — `points.join(intervals, pt >= start && pt < end)`
  * — has no equi-condition, so Spark plans a BroadcastNestedLoopJoin (or a
  * cartesian product when neither side fits in memory): every point is
  * tested against every interval, O(|P|·|I|) — the classic scale killer for
  * temporal analytics (Flink's interval join solves this with time-bucketed
  * state; DuckDB with IEJoin).
  *
  * This operator recovers an equi-join by time-bucketing both sides:
  * each point lands in bucket `floor(t / bucketMs)`; each interval is
  * exploded to every bucket it overlaps. With `bucketMs` chosen at or above
  * the typical interval length, intervals explode into ≤2 buckets, the join
  * is a plain shuffle hash/sort-merge join on the bucket key, and the exact
  * range predicate filters residual false candidates inside the join. Cost
  * is O(|P| + |I| + matches) shuffle — survives a 100× scale-up where the
  * nested loop dies. Skewed buckets (a hot hour) are AQE-splittable like any
  * equi-join; RangeJoinSpec pins that the plan contains no
  * BroadcastNestedLoopJoin / CartesianProduct.
  *
  * Semantics are a left-equi interval containment join: one output row per
  * (interval, contained point); intervals with no points are NOT emitted
  * (compose with a left join back for outer semantics, as `gapFillDaily`
  * does for grids).
  */
object RangeJoin {

  /** Join `points` (event column `tsCol`) into `intervals` ([startCol,
    * endCol) half-open, both epoch-ms longs). Output: all interval columns
    * plus all point columns (names must not collide).
    */
  def pointsInIntervals(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketMs: Long): DataFrame = {
    val p = points.withColumn("__bucket", Cols.floorDiv(col(tsCol), bucketMs))
    // sequence(first, last) is inclusive on both ends; end is exclusive, so
    // the last overlapped bucket is floor((end-1)/bucket). Zero/negative
    // length intervals overlap nothing (guarded: sequence errors on
    // descending ranges).
    val firstB = Cols.floorDiv(col(startCol), bucketMs)
    val lastB = Cols.floorDiv(col(endCol) - 1, bucketMs)
    val i = intervals
      .withColumn(
        "__bucket",
        explode(
          when(col(endCol) > col(startCol), sequence(firstB, lastB))
            .otherwise(array().cast("array<long>"))))
    i.join(p, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
