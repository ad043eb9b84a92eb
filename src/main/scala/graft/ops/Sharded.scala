package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking / prefix sums — the two-pass
  * range-partitioned formulation of `row_number() OVER (ORDER BY ...)`
  * and `sum(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING ... -1)`
  * that never funnels the table through a single window partition:
  *
  *  1. `repartitionByRange(nShards, sortCols)` puts each shard's rows in
  *     globally ordered, non-overlapping key ranges (the sort columns
  *     must include a unique tiebreak so the order is total);
  *  2. per-shard `row_number` / running sum via a window PARTITIONED by
  *     the shard id (distributed — every shard sorts independently);
  *  3. shard offsets (rows and value mass strictly below each shard)
  *     come from an nShards²-pair broadcast self-join over the
  *     nShards-row shard-total table — bounded by the shard count, so
  *     no single-partition sort appears anywhere in the plan.
  *
  * The ranged input is `localCheckpoint(eager = false)`-pinned so the
  * rank branch and the totals branch read the SAME materialized
  * boundaries — range boundaries are sampled per-execution, and two
  * independent executions could otherwise disagree.
  *
  * Global statistics built on `__i` / `__cum_before` (gini, ABC bands)
  * are identical for ANY boundary placement, so the sampling introduces
  * no cross-engine nondeterminism in the results.
  */
object Sharded {

  /** Adds `__i` (1-based global row number over `sortCols`) and
    * `__cum_before` (sum of `value` over all strictly-preceding rows)
    * to `df`. `sortCols` may carry `.desc` orderings and must form a
    * total order (include a unique key as the last tiebreak).
    */
  def rankAndPrefix(
      df: DataFrame,
      sortCols: Seq[Column],
      value: Column,
      nShards: Int = 32): DataFrame = {
    val ranged = df
      .repartitionByRange(nShards, sortCols: _*)
      .withColumn("__shard", spark_partition_id().cast("long"))
      .localCheckpoint(false)
    val byShard = Window.partitionBy(col("__shard")).orderBy(sortCols: _*)
    val local = ranged
      .withColumn("__li", row_number().over(byShard).cast("long"))
      .withColumn("__lcum", coalesce(
        sum(value).over(byShard.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val totals = ranged
      .groupBy(col("__shard"))
      .agg(count(lit(1)).as("__sn"), sum(value).as("__sv"))
    val offsets = totals.as("t")
      .join(broadcast(totals.as("u")), col("u.__shard") < col("t.__shard"), "left")
      .groupBy(col("t.__shard").as("__shard"))
      .agg(
        coalesce(sum(col("u.__sn")), lit(0L)).as("__offn"),
        coalesce(sum(col("u.__sv")), lit(0L)).as("__offv"))
    local.join(broadcast(offsets), "__shard")
      .withColumn("__i", col("__offn") + col("__li"))
      .withColumn("__cum_before", col("__offv") + col("__lcum"))
      .drop("__shard", "__li", "__lcum", "__offn", "__offv")
  }
}
