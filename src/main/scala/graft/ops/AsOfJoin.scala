package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) left join: for every left row, the most recent
  * right row with `right.ts <= left.ts` on the same key — the
  * training-data / timeseries staple (feature lookups "as of" event time).
  *
  * Spark-first shape: instead of a range join (which explodes to a
  * per-key cartesian before filtering), both sides are unioned and sorted
  * once per key; a running `last(_, ignoreNulls)` window carries the
  * latest right payload forward into each left row. Cost: ONE shuffle on
  * the key + one per-partition sort — the same bound as sessionization,
  * and the shape that survives 100 TB (no pair blowup, partial sort
  * spills handled by the sort machinery).
  *
  * Tie rule: a right row at exactly left.ts IS visible (inclusive match,
  * right sorts before left at equal timestamps) — the same convention as
  * DuckDB's `ASOF LEFT JOIN ... ON l.ts >= r.ts`, which the oracle uses.
  * Two RIGHT rows at the same (key, ts) resolve to ONE of them atomically
  * (which one is input-order dependent — the same unspecified-among-ties
  * behavior as native ASOF implementations).
  */
object AsOfJoin {

  /** @param left      left side; must carry `key`, `tsCol`
    * @param right     right side; must carry `key`, `tsCol`, and `payload`
    * @param payload   right columns carried into the result (latest as-of
    *                  values; all null when no right row precedes the left
    *                  row)
    * @param forward   false (default): nearest right row AT OR BEFORE the
    *                  left row (backward as-of). true: nearest right row AT
    *                  OR AFTER it (forward as-of — "the next reading", the
    *                  event-to-outcome join). Same machinery, the per-key
    *                  sort just runs descending; the inclusive tie rule is
    *                  symmetric. DuckDB mirrors with `l.ts <= r.ts` in the
    *                  ASOF condition.
    */
  def asOfLeft(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      payload: Seq[String],
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // All payload columns ride in ONE struct carried by a single
    // last(ignoreNulls) — values stay row-atomic (no mixing columns from
    // different right rows at tied timestamps), and a NULL inside the
    // struct is a real NULL payload value: it is carried forward as NULL
    // rather than skipped for an older non-null value (ADVICE r2). Only a
    // wholly-null struct (= a left row's slot) is skipped by ignoreNulls.
    val pType = org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
    val r0 = right.select(
      Seq(key, tsCol).map(col) :+ struct(payload.map(col): _*).as("__p"): _*)
    val r = leftCols.filterNot(Seq(key, tsCol).contains)
      .foldLeft(r0.withColumn("__side", lit(0))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(col(key))
      .orderBy(tsOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__p.$p").as(p)): _*)
  }
}
