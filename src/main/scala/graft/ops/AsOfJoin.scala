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
  */
object AsOfJoin {

  /** @param left      left side; must carry `key`, `tsCol`
    * @param right     right side; must carry `key`, `tsCol`, and `payload`
    * @param payload   right columns carried into the result (latest as-of
    *                  values; null when no right row precedes the left row)
    */
  def asOfLeft(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // align schemas: left rows carry null payload slots, right rows carry
    // null left-only slots
    val l = payload.foldLeft(left.withColumn("__side", lit(1))) { (df, p) =>
      df.withColumn(s"__p_$p", lit(null).cast(right.schema(p).dataType))
    }
    val r0 = right.select((Seq(key, tsCol) ++ payload).map(col): _*)
    val r = leftCols.filterNot(Seq(key, tsCol).contains)
      .foldLeft(r0.withColumn("__side", lit(0))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .withColumnsRenamed(payload.map(p => p -> s"__p_$p").toMap)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(p, last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
