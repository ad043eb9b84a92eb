package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: the per-column quality report (row count, null count,
  * exact distinct count) a pipeline runs before trusting a new source.
  *
  * Scale shape: ONE pass — a single aggregate computes every column's
  * stats (the distinct counts expand the scan internally, Spark's standard
  * multi-distinct planning), producing one row that is then exploded into
  * the per-column report. No per-column jobs, no driver loop over columns;
  * at 100 TB swap `count_distinct` for `approx_count_distinct` per column
  * where exactness isn't needed (same plan shape, no expand).
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"), // count(col) skips nulls
        count_distinct(col(c)).as(s"__nd_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    row
      .select(explode(array(columns.map { c =>
        struct(
          lit(c).as("column_name"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$c")).as("n_null"),
          col(s"__nd_$c").as("n_distinct"))
      }: _*)).as("p"))
      .select(col("p.column_name"), col("p.n_rows"), col("p.n_null"), col("p.n_distinct"))
  }

  /** Equi-width histogram of `valueCol` per `groupCol`: `bins` buckets
    * over the GLOBAL [min, max] (shared bin edges make the per-group
    * histograms comparable), top edge closed — the max value lands in the
    * last bin. A degenerate range (max == min, e.g. a constant column)
    * puts every row in bin 0 rather than producing NaN bins — defined
    * behavior on both engines instead of a silent NaN→0 cast on one and
    * a cast error on the other.
    *
    * Scale: the bounds are a broadcast 1-row aggregate folded into the
    * plan (no driver-side action to learn the range), then one map-side
    * bin computation + one hash aggregate onto |groups| × bins rows. The
    * bin expression is evaluated identically (same operation order) by
    * the DuckDB oracle, so the double arithmetic is bit-reproducible.
    */
  /** Referential-integrity audit: for each declared (child, parent)
    * relationship, the child row count and the number of orphans (child
    * keys with no parent) — the cross-table data-quality gate a pipeline
    * runs before joining new data in anger.
    *
    * Scale: each relationship is one left-anti-join count — Spark picks
    * broadcast for dimension-sized parents, shuffle otherwise — and the
    * per-relationship 1-row results union into one lazy plan (no driver
    * loop materializes anything).
    */
  def fkIntegrity(relationships: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relationships.nonEmpty, "fkIntegrity needs at least one relationship")
    relationships.map { case (label, child, childKey, parent, parentKey) =>
      val orphans = child.select(col(childKey).as("__k"))
        .join(parent.select(col(parentKey).as("__k")).distinct(), Seq("__k"), "left_anti")
      child.agg(count(lit(1)).as("n_child_rows"))
        .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
        .select(lit(label).as("relationship"), col("n_child_rows"), col("n_orphans"))
    }.reduce(_.union(_))
  }

  /** Benford leading-digit audit: the distribution of first significant
    * digits of a positive amount column against Benford's law — the
    * classic fabricated-data / unit-mix-up screen. The leading digit
    * comes from the decimal STRING of the integer cent amount (identical
    * across engines — no float log10 near power-of-ten boundaries), and
    * the expected shares are fixed e4 literals of log10(1 + 1/d), so
    * every output column is an exact integer.
    *
    * Scale: one narrow map + a 9-row hash aggregate; the total for the
    * shares is the usual in-plan broadcast 1-row count.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    // round(log10(1 + 1/d) * 10000) for d = 1..9, fixed at compile time
    val expectedE4 = Seq(3010L, 1761L, 1249L, 969L, 792L, 669L, 580L, 512L, 458L)
    val cents = df
      .filter(col(valueCol) > 0)
      .select(round(col(valueCol) * 100).cast("long").as("__cents"))
      .filter(col("__cents") > 0)
    val digits = cents
      .select(substring(col("__cents").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val expected = element_at(array(expectedE4.map(lit): _*), col("digit").cast("int"))
    digits
      .crossJoin(broadcast(cents.agg(count(lit(1)).as("__total"))))
      .select(
        col("digit"),
        col("n"),
        graft.Cols.floorDiv(col("n") * 10000, col("__total")).as("share_e4"),
        expected.as("benford_e4"))
      .withColumn("dev_e4", abs(col("share_e4") - col("benford_e4")))
  }

  def histogram(df: DataFrame, groupCol: String, valueCol: String, bins: Int = 10): DataFrame = {
    val bounds = df.agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    df.select(col(groupCol), col(valueCol))
      .crossJoin(broadcast(bounds))
      .select(
        col(groupCol),
        when(
          col("__hi") > col("__lo"),
          least(
            floor((col(valueCol) - col("__lo")) * lit(bins.toDouble) / (col("__hi") - col("__lo"))),
            lit((bins - 1).toLong)))
          .otherwise(lit(0L)).as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_events"))
  }
}
