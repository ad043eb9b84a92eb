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

  /** Column-stats drift between the early and late calendar halves of a
    * table — the "did the feed change shape" screen a pipeline runs
    * before trusting a new partition: per column, each half's row count,
    * null count, and exact distinct count, plus the signed e4 drift of
    * the distinct count and of the null RATE (nulls per 10⁴ rows). A
    * sudden distinct-count collapse (upstream started sending a constant)
    * or null-rate jump (a join started missing) shows up here before it
    * poisons anything downstream. The split day is the in-plan midpoint
    * of the observed calendar — the same 1-row broadcast discipline as
    * the recommender backtest.
    *
    * Scale: ONE aggregate pass in the [[profile]] shape — per column,
    * half-conditional counts and distincts (Spark's multi-distinct
    * expand, ×2 per column vs [[profile]]) — then a constant-size
    * explode into the per-column report. No per-column jobs, nothing
    * re-scanned per half.
    */
  def statsDrift(
      df: DataFrame, columns: Seq[String], dayExpr: org.apache.spark.sql.Column): DataFrame = {
    require(columns.nonEmpty, "statsDrift needs at least one column")
    val cut = broadcast(
      df.agg(graft.Cols
        .floorDiv(min(dayExpr) + max(dayExpr), 2L).as("__cut")))
    val tagged = df.crossJoin(cut)
      .withColumn("__half", when(dayExpr <= col("__cut"), 0L).otherwise(1L))
    def half(h: Int, c: org.apache.spark.sql.Column) = when(col("__half") === h, c)
    val aggs = columns.flatMap { c =>
      Seq(
        count(half(0, col(c))).as(s"__nn0_$c"),
        count(half(1, col(c))).as(s"__nn1_$c"),
        count_distinct(half(0, col(c))).as(s"__nd0_$c"),
        count_distinct(half(1, col(c))).as(s"__nd1_$c"))
    }
    val row = tagged.agg(
      sum(when(col("__half") === 0, 1L).otherwise(0L)).as("__n0"),
      sum(when(col("__half") === 1, 1L).otherwise(0L)).as("__n1") +: aggs: _*)
    def rate(nulls: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      graft.Cols.floorDiv(nulls * 10000L, greatest(n, lit(1L)))
    row
      .select(explode(array(columns.map { c =>
        struct(
          lit(c).as("column_name"),
          col("__n0").as("n_rows_a"), col("__n1").as("n_rows_b"),
          (col("__n0") - col(s"__nn0_$c")).as("n_null_a"),
          (col("__n1") - col(s"__nn1_$c")).as("n_null_b"),
          col(s"__nd0_$c").as("n_distinct_a"),
          col(s"__nd1_$c").as("n_distinct_b"))
      }: _*)).as("p"))
      .select(
        col("p.column_name"),
        col("p.n_rows_a"), col("p.n_rows_b"),
        col("p.n_null_a"), col("p.n_null_b"),
        col("p.n_distinct_a"), col("p.n_distinct_b"),
        (rate(col("p.n_null_b"), col("p.n_rows_b"))
          - rate(col("p.n_null_a"), col("p.n_rows_a"))).as("null_rate_drift_e4"),
        graft.Cols.floorDiv(
          (col("p.n_distinct_b") - col("p.n_distinct_a")) * 10000L,
          greatest(col("p.n_distinct_a"), lit(1L))).as("distinct_drift_e4"))
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

  /** Primary-key uniqueness audit across tables: per declared (label,
    * table, key), row count, distinct keys, null keys, and how many key
    * values repeat — the [[fkIntegrity]] companion (parents must be
    * unique for the FK audit to mean anything). One lazy union plan, no
    * driver actions.
    *
    * Scale: one count-distinct aggregate per table (swap HLL at 100 TB
    * if an exact audit isn't required — same plan shape).
    */
  def pkAudit(tables: Seq[(String, DataFrame, String)]): DataFrame = {
    require(tables.nonEmpty, "pkAudit needs at least one table")
    tables.map { case (label, df, keyCol) =>
      val dups = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
        .filter(col("__c") > 1)
      df.agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col(keyCol)).as("n_distinct"),
        count(when(col(keyCol).isNull, 1)).as("n_null_keys"))
        .crossJoin(broadcast(dups.agg(count(lit(1)).as("n_dup_keys"))))
        .select(lit(label).as("table_name"), col("n_rows"), col("n_distinct"),
          col("n_null_keys"), col("n_dup_keys"))
    }.reduce(_.union(_))
  }

  /** Snapshot reconciliation: added / removed / changed / unchanged row
    * counts between two KEYED snapshots (unique keys — [[pkAudit]] is the
    * precondition), compared by an md5 over the declared value columns —
    * the migration / backfill audit ("did the new pipeline change
    * anything it shouldn't have?"). The hash only ever meets hashes from
    * the SAME engine, so no cross-engine string-format parity is needed;
    * still, normalize float value columns to exact integers (cents, e4)
    * first so "changed" means a real change, not formatting drift.
    * Null value columns are skipped by `concat_ws` — two rows differing
    * only in WHICH column is null can collide; normalize nulls upstream
    * if that distinction matters.
    *
    * Scale: both sides reduce to (key, 16-byte hash) BEFORE the one
    * full-outer shuffle join, so bytes through the exchange are constant
    * per row regardless of table width; output is ≤ 4 rows.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "snapshotDiff needs at least one value column")
    def hashed(df: DataFrame, tag: String) = df.select(
      col(keyCol).as("__k"),
      md5(concat_ws("\u0001", valueCols.map(c => col(c).cast("string")): _*))
        .as(s"__h_$tag"))
    hashed(oldSnap, "old")
      .join(hashed(newSnap, "new"), Seq("__k"), "full_outer")
      .select(
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") === col("__h_new"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Join-cardinality probe from key histograms: the EXACT row count
    * `|A ⋈ B| = Σₖ cntA(k)·cntB(k)` the equi-join would produce, plus the
    * skew facts that decide HOW to run it — the hottest key's output rows
    * and its e4 share of the total. This is the "measure before you
    * shuffle 100 TB" planning step: key-grain aggregates and a key-grain
    * join are orders of magnitude cheaper than the join itself whenever
    * rows are wider than keys, and the answer picks the strategy
    * (broadcast / plain shuffle / salted — see [[Scale.saltedJoin]]).
    *
    * Scale: two hash aggregates (map-side combined) down to key grain,
    * one equi-join between those key tables, a 1-row final aggregate,
    * and the side totals as in-plan broadcast 1-row aggregates. At
    * extreme fan-out (join_rows beyond ~9·10¹⁸) move the Σ to
    * DECIMAL(38,0) — the plan shape is unchanged.
    */
  def joinCardinality(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val ca = left.groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__ca"))
    val cb = right.groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__cb"))
    val sides = ca
      .agg(coalesce(sum(col("__ca")), lit(0L)).as("n_left"),
        count(lit(1)).as("n_keys_left"))
      .crossJoin(broadcast(
        cb.agg(coalesce(sum(col("__cb")), lit(0L)).as("n_right"),
          count(lit(1)).as("n_keys_right"))))
    ca.join(cb, Seq("__k"))
      .select((col("__ca") * col("__cb")).as("__p"))
      .agg(
        count(lit(1)).as("n_keys_matched"),
        coalesce(sum(col("__p")), lit(0L)).as("join_rows"),
        coalesce(max(col("__p")), lit(0L)).as("max_key_rows"))
      .crossJoin(broadcast(sides))
      .select(
        col("n_left"), col("n_keys_left"), col("n_right"), col("n_keys_right"),
        col("n_keys_matched"), col("join_rows"), col("max_key_rows"),
        when(col("join_rows") > 0,
          graft.Cols.floorDiv(col("max_key_rows") * 10000, col("join_rows")))
          .otherwise(lit(0L)).as("top_share_e4"))
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

  /** Robust outlier screen per group: median/MAD (median absolute
    * deviation) of `valueCol`, and the count of rows beyond
    * `k × MAD` of the median — the heavy-tail-safe alternative to a
    * mean/σ z-test (one wild value moves a mean; it barely moves a
    * median). Median and MAD are rounded to 4 decimals BEFORE the
    * comparison so the flag predicate evaluates on identical doubles in
    * both engines (`percentile` ≡ DuckDB `quantile_cont`, pinned by
    * ev_value_quantiles).
    *
    * Scale: two sort-based percentile aggregates over the group key (the
    * exact tier; swap `percentile` for `approx_percentile` at 100 TB for
    * the one-pass sketch) and a broadcast join of the 1-row-per-group
    * stats back onto the raw rows for the outlier count.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String, k: Int = 3): DataFrame = {
    val medians = df.groupBy(col(groupCol))
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 4).as("median"))
    val withMed = df.select(col(groupCol), col(valueCol))
      .join(broadcast(medians), Seq(groupCol))
    val mads = withMed
      .groupBy(col(groupCol))
      .agg(round(expr(s"percentile(abs($valueCol - median), 0.5)"), 4).as("mad"))
    withMed
      .join(broadcast(mads), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        first(col("median")).as("median"),
        first(col("mad")).as("mad"),
        count(when(abs(col(valueCol) - col("median")) > lit(k.toDouble) * col("mad"), 1))
          .as("n_outliers"))
  }

  /** Chi-squared independence audit between two categorical columns —
    * "is event mix actually independent of hour of day?". Each cell's
    * contribution `(O − E)² / E` is computed with `E = R·C/N` in the
    * multiplied-through form `(O·N − R·C)² / (R·C·N)`, quantized to
    * integer e4 PER CELL and then summed (the quantize-then-sum
    * discipline: the total is order-independent and engine-exact).
    * Output is one row: the statistic, the degrees of freedom, and N —
    * compare chi2_e4/1e4 against the χ² critical value for the dof.
    *
    * Scale: one hash aggregate to cell counts (map-side combined), two
    * tiny marginal re-aggregates of the CELL table (not the raw rows)
    * broadcast back, then a 1-row final aggregate.
    */
  def chi2Independence(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA), col(colB)).agg(count(lit(1)).as("__o"))
    val rowT = cells.groupBy(col(colA)).agg(sum(col("__o")).as("__r"))
    val colT = cells.groupBy(col(colB)).agg(sum(col("__o")).as("__c"))
    val total = cells.agg(sum(col("__o")).as("__n"))
    val d = (col("__o").cast("double") * col("__n").cast("double")
      - col("__r").cast("double") * col("__c").cast("double"))
    val termE4 = round(d * d * 10000.0
      / (col("__r").cast("double") * col("__c").cast("double") * col("__n").cast("double")))
      .cast("long")
    // the FULL grid, not just observed cells: an empty cell contributes
    // (0 − E)²/E = E, and dropping it understates the statistic exactly
    // where dependence is strongest (a diagonal table's off-cells)
    rowT
      .crossJoin(colT)
      .join(cells, Seq(colA, colB), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
      .crossJoin(broadcast(total))
      .agg(
        sum(termE4).as("chi2_e4"),
        ((count_distinct(col(colA)) - 1) * (count_distinct(col(colB)) - 1)).as("dof"),
        first(col("__n")).as("n_rows"))
  }

  /** Equi-DEPTH histogram: `buckets` quantile buckets holding ~equal row
    * counts (vs [[histogram]]'s equal-width bins) — the value-distribution
    * report that stays readable on skewed data, where equi-width piles
    * everything into one bin. Bucket = `1 + Σ (v > cutᵢ)` against the
    * broadcast interior quantile cuts (ties at a cut land in the lower
    * bucket, deterministically, on both engines — same discipline as
    * RFM's quintiles). min/max per bucket pass raw values through with
    * no arithmetic, so there is no double surface beyond the rounded
    * cuts themselves.
    *
    * Scale: one percentile aggregate (sort-based exact tier; swap in
    * `approx_percentile` at 100 TB) broadcast into a map-only bucket
    * expression + one |buckets|-row hash aggregate.
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val qs = (1 until buckets).map(i => i.toDouble / buckets).mkString(", ")
    val cuts = df.agg(
      expr(s"transform(percentile($valueCol, array($qs)), x -> round(x, 4))").as("__cuts"))
    val bucket = (0 until buckets - 1)
      .map(i => (col(valueCol) > element_at(col("__cuts"), i + 1)).cast("long"))
      .reduce(_ + _) + 1
    df.select(col(valueCol))
      .crossJoin(broadcast(cuts))
      .groupBy(bucket.as("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
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
