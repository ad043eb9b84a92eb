package graft.relational

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/analytic queries over the TPC-H-ish testdata tables.
  *
  * The reference job has no joins, sorts, or grouping beyond its three
  * pipelines (SURVEY.md §2.1) — these queries extend the engine to the
  * general analytics surface a Spark-native replacement is expected to
  * carry, and double as the scale/bench workload (BASELINE.md).
  *
  * Scale design notes:
  *  - Dimension tables (region/nation/supplier/customer) are broadcast —
  *    `broadcast()` hints keep the big fact-table side shuffle-free. At
  *    100 TB the lineitem scan dominates; none of these plans shuffle
  *    lineitem except on the final group-by key.
  *  - Filters sit directly on the scan columns so Catalyst pushes them
  *    into the parquet reader (PushedFilters) and prunes columns
  *    (ReadSchema) — verified in BenchSpec via explain.
  *  - Double aggregates are rounded (2dp sums / 4dp avgs) so results are
  *    hash-stable across summation orders and engines.
  */
object RelationalQueries {

  /** TPC-H Q1 analog: pricing summary report. One pass over lineitem,
    * partial+final hash aggregate on a 6-value grouping key.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2)
          .as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 analog: shipping-priority top-10. Customer is broadcast;
    * orders⋈lineitem shuffles on orderkey only.
    */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(
        col("l_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 analog: local-supplier revenue per nation. All dimensions
    * broadcast; the only wide exchange is the final group-by on n_name.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val dims = broadcast(
      Tables.customer(spark, dir)
        .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
        .join(
          Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey")))
    val ord = Tables.orders(spark, dir)
      .filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val supp = broadcast(Tables.supplier(spark, dir))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      // TPC-H Q5's "local supplier": customer and supplier share a nation
      .join(dims, col("o_custkey") === col("c_custkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** Ranking window function: top-3 parts per supplier by shipped
    * quantity (deterministic tie-break on partkey). Aggregation first
    * shrinks the input, then one window sort per suppkey group.
    */
  def topPartsPerSupplier(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("total_qty").desc, col("l_partkey"))
    perPart
      .withColumn("part_rank", row_number().over(w).cast("long"))
      .filter(col("part_rank") <= 3)
  }

  /** Order-priority distribution with a semi-join style EXISTS analog
    * (TPC-H Q4 flavor): orders having at least one late lineitem.
    */
  def q4PriorityLate(spark: SparkSession, dir: String): DataFrame = {
    // l_commitdate/l_receiptdate don't exist in this schema; "late" here =
    // shipped more than 60 days after the order date.
    val ord = Tables.orders(spark, dir)
    val lateItems = Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey")).distinct()
    ord
      .join(lateItems, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q7 analog: shipping volume between two nations by year.
    * Nation dims broadcast twice (supplier side / customer side).
    * (Nation names follow the synthetic testdata's NATION_n domain so the
    * query exercises real rows — the TPC-H FRANCE/GERMANY pair would match
    * nothing here and pass trivially.)
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val (nationA, nationB) = ("NATION_1", "NATION_2")
    val n1 = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation")))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("supp_nk"))
      .join(n2, col("c_nationkey") === col("cust_nk"))
      .filter(
        (col("supp_nation") === nationA && col("cust_nation") === nationB) ||
          (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** TPC-H Q10 analog: top-20 customers by returned-item revenue. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** ROLLUP grouping-sets aggregation (subtotals + grand total). */
  def rollupPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"), count(lit(1)).as("n_items"))

  /** Set operation: suppliers with no shipments in the final month of the
    * data (EXCEPT distinct). The anti-join shape Catalyst plans for EXCEPT
    * keeps the big side un-broadcast and hashes the distinct supplier keys.
    * (Cutoff 2001-11-01 — late enough that a non-trivial subset of
    * suppliers is genuinely idle in the synthetic data; a full-year window
    * matches every supplier and the query passes with 0 rows.)
    */
  def idleSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.supplier(spark, dir).select(col("s_suppkey"))
    val active = Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("2001-11-01").cast("timestamp"))
      .select(col("l_suppkey").as("s_suppkey"))
    all.except(active)
  }

  /** Set operation: suppliers who shipped in both 2000 and 2001
    * (INTERSECT distinct) — the companion to [[idleSuppliers]]' EXCEPT.
    */
  def retainedSuppliers(spark: SparkSession, dir: String): DataFrame = {
    def activeIn(year: Int) = Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
          col("l_shipdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("l_suppkey").as("s_suppkey"))
    activeIn(2000).intersect(activeIn(2001))
  }

  /** Analytic window frames: per-user running spend and a 3-event moving
    * average over the event stream (ROWS frames with deterministic
    * ordering). One shuffle on user_id; frames evaluate in the sorted
    * partition stream.
    */
  def runningSpend(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id"),
        col("ts_ms"),
        round(sum(col("value")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)), 2)
          .as("running_spend"),
        round(avg(col("value")).over(byUser.rowsBetween(-2, 0)), 4).as("moving_avg3"),
        row_number().over(byUser).cast("long").as("purchase_seq"))
  }

  /** TPC-H Q6 analog: forecasting revenue change — the canonical
    * scan-filter-aggregate. Every predicate sits on scan columns
    * (PushedFilters), output is one row.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q14 analog: promo revenue share for one shipping month. The
    * ratio is computed from the two ROUNDED sums so it is bit-stable
    * across engines and summation orders.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val promoRev = round(
      sum(when(col("p_type") === "PROMO",
        col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0))), 2)
    val totalRev = round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-02-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(promoRev.as("promo_revenue"), totalRev.as("total_revenue"))
      .select(
        col("promo_revenue"),
        col("total_revenue"),
        round(col("promo_revenue") * 100.0 / col("total_revenue"), 4).as("promo_pct"))
  }

  /** TPC-H Q16 analog: supplier counts per part (brand, type, size),
    * using lineitem as the part↔supplier relation (no partsupp table in
    * this schema) and excluding flagged suppliers (negative balance) with
    * an anti-join — Q16's NOT IN subquery shape.
    */
  def q16PartsSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val flagged = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"), "left_anti")
    pairs
      .join(
        broadcast(Tables.part(spark, dir).filter(col("p_type") =!= "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q17 analog: small-quantity-order revenue. The per-part average
    * is exact in both engines (quantities are integer-valued doubles, so
    * the sum is exact and the divide is a single operation), making the
    * threshold comparison engine-stable. The per-part aggregate is
    * broadcast back against the fact table — O(|part|) rows.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perPart = li.groupBy(col("l_partkey").as("avg_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    li.join(broadcast(perPart), col("l_partkey") === col("avg_partkey"))
      .filter(col("l_quantity") < col("avg_qty") * 0.2)
      .agg(
        round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18 analog: large-volume orders (sum of quantities over a
    * threshold), customer broadcast; the HAVING runs on the already
    * aggregated per-order rows before any join.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 230)
    bigOrders
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_totalprice"), col("total_qty"))
  }

  /** TPC-H Q22 analog: well-funded customers gone quiet (no orders since
    * 2001). The account-balance threshold is computed on exact integer
    * cents (round(bal*100)) so the average and the comparison are
    * bit-identical across engines; "gone quiet" is a left-anti join
    * (Q22's NOT EXISTS) against the recent-order window.
    */
  def q22IdleRich(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .withColumn("bal_cents", round(col("c_acctbal") * 100).cast("long"))
    val avgCents = cust.filter(col("bal_cents") > 0)
      .agg(avg(col("bal_cents")).as("avg_cents"))
    cust
      .join(broadcast(avgCents))
      .filter(col("bal_cents") > col("avg_cents"))
      .join(
        Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  /** TPC-H Q8 analog: one nation's market share of ECONOMY-part volume
    * sold into ASIA, by order year. All seven dimension joins broadcast;
    * lineitem shuffles once on the final year key. Numerator and
    * denominator are rounded BEFORE the ratio so the share is bit-stable
    * across engines and summation orders (same pattern as q14).
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(spark, dir)
    val custSide = broadcast(
      Tables.customer(spark, dir)
        .join(nations, col("c_nationkey") === col("n_nationkey"))
        .join(
          Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey")))
    val suppNation = broadcast(
      Tables.supplier(spark, dir)
        .join(
          nations.select(col("n_nationkey").as("sn_nk"), col("n_name").as("supp_nation")),
          col("s_nationkey") === col("sn_nk"))
        .select(col("s_suppkey"), col("supp_nation")))
    val ord = Tables.orders(spark, dir)
      .filter(
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(custSide, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_3", volume).otherwise(lit(0.0))), 2)
          .as("nation_volume"),
        round(sum(volume), 2).as("total_volume"))
      .select(
        col("o_year"), col("nation_volume"), col("total_volume"),
        round(col("nation_volume") * 100.0 / col("total_volume"), 4).as("mkt_share_pct"))
  }

  /** TPC-H Q9 analog: profit by supplier nation and ship year. The
    * partsupp table doesn't exist in this schema, so supply cost is
    * proxied as 10% of the part's retail price per unit — the join
    * topology (fact ⋈ part ⋈ supplier ⋈ nation, LIKE filter on p_name)
    * is Q9's.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(
        broadcast(Tables.part(spark, dir).filter(col("p_name").contains("red"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(
        col("n_name").as("supp_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(
        col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") * 0.1), 2).as("profit"))

  /** TPC-H Q12 analog: order-priority mix by shipping delay. The schema
    * has no l_shipmode/l_receiptdate, so the Q12 "mode" dimension becomes
    * a late/ontime bucket on shipdate − orderdate; the conditional
    * priority counts are Q12's verbatim.
    */
  def q12ShipDelay(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        when(datediff(col("l_shipdate"), col("o_orderdate")) > 90, "late")
          .otherwise("ontime").as("delay_bucket"))
      .agg(
        count(when(high, 1)).as("high_line_count"),
        count(when(!high, 1)).as("low_line_count"))
  }

  /** TPC-H Q13 analog: distribution of customers by order count. The
    * LEFT join keeps zero-order customers (the filter lives in the join
    * condition, not a WHERE — Q13's defining subtlety), then a second
    * aggregation histograms the counts.
    */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q15 analog: top supplier(s) by revenue in a quarter. The
    * scalar-max subquery is a broadcast join of a 1-row aggregate against
    * the per-supplier revenue — no second scan of lineitem. Revenue is
    * rounded before the max comparison so ties and the threshold are
    * engine-stable.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev
      .join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables.supplier(spark, dir)), col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** TPC-H Q19 analog: revenue from three disjunctive brand/size/quantity
    * predicate branches. The OR-of-ANDs sits on scan columns of both
    * sides; part is broadcast and Catalyst pushes the common l_quantity
    * bounds into the parquet scan.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    def branch(brand: String, maxSize: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand &&
        col("p_size").between(1, maxSize) &&
        col("l_quantity") >= qLo && col("l_quantity") <= qHi
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .filter(
        branch("Brand#1", 10, 1, 15) ||
          branch("Brand#2", 20, 10, 25) ||
          branch("Brand#3", 30, 20, 35))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q21 analog: suppliers who were the sole late shipper on a
    * multi-supplier finished order. Q21's triple EXISTS self-join is
    * re-expressed as ONE aggregation per order (distinct suppliers,
    * distinct late suppliers, the single late supplier key) — lineitem is
    * scanned once and shuffled once on orderkey, versus three scans +
    * three shuffles for the literal EXISTS formulation.
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val perOrder = Tables.lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        count_distinct(col("l_suppkey")).as("n_supp"),
        count_distinct(when(late, col("l_suppkey"))).as("n_late"),
        max(when(late, col("l_suppkey"))).as("late_supp"))
    perOrder
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .join(broadcast(Tables.supplier(spark, dir)), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** TPC-H Q11 analog: parts whose stock value exceeds a fraction of the
    * GLOBAL average — the HAVING-against-a-scalar-subquery shape. The
    * per-part aggregate is computed once and reused for both the rows and
    * the threshold (a self-agg broadcast, not a second scan); values are
    * rounded before aggregating so the threshold is engine-stable, and
    * the threshold is a MULTIPLE OF THE AVERAGE part value, not a
    * fraction of the total — a fraction-of-total cut returns fewer rows
    * as the part universe grows (0 rows at sf0.1), while the top tail
    * above k x avg exists at every scale.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val pv = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"))
      .agg(round(sum(col("l_quantity") * col("p_retailprice")), 2).as("stock_value"))
    val threshold = pv.agg((avg(col("stock_value")) * 1.5).as("threshold"))
    pv
      .join(broadcast(threshold))
      .filter(col("stock_value") > col("threshold"))
      .select(col("l_partkey"), col("stock_value"))
  }

  /** TPC-H Q2 analog: the cheapest regional supplier per qualifying part.
    * No partsupp table, so unit cost is derived from shipment history
    * (sum price / sum qty per part-supplier, both sums rounded BEFORE
    * the divide; the quotient itself is NOT re-rounded — IEEE division of
    * identical operands is bit-identical in both engines, while a 4dp
    * re-round can straddle a half-up boundary and flip the last digit). The correlated-min subquery becomes a
    * per-part min joined back on equality; region/supplier dims broadcast.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val euroSupp = broadcast(
      Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
        .join(
          Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal")))
    val cost = Tables.lineitem(spark, dir)
      .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((round(sum(col("l_extendedprice")), 2) / round(sum(col("l_quantity")), 2))
        .as("unit_cost"))
    val best = cost.groupBy(col("l_partkey").as("b_partkey"))
      .agg(min(col("unit_cost")).as("min_cost"))
    cost
      .join(best, col("l_partkey") === col("b_partkey") && col("unit_cost") === col("min_cost"))
      .join(
        broadcast(Tables.part(spark, dir)
          .filter(col("p_type") === "STANDARD" && col("p_size") > 40)),
        col("l_partkey") === col("p_partkey"))
      .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("s_name"), col("s_acctbal"), col("unit_cost"))
  }

  /** TPC-H Q20 analog: suppliers who dominate a part's shipped volume.
    * The partsupp availability check becomes a share-of-total check on
    * shipment history: a supplier qualifies for a part when they shipped
    * more than 25% of that ('red'-named) part's year-2000 volume. Q20's
    * nested IN/scalar-subquery chain becomes two aggregates (per
    * part-supplier, then per part) and a broadcast semi-filter on part
    * names — lineitem is scanned once.
    */
  def q20DominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    val redParts = broadcast(
      Tables.part(spark, dir).filter(col("p_name").contains("red")).select(col("p_partkey")))
    val ps = Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("2001-01-01").cast("timestamp"))
      .join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(round(sum(col("l_quantity")), 2).as("supp_qty"))
    val tot = ps.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("supp_qty")).as("part_qty"))
    ps
      .join(tot, col("l_partkey") === col("t_partkey"))
      .filter(col("supp_qty") > col("part_qty") * 0.25)
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_dominated_parts"))
  }

  /** CUBE grouping-sets aggregation — all four grouping sets (both keys,
    * each key alone, grand total); the companion to [[rollupPricing]].
    */
  def cubePricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"), count(lit(1)).as("n_items"))

  /** Explicit GROUPING SETS with a grouping_id disambiguator — the
    * general form rollup/cube are shorthands of; the bitmask convention
    * (leftmost key = most significant bit) matches DuckDB's
    * GROUPING(a, b) so the id oracles directly.
    */
  def groupingSetsPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(
          Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")),
          Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        round(sum(col("l_extendedprice")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /** The analytic window-function family over per-user purchase streams:
    * lead/lag (neighbor access), dense_rank + percent_rank + cume_dist
    * (ranking on spend), ntile (quartiles), and a full-partition frame
    * for the final value — one shuffle on user_id, every function
    * evaluated in the same sorted partition stream.
    */
  def windowFunctionFamily(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val bySpend = Window.partitionBy(col("user_id"))
      .orderBy(round(col("value"), 2).desc, col("event_id"))
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id"),
        col("ts_ms"),
        round(lead(col("value"), 1).over(byTime), 2).as("next_value"),
        round(lag(col("value"), 1).over(byTime), 2).as("prev_value"),
        dense_rank().over(bySpend).cast("long").as("spend_rank"),
        round(percent_rank().over(bySpend), 6).as("spend_pct_rank"),
        round(cume_dist().over(bySpend), 6).as("spend_cume_dist"),
        ntile(4).over(byTime).cast("long").as("time_quartile"),
        round(
          last(col("value")).over(
            byTime.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)),
          2).as("final_value"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q8_market_share" -> ((s, d) => q8MarketShare(s, d)),
    "q9_profit" -> ((s, d) => q9Profit(s, d)),
    "q12_ship_delay" -> ((s, d) => q12ShipDelay(s, d)),
    "q13_order_distribution" -> ((s, d) => q13OrderDistribution(s, d)),
    "q15_top_supplier" -> ((s, d) => q15TopSupplier(s, d)),
    "q19_disjunctive" -> ((s, d) => q19Disjunctive(s, d)),
    "q21_waiting_supplier" -> ((s, d) => q21WaitingSupplier(s, d)),
    "cube_pricing" -> ((s, d) => cubePricing(s, d)),
    "grouping_sets_pricing" -> ((s, d) => groupingSetsPricing(s, d)),
    "window_family" -> ((s, d) => windowFunctionFamily(s, d)),
    "q11_important_stock" -> ((s, d) => q11ImportantStock(s, d)),
    "q2_min_cost_supplier" -> ((s, d) => q2MinCostSupplier(s, d)),
    "q20_dominant_supplier" -> ((s, d) => q20DominantSupplier(s, d)),
    "q6_forecast" -> ((s, d) => q6Forecast(s, d)),
    "q14_promo_revenue" -> ((s, d) => q14PromoRevenue(s, d)),
    "q16_parts_suppliers" -> ((s, d) => q16PartsSuppliers(s, d)),
    "q17_small_quantity" -> ((s, d) => q17SmallQuantity(s, d)),
    "q18_large_orders" -> ((s, d) => q18LargeOrders(s, d)),
    "q22_idle_rich" -> ((s, d) => q22IdleRich(s, d)),
    "q7_volume_shipping" -> ((s, d) => q7VolumeShipping(s, d)),
    "q10_returned_items" -> ((s, d) => q10ReturnedItems(s, d)),
    "running_spend" -> ((s, d) => runningSpend(s, d)),
    "rollup_pricing" -> ((s, d) => rollupPricing(s, d)),
    "except_idle_suppliers" -> ((s, d) => idleSuppliers(s, d)),
    "intersect_retained_suppliers" -> ((s, d) => retainedSuppliers(s, d)),
    "q1_pricing" -> ((s, d) => q1Pricing(s, d)),
    "q3_shipping" -> ((s, d) => q3Shipping(s, d)),
    "q5_local_supplier" -> ((s, d) => q5LocalSupplier(s, d)),
    "q4_priority_late" -> ((s, d) => q4PriorityLate(s, d)),
    "topk_parts_per_supplier" -> ((s, d) => topPartsPerSupplier(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q8_market_share" ->
      """WITH v AS (
        |  SELECT year(o_orderdate)::BIGINT AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |), s AS (
        |  SELECT o_year,
        |    round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2)
        |      AS nation_volume,
        |    round(sum(volume), 2) AS total_volume
        |  FROM v GROUP BY o_year
        |)
        |SELECT o_year, nation_volume, total_volume,
        |       round(nation_volume * 100.0 / total_volume, 4) AS mkt_share_pct
        |FROM s""".stripMargin,
    "q9_profit" ->
      """SELECT n_name AS supp_nation, year(l_shipdate)::BIGINT AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)
        |            - p_retailprice * l_quantity * 0.1), 2) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,
    "q12_ship_delay" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
        |            THEN 'late' ELSE 'ontime' END AS delay_bucket,
        |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |    AS high_line_count,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |    AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON supplier_no = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,
    "q19_disjunctive" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity >= 1 AND l_quantity <= 15)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
        |       AND l_quantity >= 10 AND l_quantity <= 25)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
        |       AND l_quantity >= 20 AND l_quantity <= 35)""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH l AS (
        |  SELECT l_orderkey, l_suppkey,
        |         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |              THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |), per_order AS (
        |  SELECT l_orderkey,
        |         count(DISTINCT l_suppkey) AS n_supp,
        |         count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
        |         max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
        |  FROM l GROUP BY 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM per_order JOIN supplier ON late_supp = s_suppkey
        |WHERE n_supp >= 2 AND n_late = 1
        |GROUP BY 1, 2""".stripMargin,
    "cube_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_extendedprice), 2) AS revenue, count(*) AS n_items
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH euro AS (
        |  SELECT s_suppkey, s_name, s_acctbal
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |), cost AS (
        |  SELECT l_partkey, l_suppkey,
        |         round(sum(l_extendedprice), 2) / round(sum(l_quantity), 2) AS unit_cost
        |  FROM lineitem JOIN euro ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2
        |), best AS (
        |  SELECT l_partkey, min(unit_cost) AS min_cost FROM cost GROUP BY 1
        |)
        |SELECT p_partkey, s_name, s_acctbal, unit_cost
        |FROM cost
        |JOIN best ON cost.l_partkey = best.l_partkey AND unit_cost = min_cost
        |JOIN part ON cost.l_partkey = p_partkey
        |JOIN euro ON cost.l_suppkey = euro.s_suppkey
        |WHERE p_type = 'STANDARD' AND p_size > 40""".stripMargin,
    "q20_dominant_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, round(sum(l_quantity), 2) AS supp_qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
        |  GROUP BY 1, 2
        |), tot AS (
        |  SELECT l_partkey, sum(supp_qty) AS part_qty FROM ps GROUP BY 1
        |)
        |SELECT s_suppkey, s_name, count(*) AS n_dominated_parts
        |FROM ps JOIN tot ON ps.l_partkey = tot.l_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE supp_qty > part_qty * 0.25
        |GROUP BY 1, 2""".stripMargin,
    "q11_important_stock" ->
      """WITH pv AS (
        |  SELECT l_partkey, round(sum(l_quantity * p_retailprice), 2) AS stock_value
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1
        |)
        |SELECT l_partkey, stock_value FROM pv
        |WHERE stock_value > (SELECT avg(stock_value) * 1.5 FROM pv)""".stripMargin,
    "grouping_sets_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
        |       round(sum(l_extendedprice), 2) AS revenue, count(*) AS n_items
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,
    "window_family" ->
      """SELECT user_id, event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms,
        |  round(lead(value, 1) OVER w_t, 2) AS next_value,
        |  round(lag(value, 1) OVER w_t, 2) AS prev_value,
        |  dense_rank() OVER w_s AS spend_rank,
        |  round(percent_rank() OVER w_s, 6) AS spend_pct_rank,
        |  round(cume_dist() OVER w_s, 6) AS spend_cume_dist,
        |  ntile(4) OVER w_t AS time_quartile,
        |  round(last_value(value) OVER
        |    (w_t ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
        |    AS final_value
        |FROM events
        |WHERE event_type = 'purchase'
        |WINDOW
        |  w_t AS (PARTITION BY user_id ORDER BY epoch_ms(ts::TIMESTAMP), event_id),
        |  w_s AS (PARTITION BY user_id ORDER BY round(value, 2) DESC, event_id)""".stripMargin,
    "q6_forecast" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q14_promo_revenue" ->
      """WITH s AS (
        |  SELECT
        |    round(sum(CASE WHEN p_type = 'PROMO'
        |                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_revenue,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-02-01 00:00:00'
        |)
        |SELECT promo_revenue, total_revenue,
        |       round(promo_revenue * 100.0 / total_revenue, 4) AS promo_pct
        |FROM s""".stripMargin,
    "q16_parts_suppliers" ->
      """SELECT p_brand, p_type, p_size::BIGINT AS p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q17_small_quantity" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN (SELECT l_partkey AS avg_partkey,
        |             sum(l_quantity) / count(*) AS avg_qty
        |      FROM lineitem GROUP BY 1) pp
        |  ON l_partkey = avg_partkey
        |WHERE l_quantity < avg_qty * 0.2""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |       epoch_ms(o_orderdate) AS o_orderdate_ms,
        |       o_totalprice, total_qty
        |FROM (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 230) big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q22_idle_rich" ->
      """WITH c AS (
        |  SELECT *, round(c_acctbal * 100)::BIGINT AS bal_cents FROM customer
        |), t AS (
        |  SELECT avg(bal_cents) AS avg_cents FROM c WHERE bal_cents > 0
        |)
        |SELECT c_mktsegment, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM c, t
        |WHERE bal_cents > avg_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY c_mktsegment""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate)::BIGINT AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "running_spend" ->
      """SELECT user_id, event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms,
        |  round(sum(value) OVER w_cum, 2) AS running_spend,
        |  round(avg(value) OVER w_mov, 4) AS moving_avg3,
        |  row_number() OVER w_ord AS purchase_seq
        |FROM events
        |WHERE event_type = 'purchase'
        |WINDOW
        |  w_cum AS (PARTITION BY user_id ORDER BY epoch_ms(ts::TIMESTAMP), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_mov AS (PARTITION BY user_id ORDER BY epoch_ms(ts::TIMESTAMP), event_id
        |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |  w_ord AS (PARTITION BY user_id ORDER BY epoch_ms(ts::TIMESTAMP), event_id)""".stripMargin,
    "rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_extendedprice), 2) AS revenue, count(*) AS n_items
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "intersect_retained_suppliers" ->
      """SELECT l_suppkey AS s_suppkey FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
        |INTERSECT
        |SELECT l_suppkey AS s_suppkey FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '2002-01-01 00:00:00'""".stripMargin,
    "except_idle_suppliers" ->
      """SELECT s_suppkey FROM supplier
        |EXCEPT
        |SELECT l_suppkey AS s_suppkey FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-11-01 00:00:00'""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND s_nationkey = c_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "q4_priority_late" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "topk_parts_per_supplier" ->
      """SELECT l_suppkey, l_partkey, total_qty, part_rank FROM (
        |  SELECT l_suppkey, l_partkey, total_qty,
        |    row_number() OVER (PARTITION BY l_suppkey
        |                       ORDER BY total_qty DESC, l_partkey) AS part_rank
        |  FROM (
        |    SELECT l_suppkey, l_partkey, round(sum(l_quantity), 2) AS total_qty
        |    FROM lineitem GROUP BY l_suppkey, l_partkey) agg_q) ranked_q
        |WHERE part_rank <= 3""".stripMargin,
  )
}
