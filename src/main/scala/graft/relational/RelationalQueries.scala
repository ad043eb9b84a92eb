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
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
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
        (col("supp_nation") === "FRANCE" && col("cust_nation") === "GERMANY") ||
          (col("supp_nation") === "GERMANY" && col("cust_nation") === "FRANCE"))
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

  /** Set operation: suppliers with no shipments in 2001 (EXCEPT distinct).
    * The anti-join shape Catalyst plans for EXCEPT keeps the big side
    * un-broadcast and hashes the distinct supplier keys.
    */
  def idleSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.supplier(spark, dir).select(col("s_suppkey"))
    val active = Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("l_suppkey").as("s_suppkey"))
    all.except(active)
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7_volume_shipping" -> ((s, d) => q7VolumeShipping(s, d)),
    "q10_returned_items" -> ((s, d) => q10ReturnedItems(s, d)),
    "running_spend" -> ((s, d) => runningSpend(s, d)),
    "rollup_pricing" -> ((s, d) => rollupPricing(s, d)),
    "except_idle_suppliers" -> ((s, d) => idleSuppliers(s, d)),
    "q1_pricing" -> ((s, d) => q1Pricing(s, d)),
    "q3_shipping" -> ((s, d) => q3Shipping(s, d)),
    "q5_local_supplier" -> ((s, d) => q5LocalSupplier(s, d)),
    "q4_priority_late" -> ((s, d) => q4PriorityLate(s, d)),
    "topk_parts_per_supplier" -> ((s, d) => topPartsPerSupplier(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
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
        |WHERE (n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
        |   OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE')
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
    "except_idle_suppliers" ->
      """SELECT s_suppkey FROM supplier
        |EXCEPT
        |SELECT l_suppkey AS s_suppkey FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'""".stripMargin,
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
