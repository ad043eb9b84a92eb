package graft

/** The spark.sql entry surface: all testdata tables registered as views,
  * engine UDAF callable from SQL.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("registerAll exposes every table and ts_ms on events") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    Tables.AllNames.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() === 1L, s"view $n")
    }
    val r = spark.sql(
      "SELECT count(*) FROM events WHERE ts_ms BETWEEN 0 AND 4102444800000")
      .collect().head.getLong(0)
    assert(r > 0)
  }

  test("graft_user_agg UDAF works from SQL over ClickEvent-shaped rows") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    spark.sql(
      """SELECT 'ip' AS ip, 1000L AS eventtimestamp, 'web' AS devicetype,
        |       'browse' AS event_type, 'Kitchen' AS product_type,
        |       1 AS userid, 0L AS globalseq, 0L AS prevglobalseq
        |UNION ALL
        |SELECT 'ip', 1100L, 'web', 'order_checkout', 'N/A', 1, 0L, 0L""".stripMargin)
      .createOrReplaceTempView("ce_fixture")
    val out = spark.sql(
      """SELECT userid, graft_user_agg(
        |  ip, eventtimestamp, devicetype, event_type, product_type,
        |  userid, globalseq, prevglobalseq) AS s
        |FROM ce_fixture GROUP BY userid""".stripMargin)
      .selectExpr("s.eventCount", "s.orderCheckoutEventCount", "s.deptList")
      .collect().head
    assert(out.getInt(0) === 1)
    assert(out.getInt(1) === 1)
    assert(out.getSeq[String](2) === Seq("Kitchen"))
  }

  test("graft_hash60 SQL function matches the pinned cross-engine value") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val v = spark.sql("SELECT graft_hash60('abc') AS h").collect().head.getLong(0)
    assert(v === 648541476951500027L) // ColsSpec's pinned hash60('abc')
  }
}
