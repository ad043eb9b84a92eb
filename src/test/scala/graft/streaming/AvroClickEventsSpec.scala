package graft.streaming

import graft.SparkSpec
import graft.model.ClickEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Avro wire-format round trip, batch and through a streaming query —
  * the reference's S1 decode path without the spark-avro connector.
  */
class AvroClickEventsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    ClickEvent("10.0.0.1", 1000L, "mobile", "browse", "Kitchen", 1, 7L, 6L),
    ClickEvent("10.0.0.2", 1100L, "web", "order_checkout", "N/A", 1, 8L, 7L),
    ClickEvent("10.0.0.3", 1200L, "web", null, null, 2, 9L, 8L)) // nullable union arms

  test("binary round trip preserves every field including nulls") {
    val raw = fixture.map(AvroClickEvents.encode).toDF("value")
    val got = AvroClickEvents.decode(spark, raw).collect().toSet
    assert(got === fixture.toSet)
  }

  test("header skip strips a registry-style prefix") {
    val framed = fixture.map(e => Array[Byte](0, 1, 2, 3, 4) ++ AvroClickEvents.encode(e))
      .toDF("value")
    val got = AvroClickEvents.decode(spark, framed, skipHeaderBytes = 5).collect().toSet
    assert(got === fixture.toSet)
  }

  test("streaming decode feeds the sessionizer end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Array[Byte]]
    val q = ClickstreamStreams
      .clickEventSessions(
        AvroClickEvents.decode(spark, input.toDF().withColumnRenamed("value", "value")).toDF())
      .drop("session_window")
      .writeStream.format("memory").queryName("s_avro").outputMode("append").start()
    try {
      input.addData(fixture.map(AvroClickEvents.encode))
      q.processAllAvailable()
      input.addData(AvroClickEvents.encode(ClickEvent("ip", 10_000_000L, "w", "browse", "N/A", 9, 0L, 0L)))
      q.processAllAvailable()
      input.addData(AvroClickEvents.encode(ClickEvent("ip", 20_000_000L, "w", "browse", "N/A", 9, 0L, 0L)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("s_avro").filter(col("user_id") === 1)
      .select("event_count", "checkout_event_count", "dept_list")
      .as[(Long, Long, String)].collect().toList
    assert(rows === List((1L, 1L, "Kitchen")))
  }
}
