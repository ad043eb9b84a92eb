package graft.streaming

import graft.SparkSpec
import graft.model.ClickEvent
import graft.ops.Clickstream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed-app end-to-end golden test (VERDICT r4 #4 / r3 #7): a
  * deterministic replay of Glue-framed Avro bytes driven through
  * `ClickstreamApp.pipelines` — the full reference topology
  * (ClickstreamProcessor.java:57-272) — with all THREE JSON sink outputs
  * compared against a batch oracle computed by the INDEPENDENT gap-islands
  * formulation (graft.ops.Clickstream window functions, not the
  * session_window state-store machinery the streaming path uses).
  *
  * Events are fed in event-time order, so nothing is dropped as late and
  * the streaming emission must equal the batch result exactly: by the time
  * the watermark closes a session, any in-gap follower would already have
  * merged (new ts >= watermark >= closed session end ⟹ gap >= the session
  * gap on both formulations).
  */
class AppReplaySpec extends SparkSpec {
  import spark.implicits._

  private val GapMs = 1000L
  private val KpiWindowMs = 10000L
  /** Real-data windows all begin well under this; the watermark-advancer
    * events (ts 10e6+) land above it on both sides and are excluded.
    */
  private val CutoffMs = 1000000L

  /** Deterministic pseudo-random replay: 300 events, 25 users, 60 s span,
    * ~10% checkouts, with ""/"N/A"/null non-qualifying noise — the
    * reference generator's shape at spec scale. Sorted by event time so the
    * stream sees monotone batches (see class doc).
    */
  private val replay: Seq[ClickEvent] = {
    val rnd = new scala.util.Random(20260812L)
    val depts = Vector("Kitchen", "Garden", "Books", "Electronics", "Toys")
    (1 to 300).map { i =>
      val user = 1 + rnd.nextInt(25)
      val ts = rnd.nextInt(60000).toLong
      val checkout = rnd.nextInt(10) == 0
      val pt =
        if (checkout) "N/A"
        else rnd.nextInt(8) match {
          case 0 => ""
          case 1 => "N/A"
          case 2 => null
          case k => depts(k - 3)
        }
      ClickEvent(
        s"10.0.0.${i % 256}", ts, if (i % 2 == 0) "mobile" else "web",
        if (checkout) "order_checkout" else "browse", pt, user, i.toLong, (i - 1).toLong)
    }.sortBy(e => (e.eventtimestamp, e.globalseq))
  }

  private def advancer(ts: Long): ClickEvent =
    ClickEvent("10.9.9.9", ts, "w", "browse", "N/A", 9999, 0L, 0L)

  /** Batch-oracle sessions with the reference's ClickEvent semantics,
    * via the gap-islands formulation (Clickstream.withSessionIds — a
    * lag/sum window chain, nothing shared with session_window).
    */
  private def oracleSessions(clickEvents: DataFrame): DataFrame = {
    val qual = col("product_type").isNotNull &&
      col("product_type") =!= "" && col("product_type") =!= "N/A"
    val bySession = Window.partitionBy(col("user_id"), col("session_seq"))
    val base = clickEvents.select(
      col("userid").cast("long").as("user_id"),
      col("eventtimestamp").as("ts_ms"),
      col("globalseq").as("event_id"),
      col("event_type"),
      col("product_type"))
    Clickstream.withSessionIds(base, gapMs = GapMs)
      .withColumn(
        "checkout_ts_ms",
        max(when(col("event_type") === "order_checkout", col("ts_ms"))).over(bySession))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(when(qual, lit(1))).as("event_count"),
        count(when(qual && col("ts_ms") <= col("checkout_ts_ms"), lit(1)))
          .as("checkout_event_count"),
        array_join(array_sort(collect_set(when(qual, col("product_type")))), ",")
          .as("dept_list"),
        min(col("ts_ms")).as("win_begin_ms"),
        (max(col("ts_ms")) + lit(GapMs)).as("win_end_ms"))
      .withColumn("event_key", lit(1L))
  }

  private def keepReal(jsonDf: DataFrame): Seq[String] =
    jsonDf
      .filter(get_json_object(col("value"), "$.windowBeginTime").cast("long") < CutoffMs)
      .select(col("value")).as[String].collect().sorted.toSeq

  private def keepRealKeyed(jsonDf: DataFrame): Seq[(String, String)] =
    jsonDf
      .filter(get_json_object(col("value"), "$.windowBeginTime").cast("long") < CutoffMs)
      .select(col("key"), col("value")).as[(String, String)].collect().sorted.toSeq

  test("Avro replay through ClickstreamApp.pipelines equals the batch oracle on all three sinks") {
    implicit val sqlCtx = spark.sqlContext
    val cfg = ClickstreamApp.Config(bootstrapServers = "unused")
    val input = MemoryStream[Array[Byte]]
    val events = ClickstreamApp.decodeEvents(spark, input.toDF(), cfg)
    val queries = ClickstreamApp.pipelines(events, cfg).toSeq.map { case (name, df) =>
      df.writeStream.format("memory").queryName(s"replay_$name").outputMode("append").start()
    }
    def feed(evs: Seq[ClickEvent]): Unit = {
      // mixed compressed/plain Glue envelopes on one topic, like the wire
      input.addData(evs.map(e =>
        AvroClickEvents.gsrFrame(AvroClickEvents.encode(e), compress = e.userid % 2 == 0)))
      queries.foreach(_.processAllAvailable())
    }
    val advancers = Seq(advancer(10000000L), advancer(20000000L), advancer(30000000L))
    try {
      replay.grouped(100).foreach(feed)
      // three advancer rounds push the watermark through both chained
      // stateful operators (sessions, then the tumbling KPI/dept windows)
      advancers.foreach(a => feed(Seq(a)))
    } finally queries.foreach(_.stop())

    // batch oracle over the SAME input (advancers included; the cutoff
    // filter removes their windows from both sides symmetrically)
    val sessions = oracleSessions((replay ++ advancers).toDF()).cache()
    try {
      val wantBuys = keepReal(Clickstream.sessionsJson(Clickstream.buySessions(sessions)))
      val wantKpis = keepReal(Clickstream.userKpisJson(Clickstream.userKpis(sessions, KpiWindowMs)))
      val wantDepts = keepRealKeyed(
        Clickstream.departmentsJson(Clickstream.departments(sessions, KpiWindowMs)))

      val gotBuys = keepReal(spark.table("replay_buy_sessions"))
      val gotKpis = keepReal(spark.table("replay_user_kpis"))
      val gotDepts = keepRealKeyed(spark.table("replay_departments"))

      assert(wantBuys.nonEmpty && wantKpis.nonEmpty && wantDepts.nonEmpty,
        "degenerate fixture: an empty oracle would vacuously pass")
      assert(gotBuys === wantBuys)
      assert(gotKpis === wantKpis)
      assert(gotDepts === wantDepts)
    } finally sessions.unpersist()
  }
}
