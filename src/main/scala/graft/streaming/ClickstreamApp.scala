package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Application wiring — the Spark equivalent of the reference's `main()`
  * (ClickstreamProcessor.java:57-272): one source, three pipelines, each
  * terminated by its own streaming query with an isolated checkpoint.
  *
  * Config parity: property names and defaults mirror the reference's
  * KDAApplicationProperties (ClickstreamProcessor.java:64-119; mandatory
  * BootstrapServers check at :92-98). A reference user can carry their
  * config over unchanged.
  */
object ClickstreamApp {

  /** Reference property names (KDAApplicationProperties.json:1-18). */
  final case class Config(
      bootstrapServers: String,
      inputTopic: String = ClickstreamStreams.Topics.Input,
      departmentsTopic: String = ClickstreamStreams.Topics.Departments,
      userKpisTopic: String = ClickstreamStreams.Topics.UserKpis,
      buySessionsTopic: String = ClickstreamStreams.Topics.BuySessions,
      sessionGap: String = "1 second",
      kpiWindow: String = "10 seconds",
      checkpointRoot: String = "/tmp/graft-checkpoints",
      elasticsearchEndpoint: Option[String] = None)

  object Config {
    /** Mandatory-parameter validation (ClickstreamProcessor.java:92-98). */
    def fromProperties(props: Map[String, String]): Config = {
      val servers = props.getOrElse(
        "BootstrapServers",
        throw new IllegalArgumentException(
          "Missing mandatory parameter: BootstrapServers"))
      Config(
        bootstrapServers = servers,
        inputTopic = props.getOrElse("Topic", ClickstreamStreams.Topics.Input),
        elasticsearchEndpoint = props.get("ElasticsearchEndpoint"))
    }
  }

  /** All three pipelines from one decoded, watermarked event stream.
    * Returns the started queries (await/stop is the caller's business).
    */
  def start(spark: SparkSession, cfg: Config): Seq[StreamingQuery] = {
    val raw = ClickstreamStreams.kafkaSource(spark, cfg.bootstrapServers, cfg.inputTopic)
    val events = ClickstreamStreams.decodeJsonEvents(raw)
    val sessions = ClickstreamStreams.clickEventSessions(events, cfg.sessionGap)

    val buySink = ClickstreamStreams.kafkaSink(
      ClickstreamStreams.sessionsJson(ClickstreamStreams.buySessions(sessions)),
      cfg.bootstrapServers, cfg.buySessionsTopic, s"${cfg.checkpointRoot}/buy_sessions")

    val kpiSink = ClickstreamStreams.kafkaSink(
      ClickstreamStreams.userKpisJson(
        ClickstreamStreams.userKpis(sessions, cfg.kpiWindow)),
      cfg.bootstrapServers, cfg.userKpisTopic, s"${cfg.checkpointRoot}/user_kpis")

    val deptSink = ClickstreamStreams.kafkaSink(
      ClickstreamStreams.departmentsJson(
        ClickstreamStreams.departments(sessions, cfg.kpiWindow)),
      cfg.bootstrapServers, cfg.departmentsTopic, s"${cfg.checkpointRoot}/departments")

    Seq(buySink.start(), kpiSink.start(), deptSink.start())
  }

  /** Bulk-indexing sink in the shape of the reference's Elasticsearch sink
    * (AmazonElasticsearchSink.java:27-73): foreachBatch gives natural
    * bulking; `flush` receives (indexName, jsonDocs) per micro-batch
    * partition-batch — wire a real HTTP bulk client there. Flush
    * thresholds mirror the reference (10k actions / 1 MB).
    */
  def bulkIndexSink(
      jsonDf: DataFrame,
      indexName: String,
      checkpointLocation: String,
      maxActions: Int = 10000,
      maxBytes: Long = 1L << 20)(
      flush: (String, Seq[String]) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    jsonDf.writeStream
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("value").foreachPartition {
          (rows: Iterator[org.apache.spark.sql.Row]) =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            var bytes = 0L
            rows.foreach { r =>
              val doc = r.getString(0)
              buf += doc
              bytes += doc.length
              if (buf.length >= maxActions || bytes >= maxBytes) {
                flush(indexName, buf.toSeq); buf.clear(); bytes = 0L
              }
            }
            if (buf.nonEmpty) flush(indexName, buf.toSeq)
        }
      }
}
