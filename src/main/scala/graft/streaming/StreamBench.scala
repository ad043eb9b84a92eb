package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming throughput micro-bench: replay a deterministic synthetic
  * ClickEvent load through the reference session pipeline
  * ([[ClickstreamStreams.clickEventSessions]] — the S1→W1→A1 path) via
  * MemoryStream and report rows/s, emitted sessions, peak state rows and
  * last micro-batch latency. Every batch-bench number is a BATCH number;
  * this line makes a streaming regression (state blow-up, per-batch
  * latency creep, throughput collapse) visible per round without a
  * broker in the sandbox. Called from [[graft.Bench]]; failures degrade
  * to an `"error"` field rather than poisoning the batch JSON.
  *
  * The load shape is fixed and content-deterministic (users × sessions ×
  * 5 events, 1 s reference gap honored via 2 s inter-session silence),
  * so cross-round figures compare the ENGINE, not the generator; only
  * wall-clock varies with machine state — read it next to the batch
  * run's probe_base_sec.
  */
object StreamBench {

  /** FIXTURES.md §1 ClickEvent row (main-source twin of the spec CE). */
  case class BenchEvent(
      ip: String, eventtimestamp: Long, devicetype: String,
      event_type: String, product_type: String, userid: Int,
      globalseq: Long, prevglobalseq: Long)

  private val Depts = Vector("Kitchen", "Garden", "Books", "Games", "Tools")

  /** `nUsers` users × `sessionsPerUser` sessions × 5 events, chunked into
    * `nBatches` micro-batches by session index.
    */
  def events(nUsers: Int, sessionsPerUser: Int): Seq[BenchEvent] =
    for {
      u <- 0 until nUsers
      s <- 0 until sessionsPerUser
      e <- 0 until 5
    } yield {
      // sessions separated by 2 s of silence (> the 1 s gap); events
      // 200 ms apart inside one, the last a checkout on every 3rd session
      val ts = s.toLong * 3000L + e.toLong * 200L
      val checkout = e == 4 && s % 3 == 0
      BenchEvent(
        ip = "10.0.0.1", eventtimestamp = ts, devicetype = "mobile",
        event_type = if (checkout) "order_checkout" else "browse",
        product_type = if (checkout) "N/A" else Depts((u + s + e) % Depts.size),
        userid = u, globalseq = (u * 1000 + s * 10 + e).toLong, prevglobalseq = 0L)
    }

  /** Runs the micro-bench and returns a compact JSON object (no trailing
    * newline) for embedding under a `"streaming"` key.
    */
  def run(spark: SparkSession, nUsers: Int = 400, sessionsPerUser: Int = 30,
      nBatches: Int = 4): String =
    try {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[BenchEvent]
      val sinkName = "stream_bench_sessions"
      val q = ClickstreamStreams.clickEventSessions(input.toDF())
        .writeStream.format("memory").queryName(sinkName).outputMode("append").start()
      val all = events(nUsers, sessionsPerUser)
      val perBatch = (sessionsPerUser + nBatches - 1) / nBatches
      val t0 = System.nanoTime()
      try {
        (0 until nBatches).foreach { b =>
          input.addData(all.filter { ev =>
            val s = (ev.eventtimestamp / 3000L).toInt
            s / perBatch == b
          })
          q.processAllAvailable()
        }
        // far-future watermark flusher so the tail sessions finalize
        input.addData(BenchEvent("10.0.0.1", 1000000000L, "mobile", "browse",
          "N/A", 999999, 0L, 0L))
        q.processAllAvailable()
        val wallSec = (System.nanoTime() - t0) / 1e9
        val nSessions = spark.table(sinkName).count()
        val progress = q.recentProgress.toSeq
        val stateRowsMax = progress
          .flatMap(p => Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
          .foldLeft(0L)(math.max)
        // processAllAvailable runs extra no-data micro-batches to emit
        // after the watermark advances; per-batch latency is only
        // meaningful over DATA batches, so report the fed count and the
        // slowest data batch rather than whatever trailing no-data batch
        // happened to finish last
        val dataBatches = progress.filter(_.numInputRows > 0)
        val maxDataBatchMs = dataBatches
          .flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong))
          .foldLeft(-1L)(math.max)
        val rowsIn = all.size.toLong + 1L
        def n2(d: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
        s"""{"pipeline":"sessionize","rows_in":$rowsIn,"wall_sec":${n2(wallSec)},""" +
          s""""rows_per_sec":${(rowsIn / math.max(wallSec, 1e-9)).toLong},""" +
          s""""n_sessions":$nSessions,"state_rows_max":$stateRowsMax,""" +
          s""""n_batches_fed":${nBatches + 1},"n_microbatches":${progress.size},""" +
          s""""max_data_batch_ms":$maxDataBatchMs}"""
      } finally {
        q.stop()
        spark.catalog.dropTempView(sinkName)
      }
    } catch {
      case e: Throwable =>
        s"""{"pipeline":"sessionize","error":"${e.getClass.getSimpleName}"}"""
    }
}
