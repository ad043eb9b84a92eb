package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.util.control.NonFatal

/** Streaming throughput micro-bench: replay a deterministic synthetic
  * ClickEvent load through the reference pipelines via MemoryStream and
  * report rows/s, emitted rows, peak state rows and slowest data-batch
  * latency — one line per ARM:
  *
  *  - `sessionize` — pipeline A, the S1→W1→A1 session aggregation
  *    ([[ClickstreamStreams.clickEventSessions]]); figure comparable
  *    across rounds since r13.
  *  - `chained_kpis` — pipeline B chained on A (the §7.3 hard part:
  *    two stateful aggregations in one query,
  *    [[ClickstreamStreams.userKpis]] over the session window column).
  *  - `chained_departments` — pipeline C chained on A (explode +
  *    windowed count, [[ClickstreamStreams.departments]]).
  *  - `timer_rocksdb` — the explicit-timer sessionizer
  *    ([[TimerSessionizer]], transformWithState) with the RocksDB state
  *    store provider — the state-scale-honest configuration (HDFS-backed
  *    in-memory state would OOM first at real state sizes).
  *
  * Every batch-bench number is a BATCH number; these lines make a
  * streaming regression (state blow-up, per-batch latency creep,
  * throughput collapse) visible per round without a broker in the
  * sandbox. Called from [[graft.Bench]]; a NON-FATAL failure degrades to
  * an `"error"` field for that arm, while fatal JVM errors (OOM,
  * LinkageError) propagate — after one the heap is in unknown state and
  * any subsequent batch JSON would be untrustworthy.
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

  /** One replay of the fixed load through `build`, returning the arm's
    * JSON object. The flusher event (far-future timestamp) advances the
    * watermark so tail windows/timers finalize before metrics are read.
    */
  private def arm(
      spark: SparkSession,
      name: String,
      build: DataFrame => DataFrame,
      nUsers: Int, sessionsPerUser: Int, nBatches: Int): String =
    try {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[BenchEvent]
      val sinkName = s"stream_bench_$name"
      val q = build(input.toDF())
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
        val nOut = spark.table(sinkName).count()
        val progress = q.recentProgress.toSeq
        // chained arms run >1 stateful operator per batch; peak state is
        // the max over batches of the SUM across that batch's operators
        val stateRowsMax = progress
          .map(p => Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal).sum)
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
        s"""{"pipeline":"$name","rows_in":$rowsIn,"wall_sec":${n2(wallSec)},""" +
          s""""rows_per_sec":${(rowsIn / math.max(wallSec, 1e-9)).toLong},""" +
          s""""n_rows_out":$nOut,"state_rows_max":$stateRowsMax,""" +
          s""""n_batches_fed":${nBatches + 1},"n_microbatches":${progress.size},""" +
          s""""max_data_batch_ms":$maxDataBatchMs}"""
      } finally {
        q.stop()
        spark.catalog.dropTempView(sinkName)
      }
    } catch {
      case NonFatal(e) =>
        s"""{"pipeline":"$name","error":"${e.getClass.getSimpleName}"}"""
    }

  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the RocksDB state store provider active, restoring
    * the previous provider configuration afterwards (the session is
    * shared with the batch bench).
    */
  private def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDbProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Runs the four arms and returns a compact JSON ARRAY (no trailing
    * newline) for embedding under a `"streaming"` key. Arm order is
    * fixed; the `sessionize` arm keeps its r13 shape (modulo the
    * `n_sessions` → `n_rows_out` field rename) for cross-round reads.
    */
  def run(spark: SparkSession, nUsers: Int = 400, sessionsPerUser: Int = 30,
      nBatches: Int = 4): String = {
    val a = arm(spark, "sessionize",
      df => ClickstreamStreams.clickEventSessions(df),
      nUsers, sessionsPerUser, nBatches)
    // 10 s tumbling windows (the reference's pipeline B/C width,
    // ClickstreamProcessor.java:141-154) over the ~90 s replay → ~9 panes
    val b = arm(spark, "chained_kpis",
      df => ClickstreamStreams.userKpis(
        ClickstreamStreams.clickEventSessions(df), "10 seconds"),
      nUsers, sessionsPerUser, nBatches)
    val c = arm(spark, "chained_departments",
      df => ClickstreamStreams.departments(
        ClickstreamStreams.clickEventSessions(df), "10 seconds"),
      nUsers, sessionsPerUser, nBatches)
    val t = withRocksDb(spark) {
      arm(spark, "timer_rocksdb",
        df => TimerSessionizer.sessions(spark,
          ClickstreamStreams.fromClickEvents(df)).toDF(),
        nUsers, sessionsPerUser, nBatches)
    }
    s"[$a,$b,$c,$t]"
  }
}
