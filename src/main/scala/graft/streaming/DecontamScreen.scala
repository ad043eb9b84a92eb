package graft.streaming

import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming benchmark-decontamination screen — the release gate
  * productized the way [[DedupLedger]] productized dedup: the benchmark
  * suite's positional winnow index is small and STATIC (eval suites are
  * thousands of docs), so it is computed once and every ingest
  * micro-batch of corpus documents is screened against it as it
  * arrives. The alternative — re-running the one-shot screen
  * ([[TextAnalysis.decontaminationScreen]]) over the accumulated corpus
  * per release — rescans everything ingested so far; this pays only
  * |batch| work per batch and the report is always current.
  *
  * Per micro-batch: the batch's distinct winnow fingerprints are pruned
  * against the (broadcast) benchmark fingerprint set FIRST, df-capped
  * WITHIN the batch (a global df is unknowable mid-stream; the
  * per-batch cap is the declared boundary semantic — see
  * [[TextAnalysis.decontaminationIncremental]], the oracled batch twin
  * of exactly this screen), and the benchmark windows those
  * fingerprints select are written to `hitsDir/batch=<id>` with
  * OVERWRITE — an at-least-once replay rewrites its own partition
  * instead of double-appending, so the accumulated hit set is
  * idempotent by construction (the [[DedupLedger]] layout).
  *
  * Scale: the only per-batch work is one semi-join of the batch's
  * fingerprints against a broadcast benchmark index plus a
  * benchmark-bounded write; the report aggregates a table bounded by
  * |benchmark windows| × batches (distinct-collapsed before the span
  * window). The corpus never accumulates anywhere in this path.
  */
object DecontamScreen {

  /** The static benchmark index, materialized once (localCheckpoint)
    * because every micro-batch probes it: (doc_id, pos, fingerprint).
    * Callers keep it for the life of the stream and
    * [[graft.LocalCheckpoints.free]] it on teardown.
    */
  def benchmarkIndex(benchmark: DataFrame): DataFrame =
    TextAnalysis.benchmarkPositionalIndex(benchmark).localCheckpoint(true)

  /** One screen step, usable from plain batch jobs too: flag the
    * benchmark windows whose fingerprints appear in `batch`'s df-capped
    * vocabulary, into `hitsDir/batch=<id>`. `benchFps` is the
    * benchmark's distinct fingerprint set — pass the one
    * [[benchmarkFingerprints]] materialized for the stream's lifetime
    * so it is not re-distinct'ed per batch; when omitted it derives
    * from the index (the one-shot batch path).
    */
  def processBatch(
      batch: DataFrame, batchId: Long, benchIndex: DataFrame,
      hitsDir: String, maxBatchDf: Long = 50L,
      benchFps: Option[DataFrame] = None): Unit = {
    val fps = benchFps.getOrElse(benchIndex.select(col("fingerprint")).distinct())
    val vocab = TextAnalysis.winnowFingerprints(batch)
      .join(broadcast(fps), Seq("fingerprint"), "leftsemi")
      .groupBy(col("fingerprint")).agg(org.apache.spark.sql.functions.count(lit(1)).as("__df"))
      .filter(col("__df") <= maxBatchDf)
      .select(col("fingerprint"))
    benchIndex
      .join(vocab, Seq("fingerprint"), "leftsemi")
      .select(col("doc_id"), col("pos"))
      .write.mode("overwrite").parquet(s"$hitsDir/batch=$batchId")
  }

  /** The benchmark's distinct fingerprint set, materialized once
    * (localCheckpoint) beside [[benchmarkIndex]] — every batch
    * broadcasts it, so re-running the distinct per batch for the life
    * of the stream is pure waste. Free on teardown like the index.
    */
  def benchmarkFingerprints(benchIndex: DataFrame): DataFrame =
    benchIndex.select(col("fingerprint")).distinct().localCheckpoint(true)

  /** Attach the screen as a foreachBatch sink of a streaming document
    * source (columns `doc_id`, `text`). The distinct benchmark
    * fingerprint set is materialized once for the stream's lifetime and
    * freed when the harness tears the session down.
    */
  def attach(
      docs: DataFrame, benchIndex: DataFrame, hitsDir: String,
      checkpointDir: String, maxBatchDf: Long = 50L): StreamingQuery = {
    val fps = benchmarkFingerprints(benchIndex)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, benchIndex, hitsDir, maxBatchDf, Some(fps))
      }
      .start()
  }

  /** The accumulated contamination report — same 7-column shape as the
    * one-shot screen: a benchmark window is contaminated once ANY batch
    * has hit it (distinct collapse across `batch=` partitions before
    * the span window).
    */
  def report(spark: SparkSession, hitsDir: String, benchIndex: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(hitsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch="))
    val hits =
      if (!hasData)
        benchIndex.select(col("doc_id"), col("pos")).limit(0)
      else
        spark.read.parquet(hitsDir).select(col("doc_id"), col("pos")).distinct()
    TextAnalysis.contaminationReport(benchIndex, hits)
  }
}
