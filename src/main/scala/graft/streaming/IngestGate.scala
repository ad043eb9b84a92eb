package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** The composed ingest gate — the admission pipeline a continuously-fed
  * training corpus actually runs, wired from the incremental pieces that
  * are each oracled on their own: every micro-batch of documents is
  * (1) probed against the persisted MinHash dedup ledger and appended to
  * it ([[DedupLedger]] — batch twin `dedup_ledger`), (2) screened
  * against the static benchmark fingerprint index
  * ([[DecontamScreen]] — batch twin `txt_decontam_incr`), and
  * (3) optionally counted into the per-key frequency ledger
  * ([[CountLedger]] — batch twin `ev_heavy_incr`), and (4) summarized
  * into a one-row-per-batch admission record: document count,
  * near-duplicates flagged against history, benchmark windows newly
  * contaminated by THIS batch, and (when frequency tracking is on) how
  * many keys currently dominate the stream — the row an ingest
  * dashboard pages on. All outputs land under `batch=<id>` partitions
  * with overwrite, so an at-least-once replay rewrites its own rows
  * everywhere and the gate is idempotent end to end.
  *
  * Scale: the gate adds nothing to its parts — per batch it is the
  * ledger's bucket-collision probe + the screen's broadcast semi-join +
  * three partition-scoped counts; the corpus never accumulates in any
  * path. Operationally this is ONE foreachBatch sink, so the three
  * steps share a single stream checkpoint and replay together.
  */
object IngestGate {

  /** One gate step, usable from plain batch jobs too. The micro-batch is
    * materialized ONCE (localCheckpoint) — the ledger's minhash scan,
    * the screen's fingerprint scan, and the doc count would otherwise
    * each re-evaluate the source, tripling per-batch ingest cost in the
    * hot path; blocks are freed once both writes commit. `benchFps` is
    * the benchmark's distinct fingerprint set: pass the one
    * [[DecontamScreen.benchmarkFingerprints]] materialized for the
    * stream's lifetime (as [[attach]] does) so the screen does not
    * re-distinct the benchmark index on every micro-batch — the exact
    * per-batch waste that memoization exists to avoid; when omitted it
    * derives from the index (the one-shot batch path).
    */
  def processBatch(
      batch: DataFrame, batchId: Long, benchIndex: DataFrame,
      ledgerDir: String, dupsDir: String, hitsDir: String,
      summaryDir: String, benchFps: Option[DataFrame] = None,
      freq: Option[FreqConfig] = None): Unit = {
    val spark = batch.sparkSession
    val pinned = batch.localCheckpoint(true)
    try {
      DedupLedger.processBatch(pinned, batchId, ledgerDir, dupsDir)
      DecontamScreen.processBatch(pinned, batchId, benchIndex, hitsDir,
        benchFps = benchFps)
      val nHeavy = freq.fold(-1L) { f =>
        CountLedger.processBatch(
          pinned, batchId, f.keyCol, f.countsDir, f.topDir, f.thresholdDenom)
        spark.read.parquet(s"${f.topDir}/batch=$batchId").count()
      }
      val nDocs = pinned.count()
      val nDup = spark.read.parquet(s"$dupsDir/batch=$batchId").count()
      val nContam = spark.read.parquet(s"$hitsDir/batch=$batchId").count()
      import spark.implicits._
      Seq((nDocs, nDup, nContam, nHeavy))
        .toDF("n_docs", "n_dups_vs_history", "n_contaminated_windows", "n_heavy_keys")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$summaryDir/batch=$batchId")
    } finally graft.LocalCheckpoints.free(pinned)
  }

  /** Frequency-tracking leg of the gate: which column to count and where
    * the [[CountLedger]] partials and heavy-hitter snapshots live.
    * `n_heavy_keys` in the summary is −1 when the leg is off — a stable
    * schema either way.
    */
  final case class FreqConfig(
      keyCol: String, countsDir: String, topDir: String,
      thresholdDenom: Long = 200L)

  /** Attach the gate as one foreachBatch sink of a streaming document
    * source (columns `doc_id`, `text`). The distinct benchmark
    * fingerprint set is materialized once for the stream's lifetime
    * (mirroring [[DecontamScreen.attach]]) and freed when the harness
    * tears the session down.
    */
  def attach(
      docs: DataFrame, benchIndex: DataFrame,
      ledgerDir: String, dupsDir: String, hitsDir: String,
      summaryDir: String, checkpointDir: String,
      freq: Option[FreqConfig] = None): StreamingQuery = {
    val fps = DecontamScreen.benchmarkFingerprints(benchIndex)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, benchIndex, ledgerDir, dupsDir, hitsDir,
          summaryDir, benchFps = Some(fps), freq = freq)
      }
      .start()
  }

  /** The admission ledger: one row per ingested batch. Summaries written
    * before the frequency leg existed lack `n_heavy_keys`; mergeSchema
    * reconciles the partitions and the nulls decode as the leg-off −1
    * sentinel, so a gate that upgrades mid-stream keeps a readable,
    * stable-schema ledger.
    */
  def summary(spark: SparkSession, summaryDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    val raw = spark.read.option("mergeSchema", "true").parquet(summaryDir)
    val heavy =
      if (raw.columns.contains("n_heavy_keys"))
        coalesce(col("n_heavy_keys"), lit(-1L)).as("n_heavy_keys")
      else lit(-1L).as("n_heavy_keys")
    raw.select(col("batch").cast("long").as("batch"), col("n_docs"),
      col("n_dups_vs_history"), col("n_contaminated_windows"), heavy)
  }
}
