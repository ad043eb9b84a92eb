package graft.streaming

import graft.dedup.Dedup
import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming embedding-drift monitor — the third leg of the incremental
  * triple ([[DedupLedger]]: dedup, [[DecontamScreen]]: contamination,
  * this: distribution drift): the reference window's per-dimension
  * histogram is computed ONCE and frozen (ranges, bin counts, totals —
  * the artifact a production monitor persists beside the model), and
  * every micro-batch of ingested vectors is scored against it with the
  * per-dim PSI math of `emb_psi`, writing its (dim, psi, flag) readout
  * to `outDir/batch=<id>` with OVERWRITE — at-least-once replays rewrite
  * their own partition, so the accumulated trace is idempotent (the
  * [[DedupLedger]] layout). Unlike the pooled batch screen, the trace
  * shows drift PER BATCH — a shift that starts mid-stream alerts on its
  * first batch instead of being diluted into the pool. The oracled batch
  * twin pinning the math is [[Similarity.embPsiIncremental]]
  * (`emb_psi_incr`).
  *
  * Scale: per batch, the only batch-sized work is one posexplode + bin
  * assignment against the broadcast dim×bins reference; everything
  * downstream is a (dim × bins) map-side-combined aggregate. The
  * reference is never recomputed.
  */
object DriftMonitor {

  /** The frozen reference histogram, materialized once (localCheckpoint)
    * because every micro-batch probes it: (dim, __bin, __lo, __hi, __nr,
    * n_ref). Callers keep it for the life of the stream and
    * [[graft.LocalCheckpoints.free]] it on teardown.
    */
  def reference(refVectors: DataFrame, bins: Int = 10): DataFrame = {
    val (ranges, refCounts, refTot) =
      Similarity.psiReferenceParts(Dedup.quantized(refVectors), bins)
    ranges
      .join(refTot, "dim")
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        refVectors.sparkSession.range(bins).select(col("id").as("__bin"))))
      .join(refCounts, Seq("dim", "__bin"), "left")
      .na.fill(0L, Seq("__nr"))
      .select(col("dim"), col("__bin"), col("__lo"), col("__hi"), col("__nr"), col("n_ref"))
      .localCheckpoint(true)
  }

  /** One monitor step, usable from plain batch jobs too: score `batch`
    * (columns `vec_id`, `embedding`, `label`) against the frozen
    * reference into `outDir/batch=<id>`.
    */
  def processBatch(
      batch: DataFrame, batchId: Long, refHist: DataFrame,
      outDir: String, bins: Int = 10, alertE4: Long = 2000L): Unit = {
    val cur = Dedup.quantized(batch).withColumn("batch", lit(batchId))
    Similarity.psiVsReference(
        refHist.select(col("dim"), col("__lo"), col("__hi")).distinct(),
        refHist.select(col("dim"), col("__bin"), col("__nr")),
        refHist.select(col("dim"), col("n_ref")).distinct(),
        cur, bins, alertE4)
      .select(col("dim"), col("n_ref"), col("n_cur"), col("psi_e4"), col("drift_flag"))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
  }

  /** Attach the monitor as a foreachBatch sink of a streaming vector
    * source (columns `vec_id`, `embedding`, `label`).
    */
  def attach(
      vectors: DataFrame, refHist: DataFrame, outDir: String,
      checkpointDir: String, bins: Int = 10, alertE4: Long = 2000L): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, refHist, outDir, bins, alertE4)
      }
      .start()

  /** The accumulated drift trace: (batch, dim, n_ref, n_cur, psi_e4,
    * drift_flag) across all scored batches.
    */
  def trace(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .select(col("batch").cast("long").as("batch"), col("dim"),
        col("n_ref"), col("n_cur"), col("psi_e4"), col("drift_flag"))
}
