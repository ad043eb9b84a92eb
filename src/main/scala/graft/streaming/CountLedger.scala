package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming heavy-hitter COUNT LEDGER — the frequency leg of the
  * incremental family ([[DedupLedger]]: duplicates, [[DecontamScreen]]:
  * contamination, [[DriftMonitor]]: distribution drift, this: key
  * frequency): each micro-batch writes its OWN per-key partial counts to
  * `countsDir/batch=<id>` with OVERWRITE, then snapshots the merged
  * `batch ≤ id` counts into a heavy-hitter report (the `ev_heavy_hitters`
  * 0.5% rule) at `topDir/batch=<id>` — so a replayed batch rewrites both
  * of its partitions and the trace stays idempotent (the ledger layout
  * law). The oracled batch twin is `ev_heavy_incr` (cumulative
  * heavy-hitter snapshots over simulated batches).
  *
  * The partial-counts layout is the classic mergeable-aggregate shape: a
  * batch's work is one map-side-combined count of ITS OWN keys, and the
  * merged view is a sum over per-batch partials — never a rescan of the
  * raw stream. Contrast with [[DedupLedger]] on compaction: band rows
  * CONCATENATE (duplicate visibility is probe-safe, so compact can run
  * add-first under a live stream), but counts MERGE — a duplicated
  * partial double-counts and a missing one undercounts — so
  * [[compact]] here is a marker-committed two-phase swap that must not
  * run concurrently with snapshots or appends.
  *
  * Scale: per batch one hash aggregate of the micro-batch (map-side
  * combined); the snapshot reads |keys seen| partial rows per partition
  * — which is why [[compact]] exists: it folds finalized partials into
  * one partition so the per-snapshot merge cost stops growing with
  * stream age. The heavy-hitter threshold is computed from a 1-row
  * total broadcast, never a driver collect.
  */
object CountLedger {

  /** One ledger step, usable from plain batch jobs too: write `batch`'s
    * per-key partial counts, then the merged `batch ≤ batchId`
    * heavy-hitter snapshot (keys holding ≥ 1/`thresholdDenom` of all
    * events seen so far).
    */
  def processBatch(
      batch: DataFrame, batchId: Long, keyCol: String,
      countsDir: String, topDir: String,
      thresholdDenom: Long = 200L): Unit = {
    batch.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$countsDir/batch=$batchId")
    val merged = mergedCounts(batch.sparkSession, countsDir, Some(batchId))
    merged
      .crossJoin(broadcast(merged.agg(sum(col("n_events")).as("__total"))))
      .filter(col("n_events") * thresholdDenom >= col("__total"))
      .select(col("key"), col("n_events"), col("__total").as("total_events"))
      .write.mode("overwrite").parquet(s"$topDir/batch=$batchId")
  }

  /** The merged per-key counts over partials `batch ≤ upTo` (all
    * partitions when `upTo` is None). One sum-aggregate over partial
    * rows — the raw stream is never rescanned.
    */
  def mergedCounts(
      spark: SparkSession, countsDir: String, upTo: Option[Long] = None): DataFrame = {
    // deliberately NO ignoreMissingFiles: counts merge, so a snapshot
    // racing a compact's deletes would silently UNDERCOUNT if skipped
    // files were tolerated (the dedup ledger can tolerate them — its
    // skipped rows have visible duplicates; a skipped partial has none).
    // Violating the no-concurrent-compact contract fails loudly instead.
    val all = spark.read.parquet(countsDir)
    upTo.fold(all)(id => all.filter(col("batch") <= id))
      .groupBy(col("key"))
      .agg(sum(col("n")).as("n_events"))
  }

  /** Attach the ledger as a foreachBatch sink of a streaming source. */
  def attach(
      events: DataFrame, keyCol: String,
      countsDir: String, topDir: String, checkpointDir: String,
      thresholdDenom: Long = 200L): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, keyCol, countsDir, topDir, thresholdDenom)
      }
      .start()

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Fold the `batch < upTo` partial-count partitions into ONE
    * sum-merged partition at the LARGEST folded id (the
    * [[DedupLedger.compact]] id rule, so every future `batch ≤ id`
    * snapshot cut is preserved). Returns partitions folded (0 or 1 =
    * nothing to do).
    *
    * Counts MERGE rather than concatenate, so the mid-swap
    * duplicate-visibility trick that makes [[DedupLedger.compact]]
    * probe-safe would DOUBLE-COUNT here; instead the swap is a
    * marker-committed two-phase protocol that is crash-RESUMABLE but
    * requires no concurrent snapshot/processBatch:
    *
    *  1. stage the full merged counts in `.compact_tmp`
    *  2. write the `.compact_commit` marker naming the folded ids —
    *     the point of no return (before it, originals are intact and a
    *     re-run discards the stage; after it, the stage is authoritative)
    *  3. delete the folded partitions, swap the stage in as
    *     `batch=<target>`, drop the marker
    *
    * A re-run after a crash at ANY point either restarts cleanly
    * (no marker) or completes steps 3 (marker present) — counts are
    * never lost and never doubled.
    */
  def compact(spark: SparkSession, countsDir: String, upTo: Long): Int = {
    val (fs, root) = fsOf(spark, countsDir)
    if (!fs.exists(root)) return 0
    val tmp = new org.apache.hadoop.fs.Path(root, ".compact_tmp")
    val marker = new org.apache.hadoop.fs.Path(root, ".compact_commit")
    if (fs.exists(marker)) {
      finishCommitted(fs, root, tmp, marker)
      return 0
    }
    if (fs.exists(tmp)) require(fs.delete(tmp, true), s"failed to clear stale $tmp")
    val parts = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
      .filter(_ < upTo).sorted
    if (parts.length <= 1) return parts.length
    val target = parts.max
    spark.read.parquet(parts.map(b => s"$countsDir/batch=$b"): _*)
      .groupBy(col("key")).agg(sum(col("n")).as("n"))
      .write.mode("overwrite").parquet(tmp.toString)
    // commit point: from here the staged merge is the authoritative copy
    val out = fs.create(marker, true)
    out.write(s"$target:${parts.mkString(",")}".getBytes("UTF-8"))
    out.close()
    finishCommitted(fs, root, tmp, marker)
    parts.length
  }

  /** Step 3 of the protocol, idempotent at every crash point. The branch
    * order is load-bearing: once the stage has been renamed into
    * `batch=<target>`, the target IS the only copy — so when the stage
    * is absent the folded-partition deletes must skip the target (a
    * crash between the rename and the marker delete would otherwise
    * have this recovery pass destroy the consolidated counts it is
    * supposed to finish installing).
    */
  private def finishCommitted(
      fs: org.apache.hadoop.fs.FileSystem, root: org.apache.hadoop.fs.Path,
      tmp: org.apache.hadoop.fs.Path, marker: org.apache.hadoop.fs.Path): Unit = {
    val in = fs.open(marker)
    val txt = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    val Array(targetS, foldedS) = txt.split(":", 2)
    val targetDir = new org.apache.hadoop.fs.Path(root, s"batch=$targetS")
    val stagePresent = fs.exists(tmp)
    foldedS.split(",").map(_.toLong).foreach { b =>
      val p = new org.apache.hadoop.fs.Path(root, s"batch=$b")
      // with the stage gone, batch=<target> holds the merged counts —
      // it is a SURVIVOR of this recovery pass, not a foldee
      if ((stagePresent || b.toString != targetS) && fs.exists(p))
        require(fs.delete(p, true), s"failed to delete folded $p")
    }
    if (stagePresent)
      require(fs.rename(tmp, targetDir), s"failed to swap $tmp into $targetDir")
    require(fs.exists(targetDir), s"committed compact left no $targetDir")
    require(fs.delete(marker, false), s"failed to drop marker $marker")
  }
}
