package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Incremental MinHash dedup LEDGER — the production dedup shape for a
  * continuously-ingested corpus: every micro-batch of documents is
  * signed ([[Dedup.minhashSignatures]]), banded into LSH buckets
  * ([[Dedup.bandRows]]), probed against ONLY the persisted historical
  * bucket table (never the raw corpus, never itself re-paired), and then
  * appended to that table — so the work per batch is
  * |batch bands| × bucket collisions, independent of how large the
  * already-ingested corpus has grown. The batch twin proving the flag
  * semantics against a DuckDB oracle is [[Dedup.ledgerFlags]]
  * (registered as `dedup_ledger`).
  *
  * Layout and exactly-once: ledger and dup reports are parquet tables
  * partitioned by `batch=<id>` directories, and a batch writes its own
  * directory with OVERWRITE — a replayed batch (foreachBatch is
  * at-least-once) rewrites the same partition instead of
  * double-appending, and the probe reads only partitions `batch < id`,
  * so a replay can never pair a batch against its own earlier attempt.
  *
  * Scale: the ledger is exactly the index a 100 TB incremental pipeline
  * persists anyway (16 longs + 4 bucket hashes per doc); the probe join
  * is bucket-equi-keyed with the micro-batch as the small side. When
  * `batch=` partitions accumulate, [[compact]] folds the finalized ones
  * into a single partition offline without disturbing the probe cut.
  */
object DedupLedger {

  private val ledgerSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType)),
    StructField("band", IntegerType),
    StructField("bucket", StringType)))

  /** The historical bucket table strictly BEFORE `batchId` (empty frame
    * with the ledger schema when nothing has been ingested yet). The
    * `batch < batchId` cut is what makes replays safe — a re-run batch
    * must not see its own previous attempt.
    */
  private[streaming] def readLedgerBefore(
      spark: SparkSession, ledgerDir: String, batchId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch="))
    if (!hasData)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ledgerSchema)
    else
      // ignoreMissingFiles: folded partitions are deleted only by reap(),
      // one full compaction cycle AFTER their rows were duplicated into
      // the surviving batch=<target> partition — so a probe racing those
      // deferred deletes listed the directory long after the moves, has
      // the target's copies in its own file list, and loses nothing by
      // skipping a vanished original. The skip is the safe outcome.
      spark.read.option("ignoreMissingFiles", "true").parquet(ledgerDir)
        .filter(col("batch") < batchId)
        .select(col("doc_id"), col("sig"), col("band"), col("bucket"))
  }

  /** One ledger step, usable from plain batch jobs too (foreachBatch
    * hands a plain DataFrame): flag `batch` against the pre-`batchId`
    * ledger into `dupsDir/batch=<id>`, then persist the batch's bands to
    * `ledgerDir/batch=<id>`. The band table is materialized once
    * (localCheckpoint) because both the probe and the append read it;
    * blocks are freed after the writes commit.
    */
  def processBatch(
      batch: DataFrame, batchId: Long,
      ledgerDir: String, dupsDir: String,
      estThreshold: Double = Dedup.EstThreshold): Unit = {
    val spark = batch.sparkSession
    val bands = Dedup.bandRows(Dedup.minhashSignatures(batch)).localCheckpoint(true)
    try {
      val ledger = readLedgerBefore(spark, ledgerDir, batchId)
      Dedup.flagAgainstBands(bands, ledger, estThreshold)
        .write.mode("overwrite").parquet(s"$dupsDir/batch=$batchId")
      bands.write.mode("overwrite").parquet(s"$ledgerDir/batch=$batchId")
    } finally graft.LocalCheckpoints.free(bands)
  }

  /** Attach the ledger as a foreachBatch sink of a streaming document
    * source (columns `doc_id`, `text`).
    */
  def attach(
      docs: DataFrame, ledgerDir: String, dupsDir: String,
      checkpointDir: String,
      estThreshold: Double = Dedup.EstThreshold): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, ledgerDir, dupsDir, estThreshold)
      }
      .start()

  /** Compact the ledger's `batch < upTo` partitions into ONE consolidated
    * partition, keeping the `batch < id` probe cut intact: the
    * consolidated partition is the LARGEST compacted batch id, so any
    * future batch `b ≥ upTo` probes exactly the rows it would have seen
    * before compaction, and a replayed batch can never see its own rows
    * (they sit at a partition id ≥ its own — excluded by its `batch < id`
    * cut, same as before). Returns the number of partitions folded
    * (0 or 1 = nothing to do).
    *
    * PROBE-SAFE while the stream runs, via add-first + DEFERRED deletes:
    * the folded rows are staged and MOVED INTO the existing
    * `batch=<target>` partition, and the folded lower partitions are NOT
    * deleted in this invocation — a `.reap` manifest names them, and
    * they fall at the START of the next [[compact]] (or an explicit
    * [[reap]]). Between the two calls every probe sees a SUPERSET of the
    * pre-compact rows (some twice — harmless:
    * [[Dedup.flagAgainstBands]] distincts candidate pairs before
    * scoring, so duplicated ledger rows produce bit-identical output).
    * The deferral is what closes the in-flight race the immediate-delete
    * design had: a probe that LISTED the directory before the moves has
    * neither the staged copies in its file list nor — had deletes run
    * immediately — the originals on disk; deferring the deletes one full
    * compaction cycle means any probe that predates the moves has long
    * finished when the originals finally fall. The remaining assumption
    * is explicit and checkable: no single probe spans two compaction
    * cycles ([[readLedgerBefore]]'s `ignoreMissingFiles` covers a reap
    * racing a just-listed scan, whose skipped rows are in the target).
    *
    * Contract: call with `upTo` ≤ the oldest batch id that could still
    * replay (the stream's committed watermark). A replay of an
    * already-compacted batch still cannot self-pair — its probe cut
    * excludes the consolidated partition entirely — but it would probe
    * against none of the compacted history, so only finalized batches
    * should be folded. Crash-safety is trivial under deferral: no
    * invocation deletes the partitions it stages, so at EVERY crash
    * point the original rows are still on disk — a leftover
    * `.compact_tmp` holds only duplicates. It is still moved aside
    * (`.compact_orphan`) rather than destroyed, because a staging dir
    * left by a PRE-deferral build (which deleted originals before its
    * rename) can be the only copy of the folded history — never assume
    * away another layout's crash state.
    *
    * Scale: this is the offline maintenance pass the append-only layout
    * is designed for — one sequential read of the folded partitions and
    * one write, no shuffle (parquet-to-parquet), run from a scheduled
    * batch job while the stream keeps appending `batch ≥ upTo`.
    */
  def compact(spark: SparkSession, ledgerDir: String, upTo: Long): Int = {
    val root = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    // previous compact's foldees first: by now no probe predates its moves
    reap(spark, ledgerDir)
    val parts = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
      .filter(_ < upTo).sorted
    if (parts.length <= 1) return parts.length
    val target = parts.max
    val lower = parts.filter(_ < target)
    val targetDir = new org.apache.hadoop.fs.Path(root, s"batch=$target")
    val tmp = new org.apache.hadoop.fs.Path(root, ".compact_tmp")
    // preserve, never destroy, a stale staging dir: under THIS protocol
    // its rows are duplicates, but a pre-deferral crash could have left
    // it as the only copy — park it for hand recovery
    if (fs.exists(tmp)) {
      var k = 0
      var orphan = new org.apache.hadoop.fs.Path(root, s".compact_orphan")
      while (fs.exists(orphan)) { k += 1
        orphan = new org.apache.hadoop.fs.Path(root, s".compact_orphan$k") }
      require(fs.rename(tmp, orphan), s"failed to park stale $tmp at $orphan")
      System.err.println(s"[dedup-ledger] parked stale staging dir at $orphan")
    }
    // stage ONLY the lower partitions (reading batch=<target> while also
    // appending into it would be a read-overwrite hazard); the target's
    // own rows stay where they are
    spark.read.parquet(lower.map(b => s"$ledgerDir/batch=$b"): _*)
      .select(col("doc_id"), col("sig"), col("band"), col("bucket"))
      .write.mode("overwrite").parquet(tmp.toString)
    // move the staged data files into the surviving partition — from this
    // point the lower partitions' rows are (duplicately) visible via the
    // target; Spark part-file names embed a per-job UUID, so renames
    // cannot collide with the target's existing files
    fs.listStatus(tmp).map(_.getPath)
      .filter(p => p.getName.startsWith("part-"))
      .foreach { p =>
        require(fs.rename(p, new org.apache.hadoop.fs.Path(targetDir, p.getName)),
          s"failed to move staged file $p into $targetDir")
      }
    require(fs.delete(tmp, true), s"failed to remove staging dir $tmp")
    // defer the deletes: name the now-redundant originals in the manifest
    val out = fs.create(new org.apache.hadoop.fs.Path(root, ".reap"), true)
    out.write(lower.mkString(",").getBytes("UTF-8"))
    out.close()
    parts.length
  }

  /** Delete the partitions a previous [[compact]] folded (named by its
    * `.reap` manifest) — called automatically at the start of the next
    * compact, or explicitly once all probes that predate the fold's
    * moves have finished. Idempotent: re-runs re-delete what remains and
    * drop the manifest. Returns the number of partitions reaped.
    */
  def reap(spark: SparkSession, ledgerDir: String): Int = {
    val root = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new org.apache.hadoop.fs.Path(root, ".reap")
    if (!fs.exists(manifest)) return 0
    val in = fs.open(manifest)
    val ids = new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      .split(",").filter(_.nonEmpty).map(_.toLong)
    in.close()
    val n = ids.count { b =>
      val p = new org.apache.hadoop.fs.Path(root, s"batch=$b")
      fs.exists(p) && { require(fs.delete(p, true), s"failed to reap $p"); true }
    }
    require(fs.delete(manifest, false), s"failed to drop manifest $manifest")
    n
  }

  /** Filesystem-grain ledger health — what [[Dedup.ledgerStats]] models
    * in-plan, read off the REAL `batch=` directory layout: one row per
    * partition with its parquet file count and row count, plus the
    * probe-cost columns a compact decision reads (`cum_partitions` /
    * `cum_files`: a probe at batch b lists and opens every partition
    * `< b`, so these cumulative columns ARE its per-batch open cost —
    * after [[compact]] the same rows sit in one partition and the
    * columns collapse). Row counts survive compaction (duplicates from
    * a crash-looped compact can only raise them; the probe's distinct
    * collapses those), file/partition counts are what shrink.
    *
    * Scale: the listing is |partitions| driver-side filesystem metadata
    * (the same listing every probe already performs); the row counts
    * are one partition-pruned parquet count aggregate.
    */
  def ledgerHealth(spark: SparkSession, ledgerDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, sum, col => c}
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // pre-first-batch (or cleaned) ledger: an empty readout, not a crash
    if (!fs.exists(root) ||
        !fs.listStatus(root).exists(_.getPath.getName.startsWith("batch=")))
      return Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("batch", "n_files", "n_rows", "cum_partitions", "cum_files")
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .map { p =>
        val n = fs.listStatus(p).count(_.getPath.getName.startsWith("part-"))
        (p.getName.stripPrefix("batch=").toLong, n.toLong)
      }.toSeq
    // ignoreMissingFiles: the one ledger reader that may race a reap —
    // every row a skipped file held is already in batch=<target>
    val rows = spark.read.option("ignoreMissingFiles", "true").parquet(ledgerDir)
      .groupBy(c("batch").cast("long").as("batch"))
      .agg(count(lit(1)).as("n_rows"))
    files.toDF("batch", "n_files")
      .join(rows, Seq("batch"), "left")
      .na.fill(0L, Seq("n_rows"))
      .withColumn("cum_partitions",
        sum(lit(1L)).over(Window.orderBy(c("batch"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_files",
        sum(c("n_files")).over(Window.orderBy(c("batch"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** All dup reports so far, with the flagging batch id as a column
    * (partition discovery over the `batch=` layout).
    */
  def readDups(spark: SparkSession, dupsDir: String): DataFrame =
    spark.read.parquet(dupsDir)
      .select(col("batch").cast("long").as("batch"),
        col("doc_id_new"), col("doc_id_old"), col("est_jaccard"))
}
