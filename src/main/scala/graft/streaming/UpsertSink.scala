package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming keyed UPSERT into a parquet table — a Delta-less MERGE
  * materialization: the table holds exactly one latest row per key, and
  * each micro-batch rewrites ONLY the partitions its keys touch.
  *
  * Layout: the table is hash-bucket partitioned
  * (`__bucket = pmod(hash(key), nBuckets)`). Per batch:
  *   1. latest-per-key within the batch (row_number over the order
  *      column — last writer wins deterministically),
  *   2. current rows from ONLY the touched buckets are kept where their
  *      key is absent from the batch (left-semi on bucket, left-anti on
  *      key),
  *   3. kept ∪ batch is written with dynamic partition overwrite, so
  *      untouched bucket directories are not rewritten (their files are
  *      byte-identical, not re-staged — the spec pins file names).
  *
  * Scale: per-batch IO is proportional to touched buckets, not table
  * size; `nBuckets` dials rewrite granularity against small-files
  * pressure exactly like any partitioned upsert store. The merged batch
  * is materialized (localCheckpoint) before the write because the write
  * overwrites files the merge plan reads — the read must not be lazy
  * across its own overwrite; blocks are freed right after the commit.
  */
object UpsertSink {

  /** Merge one batch into the table at `path` (usable directly in batch
    * jobs too — foreachBatch hands us a plain DataFrame).
    */
  def mergeBatch(
      batch: DataFrame,
      path: String,
      key: String,
      orderCol: String,
      nBuckets: Int): Unit = {
    val spark = batch.sparkSession
    // highest orderCol wins; exact orderCol ties fall back to a
    // deterministic content hash so reruns of the same input persist the
    // same row (partition-internal arrival order would not)
    val w = Window.partitionBy(col(key))
      .orderBy(col(orderCol).desc, hash(batch.columns.map(col).toSeq: _*))
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .withColumn("__bucket", pmod(hash(col(key)), lit(nBuckets)))
    // existence via the path's FileSystem (java.io.File would mis-answer
    // for hdfs://, s3a://, or file: URIs — and a wrong "no table" answer
    // here would silently drop previously upserted keys)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(hPath)) latest
      else {
        val current = spark.read.parquet(path)
        val touched = latest.select(col("__bucket")).distinct()
        current
          .join(touched, Seq("__bucket"), "left_semi")
          .join(latest.select(col(key)), Seq(key), "left_anti")
          .unionByName(latest.select(current.columns.map(col).toSeq: _*))
      }
    val materialized = merged.localCheckpoint(true)
    try {
      materialized.write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__bucket")
        .parquet(path)
    } finally graft.LocalCheckpoints.free(materialized)
  }

  /** Attach the upsert as a foreachBatch sink of a streaming DataFrame. */
  def sink(
      df: DataFrame,
      path: String,
      key: String,
      orderCol: String,
      checkpointDir: String,
      nBuckets: Int = 16): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, path, key, orderCol, nBuckets)
      }
      .start()

  /** The materialized table without the bucketing column. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__bucket")
}
