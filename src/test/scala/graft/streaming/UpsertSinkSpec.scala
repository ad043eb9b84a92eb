package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming upsert materialization: one latest row per key, and batches
  * rewrite only the bucket partitions they touch.
  */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val NBuckets = 4

  private def bucketOf(k: Long): Int =
    spark.range(1).select(pmod(hash(lit(k)), lit(NBuckets))).head().getInt(0)

  test("upsert keeps the latest row per key; untouched buckets are not rewritten") {
    val root = java.nio.file.Files.createTempDirectory("upsert_sink")
    val path = root.resolve("table").toString
    val ckpt = root.resolve("ckpt").toString
    try {
      // pick keys so k1/k3 share neither bucket with k2 — k2's partition
      // must survive batch 2 byte-identical
      val k1 = 1L
      val k2 = (2L to 50L).find(k => bucketOf(k) != bucketOf(k1)).get
      val k3 = (k2 + 1 to 99L)
        .find(k => bucketOf(k) == bucketOf(k1) && k != k1).get
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Long, String)]
      val q = UpsertSink.sink(
        input.toDF().toDF("user_id", "seq", "state"),
        path, key = "user_id", orderCol = "seq", checkpointDir = ckpt,
        nBuckets = NBuckets)
      try {
        // batch 1: k1 twice (seq 2 must win), k2 once
        input.addData((k1, 1L, "k1-old"), (k1, 2L, "k1-mid"), (k2, 1L, "k2-v1"))
        q.processAllAvailable()
        val k2Dir = new java.io.File(s"$path/__bucket=${bucketOf(k2)}")
        val k2FilesAfterB1 = k2Dir.list().sorted.toList
        // batch 2: update k1, insert k3 — k2's bucket untouched
        input.addData((k1, 3L, "k1-new"), (k3, 1L, "k3-v1"))
        q.processAllAvailable()
        val got = UpsertSink.read(spark, path)
          .as[(Long, Long, String)].collect().toSet
        assert(got === Set(
          (k1, 3L, "k1-new"), // updated across batches, within-batch loser gone
          (k2, 1L, "k2-v1"), // untouched key survives
          (k3, 1L, "k3-v1"))) // inserted alongside the update
        // dynamic overwrite must NOT have re-staged k2's partition: same files
        assert(k2Dir.list().sorted.toList === k2FilesAfterB1)
      } finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("mergeBatch works as a plain batch MERGE too") {
    val root = java.nio.file.Files.createTempDirectory("upsert_batch")
    val path = root.resolve("t").toString
    try {
      UpsertSink.mergeBatch(
        Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "seq", "v"),
        path, "k", "seq", NBuckets)
      UpsertSink.mergeBatch(
        Seq((2L, 2L, 25.0)).toDF("k", "seq", "v"),
        path, "k", "seq", NBuckets)
      val got = UpsertSink.read(spark, path).as[(Long, Long, Double)].collect().toSet
      assert(got === Set((1L, 1L, 10.0), (2L, 2L, 25.0)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }
}
