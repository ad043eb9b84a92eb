package graft.streaming

import graft.SparkSpec

class CountLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, Long)*) =
    rows.toDF("event_id", "user_id")

  test("partials merge cumulatively; heavy hitters per snapshot; replay idempotent") {
    val root = java.nio.file.Files.createTempDirectory("count_ledger")
    val countsDir = root.resolve("counts").toString
    val topDir = root.resolve("top").toString
    try {
      // batch 0: user 1 ×3, user 2 ×1 → total 4; at denom 3 only user 1
      // clears n·3 ≥ total
      CountLedger.processBatch(
        events((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L)),
        0L, "user_id", countsDir, topDir, thresholdDenom = 3L)
      val top0 = spark.read.parquet(s"$topDir/batch=0")
        .as[(Long, Long, Long)].collect().toList
      assert(top0 === List((1L, 3L, 4L)))
      // batch 1: user 1 ×2, user 3 ×1 → running total 7, user 1 at 5
      CountLedger.processBatch(
        events((5L, 1L), (6L, 1L), (7L, 3L)),
        1L, "user_id", countsDir, topDir, thresholdDenom = 3L)
      val top1 = spark.read.parquet(s"$topDir/batch=1")
        .as[(Long, Long, Long)].collect().toList
      assert(top1 === List((1L, 5L, 7L)))
      // replay of batch 1 overwrites both of its partitions — same state
      CountLedger.processBatch(
        events((5L, 1L), (6L, 1L), (7L, 3L)),
        1L, "user_id", countsDir, topDir, thresholdDenom = 3L)
      assert(spark.read.parquet(s"$topDir/batch=1")
        .as[(Long, Long, Long)].collect().toList === top1)
      assert(CountLedger.mergedCounts(spark, countsDir)
        .as[(Long, Long)].collect().toMap === Map(1L -> 5L, 2L -> 1L, 3L -> 1L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("attach: the streaming sink builds the same ledger the batch entry point does") {
    val root = java.nio.file.Files.createTempDirectory("count_ledger_stream")
    val countsDir = root.resolve("counts").toString
    val topDir = root.resolve("top").toString
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val q = CountLedger.attach(
        input.toDF().toDF("event_id", "user_id"), "user_id",
        countsDir, topDir, root.resolve("ckpt").toString, thresholdDenom = 3L)
      try {
        input.addData((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L))
        q.processAllAvailable()
        input.addData((5L, 1L), (6L, 1L), (7L, 3L))
        q.processAllAvailable()
        assert(CountLedger.mergedCounts(spark, countsDir)
          .as[(Long, Long)].collect().toMap === Map(1L -> 5L, 2L -> 1L, 3L -> 1L))
        assert(spark.read.parquet(s"$topDir/batch=1")
          .as[(Long, Long, Long)].collect().toList === List((1L, 5L, 7L)))
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("compact folds partials by MERGE at the largest folded id; counts unchanged") {
    val root = java.nio.file.Files.createTempDirectory("count_ledger_compact")
    val countsDir = root.resolve("counts").toString
    val topDir = root.resolve("top").toString
    try {
      CountLedger.processBatch(events((1L, 1L), (2L, 2L)), 0L, "user_id", countsDir, topDir)
      CountLedger.processBatch(events((3L, 1L)), 1L, "user_id", countsDir, topDir)
      CountLedger.processBatch(events((4L, 3L)), 2L, "user_id", countsDir, topDir)
      val before = CountLedger.mergedCounts(spark, countsDir)
        .as[(Long, Long)].collect().toMap
      assert(CountLedger.compact(spark, countsDir, upTo = 3L) === 3)
      val dirs = new java.io.File(countsDir).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).sorted.toList
      assert(dirs === List("batch=2"))
      assert(CountLedger.mergedCounts(spark, countsDir)
        .as[(Long, Long)].collect().toMap === before)
      // a later batch's snapshot reads the folded history transparently
      CountLedger.processBatch(events((9L, 1L)), 3L, "user_id", countsDir, topDir,
        thresholdDenom = 3L)
      val top3 = spark.read.parquet(s"$topDir/batch=3")
        .as[(Long, Long, Long)].collect().toList.sortBy(_._1)
      assert(top3 === List((1L, 3L, 5L)))
      // nothing left to fold: 0/1-partition calls are no-ops
      assert(CountLedger.compact(spark, countsDir, upTo = 3L) === 1)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("compact recovery: stale stage discarded, committed marker completed") {
    val root = java.nio.file.Files.createTempDirectory("count_ledger_recover")
    val countsDir = root.resolve("counts").toString
    val topDir = root.resolve("top").toString
    try {
      CountLedger.processBatch(events((1L, 1L)), 0L, "user_id", countsDir, topDir)
      CountLedger.processBatch(events((2L, 1L), (3L, 2L)), 1L, "user_id", countsDir, topDir)
      // (a) stale stage with NO marker: a compact that crashed before its
      // commit point — discarded, the re-run folds from the originals
      Seq((99L, 99L)).toDF("key", "n")
        .write.mode("overwrite").parquet(s"$countsDir/.compact_tmp")
      assert(CountLedger.compact(spark, countsDir, upTo = 2L) === 2)
      assert(CountLedger.mergedCounts(spark, countsDir)
        .as[(Long, Long)].collect().toMap === Map(1L -> 2L, 2L -> 1L))
      // (b) marker present: a compact that crashed AFTER its commit point
      // — the staged merge is authoritative; a re-run completes the swap
      CountLedger.processBatch(events((4L, 3L)), 2L, "user_id", countsDir, topDir)
      Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("key", "n")
        .write.mode("overwrite").parquet(s"$countsDir/.compact_tmp")
      val fs = new org.apache.hadoop.fs.Path(countsDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$countsDir/.compact_commit"), true)
      out.write("2:1,2".getBytes("UTF-8"))
      out.close()
      assert(CountLedger.compact(spark, countsDir, upTo = 3L) === 0)
      val dirs = new java.io.File(countsDir).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).sorted.toList
      assert(dirs === List("batch=2"))
      assert(CountLedger.mergedCounts(spark, countsDir)
        .as[(Long, Long)].collect().toMap === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$countsDir/.compact_commit")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("compact recovery after the rename: the target is a survivor, never re-deleted") {
    // the post-rename crash window: stage already swapped in as
    // batch=<target>, marker still present, NO .compact_tmp left — the
    // target is the ONLY copy of the folded counts, and recovery must
    // finish the protocol without touching it
    val root = java.nio.file.Files.createTempDirectory("count_ledger_postrename")
    val countsDir = root.resolve("counts").toString
    val topDir = root.resolve("top").toString
    try {
      // manufacture the state: batch=1 IS the consolidated fold of
      // {0: user1×1, 1: user1×1 user2×1}; batch=0 already deleted;
      // marker names 0 and 1 as folded with target 1
      Seq((1L, 2L), (2L, 1L)).toDF("key", "n")
        .write.mode("overwrite").parquet(s"$countsDir/batch=1")
      val fs = new org.apache.hadoop.fs.Path(countsDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$countsDir/.compact_commit"), true)
      out.write("1:0,1".getBytes("UTF-8"))
      out.close()
      assert(CountLedger.compact(spark, countsDir, upTo = 2L) === 0)
      val dirs = new java.io.File(countsDir).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).sorted.toList
      assert(dirs === List("batch=1"), "the consolidated target must survive recovery")
      assert(CountLedger.mergedCounts(spark, countsDir)
        .as[(Long, Long)].collect().toMap === Map(1L -> 2L, 2L -> 1L))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$countsDir/.compact_commit")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }
}
