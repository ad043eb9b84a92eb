package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming incremental MinHash dedup ledger: batch-2 dups against
  * batch-1 are caught, batches never pair against themselves, and a
  * replayed batch cannot see its own previous attempt.
  */
class DedupLedgerSpec extends SparkSpec {
  import spark.implicits._

  private val original = "the quick brown fox jumps over the lazy dog again and again tonight"
  private val unrelated = "completely different words about database engines and shuffle plans"
  private val unique = "yet another disjoint text mentioning volcanoes glaciers and tundra biomes"

  test("two-batch replay: cross-batch dup flagged, intra-batch and unique docs are not") {
    val root = java.nio.file.Files.createTempDirectory("dedup_ledger")
    val ledgerDir = root.resolve("ledger").toString
    val dupsDir = root.resolve("dups").toString
    val ckpt = root.resolve("ckpt").toString
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = DedupLedger.attach(
        input.toDF().toDF("doc_id", "text"), ledgerDir, dupsDir, ckpt)
      try {
        // batch 0: the ledger is empty — nothing can flag, even though
        // docs 1 and 2 arrive together (the ledger is cross-batch only;
        // intra-batch dedup composes with the batch minhashLsh operator)
        input.addData((1L, original), (2L, unrelated))
        q.processAllAvailable()
        // batch 1: doc 3 is a verbatim copy of batch-0's doc 1; doc 4 is
        // unique — exactly one flag, est 1.0, attributed old → new
        input.addData((3L, original), (4L, unique))
        q.processAllAvailable()
        val dups = DedupLedger.readDups(spark, dupsDir)
          .as[(Long, Long, Long, Double)].collect().toList
        assert(dups === List((1L, 3L, 1L, 1.0)))
        // the ledger now holds both batches' band rows (4 bands per doc)
        val ledger = spark.read.parquet(ledgerDir)
        assert(ledger.select("doc_id").distinct().as[Long].collect().toSet
          === Set(1L, 2L, 3L, 4L))
        assert(ledger.count() === 16L)
      } finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("compact folds old partitions, keeps the probe cut, and a replayed batch cannot self-pair") {
    val root = java.nio.file.Files.createTempDirectory("dedup_ledger_compact")
    val ledgerDir = root.resolve("ledger").toString
    val dupsDir = root.resolve("dups").toString
    try {
      DedupLedger.processBatch(
        Seq((1L, original), (2L, unrelated)).toDF("doc_id", "text"), 0L, ledgerDir, dupsDir)
      DedupLedger.processBatch(
        Seq((3L, unique)).toDF("doc_id", "text"), 1L, ledgerDir, dupsDir)
      DedupLedger.processBatch(
        Seq((4L, "entirely fresh content about mountain weather stations")
        ).toDF("doc_id", "text"), 2L, ledgerDir, dupsDir)
      val rowsBefore = spark.read.parquet(ledgerDir).count()
      val distinctBefore = spark.read.parquet(ledgerDir)
        .select("doc_id", "band", "bucket").distinct().count()
      // fold batches 0 and 1 into one partition (the largest folded id);
      // the folded originals stay on disk until the deferred reap
      assert(DedupLedger.compact(spark, ledgerDir, upTo = 2L) === 2)
      val dirsPending = new java.io.File(ledgerDir).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).sorted.toList
      assert(dirsPending === List("batch=0", "batch=1", "batch=2"))
      // superset window: every pre-compact row still visible (some twice)
      assert(spark.read.parquet(ledgerDir).count() >= rowsBefore)
      assert(DedupLedger.reap(spark, ledgerDir) === 1)
      val dirs = new java.io.File(ledgerDir).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).sorted.toList
      assert(dirs === List("batch=1", "batch=2"))
      // no row lost across fold + reap (copies replaced originals 1:1)
      assert(spark.read.parquet(ledgerDir).count() === rowsBefore)
      assert(spark.read.parquet(ledgerDir)
        .select("doc_id", "band", "bucket").distinct().count() === distinctBefore)
      // probe continuity: a new batch still flags against COMPACTED history
      DedupLedger.processBatch(
        Seq((9L, original)).toDF("doc_id", "text"), 3L, ledgerDir, dupsDir)
      val dups = DedupLedger.readDups(spark, dupsDir)
        .as[(Long, Long, Long, Double)].collect().toList
      assert(dups === List((3L, 9L, 1L, 1.0)))
      // replay of the newest UNcompacted batch: probe cut batch < 2 sees
      // only the consolidated partition (id 1 < 2) — same data as before
      // compaction, and never its own rows
      DedupLedger.processBatch(
        Seq((4L, "entirely fresh content about mountain weather stations")
        ).toDF("doc_id", "text"), 2L, ledgerDir, dupsDir)
      assert(spark.read.parquet(s"$dupsDir/batch=2").count() === 0L)
      // replay of an already-COMPACTED batch id: its rows now live at
      // partition id 1 ≥ 0, outside its own batch < 0 cut — it cannot
      // self-pair even though doc 1's bands are in the folded history
      DedupLedger.processBatch(
        Seq((1L, original)).toDF("doc_id", "text"), 0L, ledgerDir, dupsDir)
      assert(spark.read.parquet(s"$dupsDir/batch=0").count() === 0L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("ledgerHealth: compact shrinks the probe-cost columns, preserves every row") {
    val root = java.nio.file.Files.createTempDirectory("dedup_ledger_health")
    val ledgerDir = root.resolve("ledger").toString
    val dupsDir = root.resolve("dups").toString
    try {
      DedupLedger.processBatch(
        Seq((1L, original), (2L, unrelated)).toDF("doc_id", "text"), 0L, ledgerDir, dupsDir)
      DedupLedger.processBatch(
        Seq((3L, unique)).toDF("doc_id", "text"), 1L, ledgerDir, dupsDir)
      DedupLedger.processBatch(
        Seq((4L, "entirely fresh content about mountain weather stations")
        ).toDF("doc_id", "text"), 2L, ledgerDir, dupsDir)
      def health() = DedupLedger.ledgerHealth(spark, ledgerDir)
        .select($"batch", $"n_files", $"n_rows", $"cum_partitions", $"cum_files")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
      val before = health()
      assert(before.map(_._1) === List(0L, 1L, 2L))
      // the probe-cost columns: a batch-3 probe opens 3 partitions today
      assert(before.last._4 === 3L)
      val rowsBefore = before.map(_._3).sum
      assert(DedupLedger.compact(spark, ledgerDir, upTo = 3L) === 3)
      // deletes are deferred: the probe-cost columns shrink at the reap
      assert(health().map(_._1) === List(0L, 1L, 2L))
      assert(DedupLedger.reap(spark, ledgerDir) === 2)
      val after = health()
      // one consolidated partition at the LARGEST folded id
      assert(after.map(_._1) === List(2L))
      // probe cost reduced: the same batch-3 probe now opens 1 partition
      // and fewer-or-equal files; no row went missing
      assert(after.last._4 === 1L)
      assert(after.last._5 <= before.last._5)
      assert(after.map(_._3).sum === rowsBefore)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("compact mid-swap visibility is a SUPERSET: duplicated rows change no flags (probe-safe)") {
    val root = java.nio.file.Files.createTempDirectory("dedup_ledger_midswap")
    val ledgerDir = root.resolve("ledger").toString
    val dupsDir = root.resolve("dups").toString
    try {
      DedupLedger.processBatch(
        Seq((1L, original), (2L, unrelated)).toDF("doc_id", "text"), 0L, ledgerDir, dupsDir)
      DedupLedger.processBatch(
        Seq((3L, unique)).toDF("doc_id", "text"), 1L, ledgerDir, dupsDir)
      // reconstruct compact's mid-swap state by hand: the staged copies of
      // batch=0's files already moved into the surviving batch=1 partition
      // while batch=0 itself is not yet deleted — every batch-0 row is
      // visible TWICE to a concurrent probe
      val src = new java.io.File(s"$ledgerDir/batch=0").listFiles()
        .filter(f => f.getName.startsWith("part-"))
      src.foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(s"$ledgerDir/batch=1", "mid-" + f.getName))
      }
      // a probe in that window flags exactly what it would have flagged
      // before: flagAgainstBands' distinct collapses the duplicated pairs
      DedupLedger.processBatch(
        Seq((9L, original)).toDF("doc_id", "text"), 2L, ledgerDir, dupsDir)
      assert(DedupLedger.readDups(spark, dupsDir)
        .as[(Long, Long, Long, Double)].collect().toList === List((2L, 9L, 1L, 1.0)))
      // and compact + reap over the duplicated state still converges to
      // the consolidated layout with the full distinct content
      assert(DedupLedger.compact(spark, ledgerDir, upTo = 2L) === 2)
      assert(DedupLedger.reap(spark, ledgerDir) === 1)
      val dirs = new java.io.File(ledgerDir).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).sorted.toList
      assert(dirs === List("batch=1", "batch=2"))
      assert(spark.read.parquet(ledgerDir)
        .select("doc_id", "band", "bucket").distinct().count() === 16L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("compact re-run parks a stale staging dir and loses nothing (crash self-heal)") {
    val root = java.nio.file.Files.createTempDirectory("dedup_ledger_tmpguard")
    val ledgerDir = root.resolve("ledger").toString
    val dupsDir = root.resolve("dups").toString
    try {
      DedupLedger.processBatch(
        Seq((1L, original)).toDF("doc_id", "text"), 0L, ledgerDir, dupsDir)
      DedupLedger.processBatch(
        Seq((2L, unrelated)).toDF("doc_id", "text"), 1L, ledgerDir, dupsDir)
      DedupLedger.processBatch(
        Seq((3L, unique)).toDF("doc_id", "text"), 2L, ledgerDir, dupsDir)
      // simulate a crash after staging: under the deferred-reap protocol
      // the staging dir holds only duplicates, but it is PARKED (not
      // destroyed) because a pre-deferral build's crash could have left
      // it as the only copy of the folded history
      val tmp = root.resolve("ledger/.compact_tmp")
      java.nio.file.Files.createDirectory(tmp)
      new java.io.File(s"$ledgerDir/batch=0").listFiles()
        .filter(_.getName.startsWith("part-")).foreach { f =>
          java.nio.file.Files.copy(f.toPath, tmp.resolve(f.getName))
        }
      assert(DedupLedger.compact(spark, ledgerDir, upTo = 2L) === 2)
      assert(!java.nio.file.Files.exists(tmp))
      assert(java.nio.file.Files.exists(root.resolve("ledger/.compact_orphan")),
        "stale stage must be parked for hand recovery, never destroyed")
      assert(DedupLedger.reap(spark, ledgerDir) === 1)
      val dirs = new java.io.File(ledgerDir).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).sorted.toList
      assert(dirs === List("batch=1", "batch=2"))
      // the full pre-crash history survives, exactly once each
      assert(spark.read.parquet(ledgerDir)
        .select("doc_id", "band", "bucket").distinct().count() === 12L)
      // and the compacted history still flags
      DedupLedger.processBatch(
        Seq((9L, original)).toDF("doc_id", "text"), 3L, ledgerDir, dupsDir)
      assert(DedupLedger.readDups(spark, dupsDir)
        .as[(Long, Long, Long, Double)].collect().toList === List((3L, 9L, 1L, 1.0)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("processBatch replay overwrites its own partition and never self-pairs") {
    val root = java.nio.file.Files.createTempDirectory("dedup_ledger_replay")
    val ledgerDir = root.resolve("ledger").toString
    val dupsDir = root.resolve("dups").toString
    try {
      val b0 = Seq((1L, original), (2L, unrelated)).toDF("doc_id", "text")
      DedupLedger.processBatch(b0, 0L, ledgerDir, dupsDir)
      // at-least-once replay of the SAME batch id: the probe reads only
      // batch < 0 (nothing), so doc 1 must not flag against its own
      // previous attempt, and the partition is rewritten, not doubled
      DedupLedger.processBatch(b0, 0L, ledgerDir, dupsDir)
      assert(DedupLedger.readDups(spark, dupsDir).count() === 0L)
      assert(spark.read.parquet(ledgerDir).count() === 8L)
      // the next batch still sees the replayed ledger exactly once
      DedupLedger.processBatch(
        Seq((9L, original)).toDF("doc_id", "text"), 1L, ledgerDir, dupsDir)
      val dups = DedupLedger.readDups(spark, dupsDir)
        .as[(Long, Long, Long, Double)].collect().toList
      assert(dups === List((1L, 9L, 1L, 1.0)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }
}
