package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The composed ingest gate: dedup-vs-history and benchmark
  * contamination both land in the per-batch admission summary, a clean
  * batch admits clean, and a replayed batch leaves every output —
  * ledger, dups, hits, summary — unchanged.
  */
class IngestGateSpec extends SparkSpec {
  import spark.implicits._

  private val benchText = "the held out benchmark question about volcanic glaciers"
  private val cleanA = "zebra xylophone jazz quiz fuzzy puzzle vivid dwarf gyp crwth"
  private val cleanB = "sphinx judge my vow plus wry nymph flux dozen jumpy frogs"
  private val contaminated = "prefix words then the held out benchmark question about volcanic glaciers end"

  test("dup-vs-history and contamination both reach the admission summary; replay idempotent") {
    val root = java.nio.file.Files.createTempDirectory("ingest_gate")
    def dir(n: String) = root.resolve(n).toString
    val benchIndex = DecontamScreen.benchmarkIndex(Seq((100L, benchText)).toDF("doc_id", "text"))
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = IngestGate.attach(
        input.toDF().toDF("doc_id", "text"), benchIndex,
        dir("ledger"), dir("dups"), dir("hits"), dir("summary"), dir("ckpt"))
      try {
        // batch 0: two clean docs — nothing flags
        input.addData((1L, cleanA), (2L, cleanB))
        q.processAllAvailable()
        // batch 1: doc 3 duplicates batch-0's doc 1, doc 4 quotes the
        // benchmark — one dup flag, contaminated windows > 0
        input.addData((3L, cleanA), (4L, contaminated))
        q.processAllAvailable()
        val got = IngestGate.summary(spark, dir("summary"))
          .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
        assert(got.size === 2)
        assert(got.head === ((0L, 2L, 0L, 0L, -1L)))
        val (b, n, d, c) = (got(1)._1, got(1)._2, got(1)._3, got(1)._4)
        assert(b === 1L && n === 2L && d === 1L && c > 0L)
        assert(got(1)._5 === -1L, "frequency leg off: sentinel column")
      } finally q.stop()
      // replay batch 1 via the plain-batch entry point: every output is
      // rewritten in place, nothing double-counts
      val before = IngestGate.summary(spark, dir("summary"))
        .orderBy("batch").collect().toList
      IngestGate.processBatch(
        Seq((3L, cleanA), (4L, contaminated)).toDF("doc_id", "text"),
        1L, benchIndex, dir("ledger"), dir("dups"), dir("hits"), dir("summary"))
      val after = IngestGate.summary(spark, dir("summary"))
        .orderBy("batch").collect().toList
      assert(after === before)
      assert(spark.read.parquet(dir("ledger")).select("doc_id").distinct().count() === 4L)
    } finally {
      graft.LocalCheckpoints.free(benchIndex)
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("frequency leg: a source dominating the stream reaches the admission summary") {
    val root = java.nio.file.Files.createTempDirectory("ingest_gate_freq")
    def dir(n: String) = root.resolve(n).toString
    val benchIndex = DecontamScreen.benchmarkIndex(Seq((100L, benchText)).toDF("doc_id", "text"))
    val freq = Some(IngestGate.FreqConfig("source", dir("counts"), dir("top"),
      thresholdDenom = 2L))
    try {
      // batch 0: balanced sources — each holds EXACTLY 1/2, and the
      // rule is inclusive, so both flag
      IngestGate.processBatch(
        Seq((1L, cleanA, "web"), (2L, cleanB, "books"))
          .toDF("doc_id", "text", "source"),
        0L, benchIndex, dir("ledger"), dir("dups"), dir("hits"), dir("summary"),
        freq = freq)
      // batch 1: three more web docs — web now holds 4/5 of the stream
      IngestGate.processBatch(
        Seq((3L, cleanB + " one", "web"), (4L, cleanB + " two", "web"),
          (5L, cleanB + " three", "web"))
          .toDF("doc_id", "text", "source"),
        1L, benchIndex, dir("ledger"), dir("dups"), dir("hits"), dir("summary"),
        freq = freq)
      val got = IngestGate.summary(spark, dir("summary"))
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
      assert(got.map(r => (r._1, r._5)) === List((0L, 2L), (1L, 1L)))
      val heavy = spark.read.parquet(s"${dir("top")}/batch=1")
        .as[(String, Long, Long)].collect().toList
      assert(heavy === List(("web", 4L, 5L)))
    } finally {
      graft.LocalCheckpoints.free(benchIndex)
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }
}
