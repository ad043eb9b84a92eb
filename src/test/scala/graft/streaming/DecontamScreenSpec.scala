package graft.streaming

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming benchmark-decontamination screen: a clean first batch flags
  * nothing, a contaminated second batch flags the right benchmark doc
  * with the right span shape, a replayed batch is idempotent, and the
  * accumulated report matches the oracled batch twin
  * ([[TextAnalysis.decontaminationIncremental]]) on the same batch
  * assignment.
  */
class DecontamScreenSpec extends SparkSpec {
  import spark.implicits._

  // benchmark doc 100 is the eval suite; corpus doc 3 quotes it verbatim.
  // The clean docs share NO 4-char gram with the benchmark text (checked
  // exhaustively — innocuous English words collide: "about"/"question"
  // share grams with almost anything)
  private val benchText = "the held out benchmark question about volcanic glaciers"
  private val cleanA = "zebra xylophone jazz quiz fuzzy puzzle vivid dwarf gyp crwth"
  private val cleanB = "sphinx judge my vow plus wry nymph flux dozen jumpy frogs"
  private val contaminated = "prefix words then the held out benchmark question about volcanic glaciers end"

  private def bench = Seq((100L, benchText)).toDF("doc_id", "text")

  test("two-batch stream: clean batch flags nothing, contaminated batch flags the doc; replay idempotent") {
    val root = java.nio.file.Files.createTempDirectory("decontam")
    val hitsDir = root.resolve("hits").toString
    val ckpt = root.resolve("ckpt").toString
    val benchIndex = DecontamScreen.benchmarkIndex(bench)
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = DecontamScreen.attach(
        input.toDF().toDF("doc_id", "text"), benchIndex, hitsDir, ckpt)
      try {
        // batch 0: clean corpus docs — report shows the benchmark doc
        // fully un-contaminated
        input.addData((1L, cleanA), (2L, cleanB))
        q.processAllAvailable()
        val clean = DecontamScreen.report(spark, hitsDir, benchIndex)
          .select("doc_id", "n_hit", "n_spans", "max_span_chars")
          .as[(Long, Long, Long, Long)].collect().toList
        assert(clean.map(_._1) === List(100L))
        assert(clean.head._2 === 0L && clean.head._3 === 0L && clean.head._4 === 0L)
        // batch 1: doc 3 contains the benchmark text verbatim — every
        // benchmark window must flag as one maximal span
        input.addData((3L, contaminated))
        q.processAllAvailable()
        val got = DecontamScreen.report(spark, hitsDir, benchIndex)
          .select("doc_id", "n_windows", "n_hit", "leak_frac_e4", "n_spans",
            "max_span_windows", "max_span_chars")
          .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toList
        assert(got.size === 1)
        val (id, nw, nh, leak, ns, msw, msc) = got.head
        assert(id === 100L)
        assert(nw > 0 && nh === nw, s"all $nw windows should hit, got $nh")
        assert(leak === 10000L)
        assert(ns === 1L)
        assert(msw === nw)
        assert(msc === nw + 6)
      } finally q.stop()
      // at-least-once replay of the contaminated batch id: the partition
      // is rewritten, the distinct collapse keeps the report unchanged
      val before = DecontamScreen.report(spark, hitsDir, benchIndex)
        .select("n_hit").as[Long].collect().toList
      DecontamScreen.processBatch(
        Seq((3L, contaminated)).toDF("doc_id", "text"), 1L, benchIndex, hitsDir)
      val after = DecontamScreen.report(spark, hitsDir, benchIndex)
        .select("n_hit").as[Long].collect().toList
      assert(after === before)
    } finally {
      graft.LocalCheckpoints.free(benchIndex)
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("accumulated streaming report equals the oracled batch twin on the same batch split") {
    val root = java.nio.file.Files.createTempDirectory("decontam_twin")
    val hitsDir = root.resolve("hits").toString
    val benchIndex = DecontamScreen.benchmarkIndex(bench)
    try {
      // corpus of 4 docs routed by pmod(doc_id, 2) — the twin's assignment
      val corpus = Seq(
        (0L, cleanA), (1L, contaminated), (2L, cleanB),
        (3L, "the held out benchmark question appears here too"))
        .toDF("doc_id", "text")
      DecontamScreen.processBatch(
        corpus.filter($"doc_id" % 2 === 0), 0L, benchIndex, hitsDir)
      DecontamScreen.processBatch(
        corpus.filter($"doc_id" % 2 === 1), 1L, benchIndex, hitsDir)
      val streamed = DecontamScreen.report(spark, hitsDir, benchIndex)
        .orderBy("doc_id").collect().toList
      val twin = TextAnalysis.decontaminationIncremental(corpus, bench, nBatches = 2)
        .orderBy("doc_id").collect().toList
      assert(streamed === twin)
    } finally {
      graft.LocalCheckpoints.free(benchIndex)
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }
}
