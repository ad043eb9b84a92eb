package graft.streaming

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming PSI drift monitor: a stable batch stays quiet, a shifted
  * batch alerts on ITS OWN partition (not diluted into the pool), replay
  * is idempotent, and the accumulated trace equals the oracled batch
  * twin ([[Similarity.embPsiIncremental]]) on the same batch split.
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  // reference: dim-1 constant 0.1, dim-2 spread over {0.0 .. 0.4}
  private def refVecs = (0L until 20L).map { i =>
    (i, Seq(0.1f, (i % 5).toFloat / 10f), 0)
  }.toDF("vec_id", "embedding", "label")

  test("stable batch quiet, shifted batch alerts on its own partition; replay idempotent") {
    val root = java.nio.file.Files.createTempDirectory("drift")
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val ref = DriftMonitor.reference(refVecs)
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Seq[Float], Int)]
      val q = DriftMonitor.attach(
        input.toDF().toDF("vec_id", "embedding", "label"), ref, outDir, ckpt)
      try {
        // batch 0: drawn from the reference distribution — no flags
        input.addData((100L until 120L).map(i => (i, Seq(0.1f, ((i - 100) % 5).toFloat / 10f), 0)): _*)
        q.processAllAvailable()
        // batch 1: dim 2 shifts wholesale to 0.9 — must alert
        input.addData((200L until 220L).map(i => (i, Seq(0.1f, 0.9f), 0)): _*)
        q.processAllAvailable()
        val trace = DriftMonitor.trace(spark, outDir)
          .select("batch", "dim", "psi_e4", "drift_flag")
          .as[(Long, Long, Long, Long)].collect()
          .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
        // stable batch: dim 2 sees the same distribution, no flag
        assert(trace((0L, 2L))._2 === 0L)
        assert(trace((0L, 1L))._2 === 0L)
        // shifted batch: dim 2 alerts, dim 1 (unchanged constant) doesn't
        assert(trace((1L, 2L))._1 > 2000L && trace((1L, 2L))._2 === 1L)
        assert(trace((1L, 1L))._2 === 0L)
      } finally q.stop()
      // at-least-once replay of the shifted batch: partition rewritten,
      // trace unchanged
      val before = DriftMonitor.trace(spark, outDir).orderBy("batch", "dim").collect().toList
      DriftMonitor.processBatch(
        (200L until 220L).map(i => (i, Seq(0.1f, 0.9f), 0))
          .toDF("vec_id", "embedding", "label"), 1L, ref, outDir)
      val after = DriftMonitor.trace(spark, outDir).orderBy("batch", "dim").collect().toList
      assert(after === before)
    } finally {
      graft.LocalCheckpoints.free(ref)
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("accumulated trace equals the oracled batch twin on the same split") {
    // build a corpus whose embhalf/psibatch hash splits the twin uses are
    // discovered in-test, then stream exactly those batches
    def h(prefix: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$prefix$id".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val ids = (0L until 120L)
    val vec = (i: Long) => Seq((i % 7).toFloat / 10f, (i % 3).toFloat / 10f)
    val all = ids.map(i => (i, vec(i), 0)).toDF("vec_id", "embedding", "label")
    val refIds = ids.filter(h("embhalf:", _) % 2 == 0)
    val curIds = ids.filterNot(h("embhalf:", _) % 2 == 0)
    val b0 = curIds.filter(h("psibatch:", _) % 2 == 0)
    val b1 = curIds.filterNot(h("psibatch:", _) % 2 == 0)
    assert(b0.nonEmpty && b1.nonEmpty)
    val root = java.nio.file.Files.createTempDirectory("drift_twin")
    val outDir = root.resolve("out").toString
    val ref = DriftMonitor.reference(
      refIds.map(i => (i, vec(i), 0)).toDF("vec_id", "embedding", "label"))
    try {
      DriftMonitor.processBatch(
        b0.map(i => (i, vec(i), 0)).toDF("vec_id", "embedding", "label"), 0L, ref, outDir)
      DriftMonitor.processBatch(
        b1.map(i => (i, vec(i), 0)).toDF("vec_id", "embedding", "label"), 1L, ref, outDir)
      val streamed = DriftMonitor.trace(spark, outDir)
        .orderBy("batch", "dim").collect().toList
      val twin = Similarity.embPsiIncremental(all)
        .select("batch", "dim", "n_ref", "n_cur", "psi_e4", "drift_flag")
        .orderBy("batch", "dim").collect().toList
      assert(streamed === twin)
    } finally {
      graft.LocalCheckpoints.free(ref)
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }
}
