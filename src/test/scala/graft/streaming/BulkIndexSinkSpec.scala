package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X4 (Elasticsearch bulk sink) semantics without HTTP: threshold-driven
  * flushes (10k actions / 1 MB in production, small here) and
  * retry-with-exponential-backoff on bulk failure — the reference's
  * setBulkFlushMaxActions / MaxSizeMb / Backoff configuration
  * (AmazonElasticsearchSink.java:53-56).
  */
class BulkIndexSinkSpec extends SparkSpec {
  import BulkIndexSinkSpec._

  private def runSink(
      docs: Seq[String],
      maxActions: Int,
      failFirst: Int,
      maxRetries: Int = 3): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    calls.clear(); sleeps.clear(); failuresLeft.set(failFirst)
    val input = MemoryStream[String]
    val q = ClickstreamApp.bulkIndexSink(
      input.toDF().coalesce(1), // one partition → deterministic flush grouping
      indexName = "user_session",
      checkpointLocation = java.nio.file.Files.createTempDirectory("bulk_ckpt").toString,
      client = new FlakyClient,
      maxActions = maxActions,
      maxRetries = maxRetries,
      backoffMs = 100L,
      sleep = ms => sleeps.add(ms)).start()
    try {
      input.addData(docs)
      q.processAllAvailable()
    } finally q.stop()
  }

  test("flush triggers at maxActions and on batch end") {
    runSink(docs = (1 to 5).map(i => s"""{"doc":$i}"""), maxActions = 2, failFirst = 0)
    val sizes = calls.toArray.map(_.asInstanceOf[(String, Seq[String])]._2.size).toList
    assert(sizes === List(2, 2, 1))
    assert(calls.toArray.map(_.asInstanceOf[(String, Seq[String])]._1).toSet === Set("user_session"))
    assert(sleeps.isEmpty)
  }

  test("failed bulk is retried with exponential backoff, no docs lost") {
    runSink(docs = Seq("""{"doc":1}""", """{"doc":2}"""), maxActions = 10, failFirst = 2)
    val flushed = calls.toArray.map(_.asInstanceOf[(String, Seq[String])]._2).toList
    assert(flushed === List(Seq("""{"doc":1}""", """{"doc":2}""")))
    assert(sleeps.toArray.map(_.asInstanceOf[Long]).toList === List(100L, 200L))
  }

  test("exhausted retries fail the micro-batch (checkpoint does not advance)") {
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runSink(docs = Seq("""{"doc":1}"""), maxActions = 10, failFirst = 10, maxRetries = 2)
    }
    // the underlying bulk failure propagated through foreachBatch
    assert(e.getMessage.contains("bulk rejected") ||
      Option(e.getCause).exists(_.toString.contains("bulk rejected")))
    assert(calls.isEmpty)
  }
}

object BulkIndexSinkSpec {
  val calls = new java.util.concurrent.CopyOnWriteArrayList[(String, Seq[String])]()
  val sleeps = new java.util.concurrent.CopyOnWriteArrayList[Long]()
  val failuresLeft = new java.util.concurrent.atomic.AtomicInteger(0)

  final class FlakyClient extends ClickstreamApp.BulkClient {
    override def bulkIndex(indexName: String, jsonDocs: Seq[String]): Unit = {
      if (failuresLeft.getAndDecrement() > 0) throw new RuntimeException("bulk rejected")
      calls.add((indexName, jsonDocs))
    }
  }
}
