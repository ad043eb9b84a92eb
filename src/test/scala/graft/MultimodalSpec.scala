package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary plumbing: payload bytes survive the media-record mapping") {
    val docs = Seq((1L, "hello"), (2L, "wörld")).toDF("doc_id", "text")
    val got = Multimodal.asMediaRecords(docs)
      .select(col("doc_id"), octet_length(col("payload")))
      .as[(Long, Int)].collect().toMap
    assert(got(1L) === 5)
    assert(got(2L) === 6) // ö is 2 bytes in UTF-8 — byte length, not char length
  }

  test("decode stub: deterministic features from payload bytes") {
    val docs = Seq((3L, "x" * 100)).toDF("doc_id", "text")
    val f = Multimodal.decodeFeatures(spark, Multimodal.asMediaRecords(docs)).collect().head
    assert(f.n_bytes === 100L)
    assert(f.width === 64 + 100 % 64)
    assert(f.height === 64 + (100 / 7) % 64)
    assert(f.frames === 1 + 100 % 8)
    assert(f.media_type === "image") // doc_id 3 % 3 == 0
    // md5 of 100 'x' bytes — fixed
    assert(f.checksum.length === 32)
    val rerun = Multimodal.decodeFeatures(spark, Multimodal.asMediaRecords(docs)).collect().head
    assert(f === rerun)
  }
}
