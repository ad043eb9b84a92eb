package graft.sources

import graft.Cols
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Batch file ingestion with an explicit corrupt-record policy — the
  * landing-zone edge of the pipeline, where 100 TB of "mostly JSON" meets
  * a declared schema. Three rules, all scale-driven:
  *
  *  - **Schema is required.** Inference is a second full scan and drifts
  *    silently when a new field appears; a declared schema fails loudly.
  *  - **Malformed rows are quarantined, not dropped.** Every line lands in
  *    exactly one of (parsed, quarantine), so the bad-record budget is
  *    observable and replayable — `DROPMALFORMED`'s silent erosion is how
  *    a feed loses 3% of its rows for a quarter unnoticed.
  *  - **Parse in-plan, not in-datasource.** Files are read once as text and
  *    decoded with `from_json`/`from_csv` (codegen'd, no extra scan). This
  *    also sidesteps Spark's restriction on queries that reference only
  *    the datasource's internal corrupt column (SPARK-21610), which
  *    otherwise forces a cache of the raw relation to split good from bad.
  *
  * The quarantine frame carries the RAW line, so a fixed parser can replay
  * it later — the write side of the contract is
  * [[graft.ops.Scale]]'s partitioned writers.
  */
object Ingest {

  val CorruptCol = "_corrupt"

  /** One parsed frame per input line: the declared schema's fields plus
    * `_corrupt` (null ⇔ the line parsed cleanly, raw line otherwise).
    * Shared shape for [[readJsonl]]/[[readCsv]] — split with [[good]] /
    * [[quarantine]], summarize with [[badRecordReport]].
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    spark.read.textFile(path).toDF("__line")
      .select(from_json(col("__line"), withCorrupt, opts).as("r"))
      .select(col("r.*"))
  }

  /** CSV twin of [[readJsonl]]. No header handling here: a header line is
    * a per-FILE property, and at 100 TB a glob of thousands of files makes
    * "drop the first line of each file" a partition-boundary bug factory —
    * strip headers upstream or filter them as (deterministic) quarantine
    * rows.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame = {
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol,
      "sep" -> delimiter)
    spark.read.textFile(path).toDF("__line")
      .select(from_csv(col("__line"), withCorrupt, opts).as("r"))
      .select(col("r.*"))
  }

  /** Cleanly parsed rows, corrupt marker dropped. */
  def good(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantined raw lines, ready for replay once the parser is fixed. */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))

  /** 1-row ingestion report: totals and the bad-record rate in ppm — the
    * number a landing-zone SLO is written against. One aggregate pass.
    */
  def badRecordReport(parsed: DataFrame): DataFrame =
    parsed
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col(CorruptCol).isNull, 1)).as("n_good"),
        count(col(CorruptCol)).as("n_bad"))
      .select(
        col("n_lines"), col("n_good"), col("n_bad"),
        when(col("n_lines") > 0,
          Cols.floorDiv(col("n_bad") * 1000000L, col("n_lines")))
          .otherwise(lit(0L)).as("bad_ppm"))
}
