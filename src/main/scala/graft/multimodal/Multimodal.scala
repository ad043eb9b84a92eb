package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in batched
  * `mapPartitions` stages.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment): [[DecodeStub.decode]] derives deterministic fake
  * dimensions from the payload bytes. Everything around it — the schema,
  * the binary column handling, the partition-batched typed pipeline, the
  * Encoder plumbing — is the real shape a production decode stage uses
  * (swap `DecodeStub.decode` for an actual codec call per batch).
  *
  * Scale notes: media blobs ride in their own column so parquet column
  * pruning keeps metadata-only queries from ever reading the bytes;
  * `mapPartitions` amortizes per-batch codec setup (the reason this is not
  * a per-row UDF); decode output is narrow (metadata + features), so the
  * wide binary never shuffles.
  */
object Multimodal {

  /** A media record: opaque payload + metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Deterministic decode result (the stubbed "codec" output). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      frames: Long,
      checksum: String)

  /** STUB decoder: a real implementation would parse image/audio headers
    * here (one codec instance per partition, reused across the batch).
    * The fake derives all "decoded" properties purely from payload size
    * and content hash, so it is exactly reproducible by the SQL oracle.
    */
  object DecodeStub {
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length.toLong
      val md = java.security.MessageDigest.getInstance("MD5")
      val checksum = md.digest(r.payload).map("%02x".format(_)).mkString
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = n,
        width = 64 + n % 64,
        height = 64 + (n / 7) % 64,
        frames = 1 + n % 8,
        checksum = checksum)
    }
  }

  /** Documents as media records: the UTF-8 text bytes stand in for a real
    * payload (same plumbing, fake codec). Media type fans out
    * deterministically so downstream queries exercise per-type handling.
    */
  def asMediaRecords(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** The decode stage: binary in, typed features out, batched per
    * partition. This is the operator a real pipeline runs with an actual
    * codec; keep the decode narrow and let column pruning drop `payload`
    * afterwards.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition setup happens once here (codec init in real life)
      it.map(DecodeStub.decode)
    }
  }

  /** End-to-end: documents → binary media column → stubbed decode →
    * features. Registered with a full SQL oracle because the stub is
    * deterministic on payload bytes.
    */
  def features(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, asMediaRecords(Tables.documents(spark, dir))).toDF()

  /** Per-type rollup over decoded features — the "did the decode stage
    * feed analytics" smoke at scale.
    */
  def typeStats(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"),
        max(col("frames")).as("max_frames"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_features" -> ((s, d) => features(s, d)),
    "mm_type_stats" -> ((s, d) => typeStats(s, d)),
  )

  private val featuresCte =
    """WITH f AS (
      |  SELECT doc_id,
      |    ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
      |    octet_length(encode(text))::BIGINT AS n_bytes,
      |    md5(text) AS checksum
      |  FROM documents
      |), feat AS (
      |  SELECT doc_id, media_type, n_bytes,
      |    64 + n_bytes % 64 AS width,
      |    64 + (n_bytes // 7) % 64 AS height,
      |    1 + n_bytes % 8 AS frames,
      |    checksum
      |  FROM f
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "mm_decode_features" ->
      s"""$featuresCte
         |SELECT doc_id, media_type, n_bytes, width, height, frames, checksum FROM feat""".stripMargin,
    "mm_type_stats" ->
      s"""$featuresCte
         |SELECT media_type, count(*) AS n_media,
         |       sum(n_bytes)::BIGINT AS total_bytes,
         |       round(avg(width), 4) AS avg_width,
         |       round(avg(height), 4) AS avg_height,
         |       max(frames) AS max_frames
         |FROM feat GROUP BY media_type""".stripMargin,
  )
}
