package graft.streaming

import graft.model.ClickEvent
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Binary-Avro decode for the ClickEvent wire format — the reference's
  * input encoding (SURVEY.md S1; schema from the reference's
  * ClickEvent.avsc:1-14), implemented against plain Apache Avro so no
  * spark-avro connector is required.
  *
  * The Glue-Schema-Registry framing the reference consumes
  * (GlueSchemaRegistryAvroDeserializationSchema, ClickstreamProcessor.java:118)
  * is a connector concern, not query semantics: this decoder takes the raw
  * Avro binary body (`skipHeaderBytes` strips any registry prefix).
  *
  * Decode runs in `mapPartitions` with one reusable
  * GenericDatumReader/decoder per partition — the batched shape a codec
  * stage needs (same pattern as the multimodal decode).
  */
object AvroClickEvents {

  /** The reference's Avro schema, field-for-field (ClickEvent.avsc:1-14). */
  val SchemaJson: String =
    """{
      |  "type": "record",
      |  "name": "ClickEvent",
      |  "namespace": "samples.clickstream.avro",
      |  "fields": [
      |    {"name": "ip", "type": "string"},
      |    {"name": "eventtimestamp", "type": "long"},
      |    {"name": "devicetype", "type": "string"},
      |    {"name": "event_type", "type": ["string", "null"]},
      |    {"name": "product_type", "type": ["string", "null"]},
      |    {"name": "userid", "type": "int"},
      |    {"name": "globalseq", "type": "long"},
      |    {"name": "prevglobalseq", "type": "long", "default": 0}
      |  ]
      |}""".stripMargin

  private def str(r: GenericRecord, field: String): String =
    Option(r.get(field)).map(_.toString).orNull

  /** Glue Schema Registry envelope constants (public wire format: 1 header
    * version byte, 1 compression byte, 16-byte schema-version UUID).
    */
  private val GsrHeaderVersion: Byte = 3
  private val GsrCompressionNone: Byte = 0
  private val GsrCompressionZlib: Byte = 5
  private val GsrHeaderLen = 18
  /** Confluent envelope: magic 0 + 4-byte schema id. */
  private val ConfluentHeaderLen = 5

  /** Length of a schema-registry envelope at the head of `bytes`, or 0 for
    * a bare Avro body. Detects the Glue framing the reference's
    * deserializer handles (ClickstreamProcessor.java:118) and the
    * Confluent framing for good measure. A bare ClickEvent body cannot
    * alias either magic byte: the first Avro field is the `ip` string,
    * whose zigzag length prefix is 3 only for the invalid length -2, and 0
    * only for an empty ip (excluded by the generator; documented caveat).
    */
  private[streaming] def registryHeaderLength(bytes: Array[Byte]): Int =
    if (bytes.length > GsrHeaderLen && bytes(0) == GsrHeaderVersion &&
      (bytes(1) == GsrCompressionNone || bytes(1) == GsrCompressionZlib)) GsrHeaderLen
    else if (bytes.length > ConfluentHeaderLen && bytes(0) == 0) ConfluentHeaderLen
    else 0

  private[streaming] def isZlibCompressed(bytes: Array[Byte]): Boolean =
    bytes.length > GsrHeaderLen && bytes(0) == GsrHeaderVersion &&
      bytes(1) == GsrCompressionZlib

  private def inflate(bytes: Array[Byte], offset: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes, offset, bytes.length - offset)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new java.io.EOFException("truncated zlib body")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Decode a binary column of Avro-encoded ClickEvents into the typed
    * event Dataset. `raw` needs a `value: binary` column (the Kafka source
    * shape).
    *
    * @param skipHeaderBytes fixed prefix to strip; -1 (default) detects a
    *   Glue/Confluent schema-registry envelope per record — including
    *   zlib-compressed Glue bodies — and strips it, the behavior of the
    *   reference's GlueSchemaRegistryAvroDeserializationSchema
    *   (ClickstreamProcessor.java:118).
    */
  def decode(spark: SparkSession, raw: DataFrame, skipHeaderBytes: Int = -1): Dataset[ClickEvent] = {
    import spark.implicits._
    raw.select("value").as[Array[Byte]].mapPartitions { it =>
      // per-partition codec setup, reused across the batch
      val schema = new Schema.Parser().parse(SchemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var decoder: BinaryDecoder = null
      it.map { raw0 =>
        val detect = skipHeaderBytes < 0
        val compressed = detect && isZlibCompressed(raw0)
        val skip =
          if (!detect) skipHeaderBytes
          else if (compressed) GsrHeaderLen
          else registryHeaderLength(raw0)
        val bytes = if (compressed) inflate(raw0, skip) else raw0
        val off = if (compressed) 0 else skip
        decoder = DecoderFactory.get()
          .binaryDecoder(bytes, off, bytes.length - off, decoder)
        val r = reader.read(null, decoder)
        ClickEvent(
          ip = str(r, "ip"),
          eventtimestamp = r.get("eventtimestamp").asInstanceOf[Long],
          devicetype = str(r, "devicetype"),
          event_type = str(r, "event_type"),
          product_type = str(r, "product_type"),
          userid = r.get("userid").asInstanceOf[Int],
          globalseq = r.get("globalseq").asInstanceOf[Long],
          prevglobalseq = r.get("prevglobalseq").asInstanceOf[Long])
      }
    }
  }

  /** Test/generator-side: wrap a bare Avro body in a Glue Schema Registry
    * envelope (header version 3, compression 0/5, 16-byte schema-version
    * UUID), optionally zlib-compressing the body — the wire shape a real
    * MSK topic carries.
    */
  def gsrFrame(body: Array[Byte], compress: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + GsrHeaderLen)
    out.write(GsrHeaderVersion)
    out.write(if (compress) GsrCompressionZlib else GsrCompressionNone)
    val uuid = java.util.UUID.nameUUIDFromBytes(SchemaJson.getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    out.write(bb.array())
    if (compress) {
      val d = new java.util.zip.Deflater()
      d.setInput(body); d.finish()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
    } else out.write(body)
    out.toByteArray
  }

  /** Test/generator-side encoder (the inverse wire format). */
  def encode(e: ClickEvent): Array[Byte] = {
    val schema = new Schema.Parser().parse(SchemaJson)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("ip", e.ip)
    rec.put("eventtimestamp", e.eventtimestamp)
    rec.put("devicetype", e.devicetype)
    rec.put("event_type", e.event_type)
    rec.put("product_type", e.product_type)
    rec.put("userid", e.userid)
    rec.put("globalseq", e.globalseq)
    rec.put("prevglobalseq", e.prevglobalseq)
    val out = new java.io.ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, encoder)
    encoder.flush()
    out.toByteArray
  }
}
