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

  /** Decode a binary column of Avro-encoded ClickEvents into the typed
    * event Dataset. `raw` needs a `value: binary` column (the Kafka source
    * shape).
    */
  def decode(spark: SparkSession, raw: DataFrame, skipHeaderBytes: Int = 0): Dataset[ClickEvent] = {
    import spark.implicits._
    raw.select("value").as[Array[Byte]].mapPartitions { it =>
      // per-partition codec setup, reused across the batch
      val schema = new Schema.Parser().parse(SchemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var decoder: BinaryDecoder = null
      it.map { bytes =>
        decoder = DecoderFactory.get()
          .binaryDecoder(bytes, skipHeaderBytes, bytes.length - skipHeaderBytes, decoder)
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
