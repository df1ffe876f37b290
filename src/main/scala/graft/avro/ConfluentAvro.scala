package graft.avro

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import scala.jdk.CollectionConverters._

/** Confluent wire format + Avro binary codec (SURVEY.md §1.2).
  *
  * Wire format: magic byte 0x00, 4-byte big-endian schema id, Avro binary
  * payload. Spark's from_avro does NOT strip this header — the reference's
  * serializers do it via confluent-kafka; here it is an explicit frame
  *.
  * The Avro type surface implemented covers everything the reference's own
  * schemas exercise (string/int/long/float/double/boolean/bytes,
  * map<string,_>, array, nullable unions, nested records, field defaults,
  * space-bearing field names — reference: FIXTURES.md §2;
  * tests/temp_integration/integration.py:17-23).
  */
object ConfluentAvro {

  val Magic: Byte = 0x00

  final case class Framed(schemaId: Int, payload: Array[Byte])

  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(5 + payload.length)
    buf.put(Magic).putInt(schemaId).put(payload)
    buf.array()
  }

  def unframe(bytes: Array[Byte]): Framed = {
    require(bytes.length >= 5 && bytes(0) == Magic,
      s"not Confluent wire format (len=${bytes.length})")
    val buf = ByteBuffer.wrap(bytes, 1, 4)
    Framed(buf.getInt, java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
  }

  // ---- binary <-> GenericRecord --------------------------------------

  def decode(payload: Array[Byte], schema: Schema): AnyRef = {
    val reader = new GenericDatumReader[AnyRef](schema)
    val dec = DecoderFactory.get().binaryDecoder(payload, null)
    reader.read(null, dec)
  }

  def encode(datum: AnyRef, schema: Schema): Array[Byte] = {
    val writer = new GenericDatumWriter[AnyRef](schema)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(datum, enc)
    enc.flush()
    out.toByteArray
  }

  /** Serialize a value the Confluent way: register (or reuse) the schema id
    * for `subject`, then frame the Avro binary with it — the producer path
    * (reference: fluvii/components/producer/producer.py:136-140). */
  def serialize(datum: AnyRef, schema: Schema, subject: String,
      registry: SchemaRegistryClient): Array[Byte] =
    frame(registry.register(subject, schema), encode(datum, schema))

  /** Deserialize a Confluent-framed value, resolving the schema by id —
    * the consumer path (reference: fluvii/components/consumer/consumer.py:57-58). */
  def deserialize(bytes: Array[Byte], registry: SchemaRegistryClient): AnyRef = {
    val f = unframe(bytes)
    val schema = registry.getById(f.schemaId)
      .getOrElse(throw new IllegalArgumentException(s"unknown schema id ${f.schemaId}"))
    decode(f.payload, schema)
  }

  // ---- GenericRecord <-> JSON (the engine's envelope value form) -------

  /** Avro datum → JSON string, for the schema-free Message.value payload.
    * Deterministic field order (schema order). */
  def toJson(datum: AnyRef): String = datum match {
    case null           => "null"
    case r: GenericRecord =>
      r.getSchema.getFields.asScala
        .map(f => quote(f.name) + ":" + toJson(r.get(f.name())))
        .mkString("{", ",", "}")
    case m: java.util.Map[_, _] =>
      m.asScala.toSeq.map { case (k, v) => quote(k.toString) + ":" + toJson(v.asInstanceOf[AnyRef]) }
        .sortBy(identity).mkString("{", ",", "}")
    case a: java.util.Collection[_] =>
      a.asScala.map(v => toJson(v.asInstanceOf[AnyRef])).mkString("[", ",", "]")
    case s: Utf8        => quote(s.toString)
    case s: String      => quote(s)
    case b: java.lang.Boolean => b.toString
    case b: ByteBuffer  =>
      quote(java.util.Base64.getEncoder.encodeToString(b.array()))
    case n              => n.toString
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Build a GenericRecord from a Scala map (tests / producers). */
  def record(schema: Schema, fields: Map[String, Any]): GenericRecord = {
    val r = new GenericData.Record(schema)
    fields.foreach { case (k, v) => r.put(k, toAvro(v, schema.getField(k).schema())) }
    r
  }

  private def toAvro(v: Any, schema: Schema): AnyRef = v match {
    case m: Map[_, _] if schema.getType == Schema.Type.MAP =>
      m.map { case (k, x) => k.toString -> toAvro(x, schema.getValueType) }.asJava
    case s: Seq[_] if schema.getType == Schema.Type.ARRAY =>
      s.map(toAvro(_, schema.getElementType)).asJava
    case other => other.asInstanceOf[AnyRef]
  }
}
