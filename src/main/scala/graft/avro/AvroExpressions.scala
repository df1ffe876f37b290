package graft.avro

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Catalyst-side Avro decode for Confluent-framed binary columns.
  *
  * from_avro is unavailable without the external spark-avro module and in
  * any case does not strip the Confluent 5-byte header; this expression
  * does both in one step: binary → (strip frame) → Avro binary decode →
  * Catalyst struct. The declared reader schema is fixed at plan time (one
  * schema per topic — the reference's operational assumption, README
  * "Operational Assumptions"), so the output type is static and Catalyst
  * can prune through it.
  */
object AvroSchemaConverter {

  /** Avro schema → Catalyst type (the subset the reference exercises,
    * plus arrays/nested records/nullable unions). */
  def toSqlType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.STRING  => StringType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ENUM    => StringType
    case Schema.Type.FIXED   => BinaryType
    case Schema.Type.MAP     => MapType(StringType, toSqlType(schema.getValueType))
    case Schema.Type.ARRAY   => ArrayType(toSqlType(schema.getElementType))
    case Schema.Type.RECORD  =>
      StructType(schema.getFields.asScala.map { f =>
        StructField(f.name(), toSqlType(f.schema()), nullable = isNullable(f.schema()))
      }.toArray)
    case Schema.Type.UNION   =>
      val nonNull = schema.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only nullable unions supported: $schema")
      toSqlType(nonNull.head)
    case Schema.Type.NULL    => NullType
  }

  def isNullable(schema: Schema): Boolean =
    schema.getType == Schema.Type.UNION &&
      schema.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def nonNullOf(schema: Schema): Schema =
    if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else schema

  /** Avro datum → Catalyst value. */
  def toCatalyst(datum: AnyRef, schema: Schema): Any = {
    if (datum == null) return null
    nonNullOf(schema).getType match {
      case Schema.Type.STRING | Schema.Type.ENUM =>
        UTF8String.fromString(datum.toString)
      case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
           Schema.Type.DOUBLE | Schema.Type.BOOLEAN => datum
      case Schema.Type.BYTES =>
        datum.asInstanceOf[java.nio.ByteBuffer].array().clone()
      case Schema.Type.FIXED =>
        datum.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
      case Schema.Type.MAP =>
        val s = nonNullOf(schema)
        val m = datum.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
        val keys = m.keys.map(k => UTF8String.fromString(k.toString)).toArray[Any]
        val vals = m.values.map(v => toCatalyst(v, s.getValueType)).toArray[Any]
        ArrayBasedMapData(keys, vals)
      case Schema.Type.ARRAY =>
        val s = nonNullOf(schema)
        val arr = datum.asInstanceOf[java.util.Collection[AnyRef]].asScala
        new GenericArrayData(arr.map(toCatalyst(_, s.getElementType)).toArray[Any])
      case Schema.Type.RECORD =>
        val s = nonNullOf(schema)
        val rec = datum.asInstanceOf[GenericRecord]
        InternalRow.fromSeq(
          s.getFields.asScala.map(f => toCatalyst(rec.get(f.name()), f.schema())).toSeq)
      case Schema.Type.NULL => null
      case other => throw new UnsupportedOperationException(s"avro type $other")
    }
  }
}

/** decode_confluent_avro(value: binary) with a fixed reader schema.
  * Set framed=false for raw (unframed) Avro binary. */
case class AvroDecode(child: Expression, schemaJson: String, framed: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema: Schema = SchemaRegistryClient.parse(schemaJson)
  @transient private lazy val sqlType: DataType = AvroSchemaConverter.toSqlType(schema)

  override def dataType: DataType = sqlType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val payload = if (framed) ConfluentAvro.unframe(bytes).payload else bytes
    AvroSchemaConverter.toCatalyst(ConfluentAvro.decode(payload, schema), schema)
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}

object AvroDecode {
  def decodeConfluent(value: Column, schemaJson: String): Column =
    GraftBridge.toColumn(AvroDecode(GraftBridge.toExpression(value), schemaJson))

  def decodeRaw(value: Column, schemaJson: String): Column =
    GraftBridge.toColumn(AvroDecode(GraftBridge.toExpression(value), schemaJson, framed = false))
}

/** encode_confluent_avro(struct) — the produce-side twin of [[AvroDecode]]:
  * Catalyst struct → Avro binary, framed with a fixed schema id (the id a
  * registry assigned at plan-build time, mirroring the reference's
  * topic→serializer map, producer.py:136-140). */
case class AvroEncode(child: Expression, schemaJson: String, schemaId: Int,
    framed: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema: Schema = SchemaRegistryClient.parse(schemaJson)

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def nullSafeEval(input: Any): Any = {
    val datum = fromCatalyst(input, schema)
    val payload = ConfluentAvro.encode(datum, schema)
    if (framed) ConfluentAvro.frame(schemaId, payload) else payload
  }

  private def fromCatalyst(v: Any, s: Schema): AnyRef = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        fromCatalyst(v, nonNull)
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
           Schema.Type.DOUBLE | Schema.Type.BOOLEAN => v.asInstanceOf[AnyRef]
      case Schema.Type.BYTES =>
        java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.MAP =>
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val out = new java.util.HashMap[String, AnyRef](m.numElements())
        val keys = m.keyArray(); val vals = m.valueArray()
        (0 until m.numElements()).foreach { i =>
          out.put(keys.getUTF8String(i).toString,
            fromCatalyst(vals.get(i, AvroSchemaConverter.toSqlType(s.getValueType)), s.getValueType))
        }
        out
      case Schema.Type.ARRAY =>
        val a = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[AnyRef](a.numElements())
        (0 until a.numElements()).foreach { i =>
          out.add(fromCatalyst(a.get(i, AvroSchemaConverter.toSqlType(s.getElementType)), s.getElementType))
        }
        out
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[InternalRow]
        val rec = new org.apache.avro.generic.GenericData.Record(s)
        s.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          val sqlT = AvroSchemaConverter.toSqlType(f.schema())
          rec.put(f.name(),
            if (row.isNullAt(i)) null else fromCatalyst(row.get(i, sqlT), f.schema()))
        }
        rec
      case other => throw new UnsupportedOperationException(s"avro type $other")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}

object AvroEncode {
  def encodeConfluent(value: Column, schemaJson: String, schemaId: Int): Column =
    GraftBridge.toColumn(AvroEncode(GraftBridge.toExpression(value), schemaJson, schemaId))
}
