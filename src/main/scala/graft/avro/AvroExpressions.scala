package graft.avro

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

  private[avro] def nonNullOf(schema: Schema): Schema =
    if (schema.getType == Schema.Type.UNION) {
      val nonNull = schema.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only nullable unions supported: $schema")
      nonNull.head
    } else schema

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
  * Set framed=false for raw (unframed) Avro binary.
  *
  * Codegen: like the vector/hash expressions, the generated code calls
  * [[compute]] on a plan-time reference to this instance — the expression
  * participates in whole-stage codegen (no CodegenFallback interpreted
  * row path), and the per-row work is one virtual call into the same
  * decoder the interpreted path uses (CodegenParitySpec pins equality). */
case class AvroDecode(child: Expression, schemaJson: String, framed: Boolean = true)
    extends UnaryExpression {

  @transient private lazy val schema: Schema = SchemaRegistryClient.parse(schemaJson)
  @transient private lazy val sqlType: DataType = AvroSchemaConverter.toSqlType(schema)

  override def dataType: DataType = sqlType

  def compute(bytes: Array[Byte]): Any = {
    val payload = if (framed) ConfluentAvro.unframe(bytes).payload else bytes
    AvroSchemaConverter.toCatalyst(ConfluentAvro.decode(payload, schema), schema)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroDecode", this, classOf[AvroDecode].getName)
    val tpe = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .boxedType(dataType)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($tpe) $ref.compute($v);")
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
    extends UnaryExpression {

  @transient private lazy val schema: Schema = SchemaRegistryClient.parse(schemaJson)

  /** Per-schema-node Catalyst type, memoized — the schema is fixed at plan
    * time, so the recursive conversion runs once per node, not per row. */
  @transient private lazy val typeMemo =
    new java.util.IdentityHashMap[Schema, DataType]()
  private def sqlTypeOf(s: Schema): DataType = {
    val cached = typeMemo.get(s)
    if (cached != null) cached
    else { val t = AvroSchemaConverter.toSqlType(s); typeMemo.put(s, t); t }
  }

  /** Every struct in the input (root AND nested — records inside records,
    * arrays, maps) must match its record schema by name AND position:
    * positional InternalRow access cannot detect reordering at eval time,
    * so a same-arity reordered struct would silently encode values into
    * the wrong Avro fields. Rejected here with a clear message on first
    * evaluation instead. */
  @transient private lazy val validated: Boolean = {
    def check(rawSchema: Schema, t: DataType, path: String): Unit = {
      val s = AvroSchemaConverter.nonNullOf(rawSchema)
      (s.getType, t) match {
        case (Schema.Type.RECORD, st: StructType) =>
          val want = s.getFields.asScala.map(_.name()).toSeq
          val got = st.fields.map(_.name).toSeq
          require(got == want,
            s"AvroEncode at $path: struct fields $got do not match schema " +
              s"fields $want (same names in the same order required)")
          s.getFields.asScala.zip(st.fields).foreach { case (f, sf) =>
            check(f.schema(), sf.dataType, s"$path.${f.name()}")
          }
        case (Schema.Type.RECORD, other) =>
          throw new IllegalArgumentException(
            s"AvroEncode at $path: record schema requires a struct input, got $other")
        case (Schema.Type.ARRAY, ArrayType(et, _)) =>
          check(s.getElementType, et, s"$path[]")
        case (Schema.Type.MAP, MapType(_, vt, _)) =>
          check(s.getValueType, vt, s"$path{}")
        case (Schema.Type.ARRAY, other) =>
          throw new IllegalArgumentException(
            s"AvroEncode at $path: array schema requires an array input, got $other")
        case (Schema.Type.MAP, other) =>
          throw new IllegalArgumentException(
            s"AvroEncode at $path: map schema requires a map input, got $other")
        case _ => ()
      }
    }
    check(schema, child.dataType, "$")
    true
  }

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  def compute(input: Any): Array[Byte] = {
    require(validated)
    val datum = fromCatalyst(input, schema)
    val payload = ConfluentAvro.encode(datum, schema)
    if (framed) ConfluentAvro.frame(schemaId, payload) else payload
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroEncode", this, classOf[AvroEncode].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  private def fromCatalyst(v: Any, rawSchema: Schema): AnyRef = {
    if (v == null) return null
    val s = AvroSchemaConverter.nonNullOf(rawSchema)
    s.getType match {
      case Schema.Type.STRING => v.toString
      case Schema.Type.ENUM =>
        new org.apache.avro.generic.GenericData.EnumSymbol(s, v.toString)
      case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
           Schema.Type.DOUBLE | Schema.Type.BOOLEAN => v.asInstanceOf[AnyRef]
      case Schema.Type.BYTES =>
        java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.FIXED =>
        new org.apache.avro.generic.GenericData.Fixed(s, v.asInstanceOf[Array[Byte]])
      case Schema.Type.MAP =>
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val out = new java.util.HashMap[String, AnyRef](m.numElements())
        val keys = m.keyArray(); val vals = m.valueArray()
        val vt = sqlTypeOf(s.getValueType)
        (0 until m.numElements()).foreach { i =>
          out.put(keys.getUTF8String(i).toString,
            fromCatalyst(vals.get(i, vt), s.getValueType))
        }
        out
      case Schema.Type.ARRAY =>
        val a = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[AnyRef](a.numElements())
        val et = sqlTypeOf(s.getElementType)
        (0 until a.numElements()).foreach { i =>
          out.add(fromCatalyst(a.get(i, et), s.getElementType))
        }
        out
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[InternalRow]
        val rec = new org.apache.avro.generic.GenericData.Record(s)
        val fields = s.getFields
        require(row.numFields == fields.size(),
          s"AvroEncode: struct has ${row.numFields} fields, schema ${s.getName} has ${fields.size()}")
        var i = 0
        while (i < fields.size()) {
          val f = fields.get(i)
          rec.put(f.name(),
            if (row.isNullAt(i)) null
            else fromCatalyst(row.get(i, sqlTypeOf(f.schema())), f.schema()))
          i += 1
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
