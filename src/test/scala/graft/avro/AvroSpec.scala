package graft.avro

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

/** Confluent wire format + Avro codec over the reference's own fixture
  * schemas (FIXTURES.md §2; reference: tests/temp_integration/
  * integration.py:17-23, examples/fluvii_demo_current_2023). */
class AvroSpec extends AnyFunSuite {

  val coolSchema =
    """{"name":"CoolSchema","type":"record","fields":[
      {"name":"my_data_dict","type":{"type":"map","values":"string"},"default":{}}]}"""

  val balanceSchema =
    """{"name":"AccountBalanceChangeRequest","type":"record","fields":[
      {"name":"account_id","type":"string","default":""},
      {"name":"timestamp","type":"float","default":0},
      {"name":"amount","type":"int","default":0}]}"""

  // space-bearing field names (README AccountPurchase fixture)
  val purchaseSchema =
    """{"name":"AccountPurchase","type":"record","fields":[
      {"name":"Account Number","type":"string","default":""},
      {"name":"Purchase Amount","type":"string","default":""}]}"""

  test("wire format: frame/unframe roundtrip, magic byte enforced") {
    val payload = Array[Byte](1, 2, 3, 4, 5)
    val framed = ConfluentAvro.frame(42, payload)
    assert(framed(0) == 0x00)
    assert(framed.length == 10)
    val f = ConfluentAvro.unframe(framed)
    assert(f.schemaId == 42 && f.payload.toSeq == payload.toSeq)
    intercept[IllegalArgumentException] {
      ConfluentAvro.unframe(Array[Byte](1, 0, 0, 0, 1, 9))
    }
  }

  test("serialize/deserialize via registry (ids allocated per subject+schema)") {
    val reg = new InMemorySchemaRegistry
    val schema = SchemaRegistryClient.parse(balanceSchema)
    val rec = ConfluentAvro.record(schema,
      Map("account_id" -> "A7", "timestamp" -> 1.5f, "amount" -> -250))
    val bytes = ConfluentAvro.serialize(rec, schema, "topic-value", reg)
    val back = ConfluentAvro.deserialize(bytes, reg)
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(back.get("account_id").toString == "A7")
    assert(back.get("amount") == -250)
    // same schema re-registers to the same id
    assert(ConfluentAvro.serialize(rec, schema, "topic-value", reg)(4) == bytes(4))
  }

  test("bare-type schemas load (changelog value schema is plain string)") {
    // reference quirk: schema_registry.py:6-15 / fluvii_table_app.py:43
    val schema = SchemaRegistryClient.parse("{\"type\":\"string\"}")
    val bytes = ConfluentAvro.encode("{\"balance\": 12.5}", schema)
    assert(ConfluentAvro.decode(bytes, schema).toString == "{\"balance\": 12.5}")
    assert(SchemaRegistryClient.parse("\"string\"").getType.getName == "string")
  }

  test("map-typed record roundtrips (integration CoolSchema)") {
    val schema = SchemaRegistryClient.parse(coolSchema)
    val rec = ConfluentAvro.record(schema,
      Map("my_data_dict" -> Map("test--key_0-p0" -> "test--key_0-p0-r0")))
    val back = ConfluentAvro.decode(ConfluentAvro.encode(rec, schema), schema)
    val json = ConfluentAvro.toJson(back)
    assert(json == """{"my_data_dict":{"test--key_0-p0":"test--key_0-p0-r0"}}""")
  }

  test("AvroDecode expression: framed binary column -> struct column") {
    import spark.implicits._
    val reg = new InMemorySchemaRegistry
    val schema = SchemaRegistryClient.parse(balanceSchema)
    val rows = (1 to 5).map { i =>
      val rec = ConfluentAvro.record(schema,
        Map("account_id" -> s"A$i", "timestamp" -> i.toFloat, "amount" -> i * 100))
      ConfluentAvro.serialize(rec, schema, "t-value", reg)
    }
    val df = rows.toDF("value")
      .select(AvroDecode.decodeConfluent(col("value"), balanceSchema).as("v"))
      .select("v.account_id", "v.amount")
    val got = df.collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == (1 to 5).map(i => (s"A$i", i * 100)).toSet)
  }

  test("AvroEncode -> AvroDecode roundtrips through columns (K1 produce)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("A9", 1.25f, 500), ("A10", -3.5f, -20))
      .toDF("account_id", "timestamp", "amount")
      .select(AvroEncode.encodeConfluent(
        struct(col("account_id"), col("timestamp"), col("amount")), balanceSchema, 17).as("value"))
      .select(AvroDecode.decodeConfluent(col("value"), balanceSchema).as("v"))
      .select("v.account_id", "v.timestamp", "v.amount")
    val got = df.collect().map(r => (r.getString(0), r.getFloat(1), r.getInt(2))).toSet
    assert(got == Set(("A9", 1.25f, 500), ("A10", -3.5f, -20)))
    // and the raw bytes carry the declared schema id in the frame
    val raw = Seq(("A1", 0f, 1)).toDF("account_id", "timestamp", "amount")
      .select(AvroEncode.encodeConfluent(
        struct(col("account_id"), col("timestamp"), col("amount")), balanceSchema, 17).as("value"))
      .as[Array[Byte]].head()
    assert(ConfluentAvro.unframe(raw).schemaId == 17)
  }

  test("AvroEncode handles enum and fixed; rejects reordered structs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val schema =
      """{"name":"E","type":"record","fields":[
        {"name":"color","type":{"type":"enum","name":"Color","symbols":["RED","BLUE"]}},
        {"name":"digest","type":{"type":"fixed","name":"D8","size":4}}]}"""
    val enc = Seq(("RED", Array[Byte](1, 2, 3, 4))).toDF("color", "digest")
      .select(AvroEncode.encodeConfluent(
        struct(col("color"), col("digest")), schema, 3).as("value"))
      .select(AvroDecode.decodeConfluent(col("value"), schema).as("v"))
      .select("v.color", "v.digest")
      .collect()(0)
    assert(enc.getString(0) == "RED")
    assert(enc.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3, 4))

    // struct fields in the wrong order must be rejected, not corrupted
    val ex = intercept[Exception] {
      Seq(("RED", Array[Byte](1, 2, 3, 4))).toDF("color", "digest")
        .select(AvroEncode.encodeConfluent(
          struct(col("digest"), col("color")), schema, 3).as("value"))
        .collect()
    }
    assert(ex.getMessage.contains("do not match schema fields") ||
      Option(ex.getCause).exists(_.getMessage.contains("do not match schema fields")),
      s"unexpected error: $ex")
  }

  test("AvroEncode rejects reordered NESTED structs (name/order checked recursively)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // inner record with two same-type fields: a reorder is type-compatible
    // and would silently swap values if only arity were checked
    val schema =
      """{"name":"Outer","type":"record","fields":[
        {"name":"id","type":"string"},
        {"name":"inner","type":{"name":"Inner","type":"record","fields":[
          {"name":"lo","type":"int"},{"name":"hi","type":"int"}]}}]}"""
    val ok = Seq(("a", 1, 9)).toDF("id", "lo", "hi")
      .select(AvroEncode.encodeConfluent(
        struct(col("id"), struct(col("lo"), col("hi")).as("inner")), schema, 5).as("value"))
      .select(AvroDecode.decodeConfluent(col("value"), schema).as("v"))
      .select("v.inner.lo", "v.inner.hi").collect()(0)
    assert(ok.getInt(0) == 1 && ok.getInt(1) == 9)

    val ex = intercept[Exception] {
      Seq(("a", 1, 9)).toDF("id", "lo", "hi")
        .select(AvroEncode.encodeConfluent(
          struct(col("id"), struct(col("hi"), col("lo")).as("inner")), schema, 5).as("value"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(m => m.contains("$.inner") && m.contains("do not match")),
      s"unexpected error: $ex")
  }

  test("AvroEncode rejects array/map schema vs non-matching catalyst type at plan time") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val arraySchema =
      """{"name":"A","type":"record","fields":[
        {"name":"xs","type":{"type":"array","items":"int"}}]}"""
    val exA = intercept[Exception] {
      Seq(("notAnArray")).toDF("xs")
        .select(AvroEncode.encodeConfluent(struct(col("xs")), arraySchema, 1).as("v"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(exA).exists(m => m.contains("array schema requires an array input")),
      s"unexpected error: $exA")

    val mapSchema =
      """{"name":"M","type":"record","fields":[
        {"name":"kv","type":{"type":"map","values":"long"}}]}"""
    val exM = intercept[Exception] {
      Seq((7L)).toDF("kv")
        .select(AvroEncode.encodeConfluent(struct(col("kv")), mapSchema, 2).as("v"))
        .collect()
    }
    assert(msgs(exM).exists(m => m.contains("map schema requires a map input")),
      s"unexpected error: $exM")
  }

  test("space-bearing field names survive decode and JSON") {
    val schema = SchemaRegistryClient.parse(purchaseSchema)
    val rec = ConfluentAvro.record(schema,
      Map("Account Number" -> "123", "Purchase Amount" -> "$19.99"))
    val back = ConfluentAvro.decode(ConfluentAvro.encode(rec, schema), schema)
    assert(ConfluentAvro.toJson(back) ==
      """{"Account Number":"123","Purchase Amount":"$19.99"}""")
    import spark.implicits._
    val df = Seq(ConfluentAvro.encode(rec, schema)).toDF("value")
      .select(AvroDecode.decodeRaw(col("value"), purchaseSchema).as("v"))
    assert(df.select(col("v").getField("Account Number")).as[String].head() == "123")
  }

  test("schema resolution: inline JSON, file path, and dotted library path agree") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_schemas")
    Files.createDirectories(root.resolve("billing/events"))
    val direct = root.resolve("balance.avsc")
    Files.writeString(direct, balanceSchema)
    Files.writeString(root.resolve("billing/events/balance_change.json"), balanceSchema)

    val inline = SchemaResolver.resolve(balanceSchema)
    // 1. direct file path (producer.py:117-121)
    assert(SchemaResolver.resolve(direct.toString) == inline)
    // 2. file path under schema_library_root (producer.py:123-127)
    assert(SchemaResolver.resolve("balance.avsc", Some(root.toString)) == inline)
    // 3. dotted library path (producer.py:128-131 module import analog)
    assert(SchemaResolver.resolve("billing.events.balance_change", Some(root.toString)) == inline)
    // 4. fall-through: a .json-looking spec that is no file parses as inline
    //    only if it IS json — mirror of the reference's final json.loads
    assert(SchemaResolver.resolve("\"string\"").getType == org.apache.avro.Schema.Type.STRING)
    intercept[Exception](SchemaResolver.resolve("no.such.path", Some(root.toString)))
  }
}
