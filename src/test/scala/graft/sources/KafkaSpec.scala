package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession.spark
import graft.avro.{ConfluentAvro, InMemorySchemaRegistry, SchemaRegistryClient}
import graft.core.Configs

class KafkaSpec extends AnyFunSuite {

  test("subscribe options compile consumer config to kafka.-prefixed settings") {
    val opts = Kafka.subscribeOptions(Seq("in1", "in2"), "broker:9092", "my_app")
    assert(opts("subscribe") == "in1,in2")
    assert(opts("kafka.isolation.level") == "read_committed")
    assert(opts("kafka.fetch.max.bytes") == "5242880")
    assert(opts("maxOffsetsPerTrigger") == "200")
    assert(opts("startingOffsets") == "latest")
    val earliest = Kafka.subscribeOptions(Seq("t"), "b", "g",
      Configs.ConsumerConfig(autoOffsetReset = "earliest"))
    assert(earliest("startingOffsets") == "earliest")
  }

  test("offset-range options encode the reference's consume_topics_dict") {
    val opts = Kafka.offsetRangeOptions("b:9092",
      Map("t" -> Map(0 -> 100, 2 -> "earliest", 1 -> "latest")))
    assert(opts("startingOffsets") == """{"t": {"0": 100, "1": -1, "2": -2}}""")
    assert(opts("endingOffsets") == "latest")
  }

  test("kafka rows -> envelope: avro decode, header map, null-value drop") {
    val reg = new InMemorySchemaRegistry
    val schema = SchemaRegistryClient.parse(
      """{"name":"V","type":"record","fields":[{"name":"x","type":"int"}]}""")
    val keySchema = SchemaRegistryClient.parse("\"string\"")
    def framedKey(k: String) = ConfluentAvro.serialize(k, keySchema, "t-key", reg)
    def framedVal(x: Int) = ConfluentAvro.serialize(
      ConfluentAvro.record(schema, Map("x" -> x)), schema, "t-value", reg)

    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType),
      StructField("headers", ArrayType(StructType(Seq(
        StructField("key", StringType), StructField("value", BinaryType)))))))

    val rows = java.util.Arrays.asList(
      Row(framedKey("k1"), framedVal(7), "t", 0, 5L,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 0,
        Seq(Row("h1", "v1".getBytes), Row("dropme", null))))
    val df = spark.createDataFrame(rows, kafkaSchema)

    val env = Kafka.toEnvelope(df, schema.toString).collect()(0)
    assert(env.key == "k1")
    assert(env.value == """{"x":7}""")
    assert(env.headers == Map("h1" -> "v1"))
    assert(env.topic == "t" && env.partition == 0 && env.offset == 5L)
  }

  test("sink columns carry explicit partition + binary key/value/headers (raw)") {
    import spark.implicits._
    val msgs = Seq(graft.core.Message("k", "v", Map("guid" -> "g"), "out", 3, -1,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))).toDS()
    val sink = Kafka.toSinkColumnsRaw(msgs)
    assert(sink.columns.toSet == Set("key", "value", "topic", "partition", "headers"))
    val r = sink.collect()(0)
    assert(new String(r.getAs[Array[Byte]]("key")) == "k")
    assert(r.getAs[Int]("partition") == 3)
  }

  test("framed sink columns round-trip through toEnvelope (K1 Confluent parity)") {
    import spark.implicits._
    val valueSchema =
      """{"name":"V","type":"record","fields":[
        {"name":"x","type":"int"},{"name":"s","type":"string"}]}"""
    val reg = new InMemorySchemaRegistry
    val msgs = Seq(
      graft.core.Message("k1", """{"x":7,"s":"a"}""", Map("guid" -> "g1"), "out", 3, -1,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      graft.core.Message("k2", """{"x":-1,"s":"b"}""", Map("guid" -> "g2"), "out", 1, -1,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:01"))).toDS()
    val sink = Kafka.toSinkColumns(msgs, valueSchema, reg, "out")
    // both key and value are Confluent-framed (magic byte + schema id)
    val rows = sink.collect()
    rows.foreach { r =>
      val key = ConfluentAvro.unframe(r.getAs[Array[Byte]]("key"))
      val value = ConfluentAvro.unframe(r.getAs[Array[Byte]]("value"))
      assert(reg.getById(key.schemaId).exists(_.getType.getName == "string"))
      assert(reg.getById(value.schemaId).exists(_.getName == "V"))
    }
    // a consumer running toEnvelope (framedKey default) recovers the envelope
    val back = Kafka.toEnvelope(
      sink.withColumn("offset", lit(0L))
        .withColumn("timestamp", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .withColumn("timestampType", lit(0)),
      valueSchema).collect().sortBy(_.key)
    assert(back.map(_.key).toSeq == Seq("k1", "k2"))
    assert(back.map(_.value).toSeq == Seq("""{"x":7,"s":"a"}""", """{"x":-1,"s":"b"}"""))
    assert(back(0).headers == Map("guid" -> "g1"))
  }

  test("malformed envelope JSON fails loudly instead of producing a tombstone") {
    import spark.implicits._
    val valueSchema =
      """{"name":"V","type":"record","fields":[{"name":"x","type":"int"}]}"""
    val reg = new InMemorySchemaRegistry
    // a user-supplied K6 dump with a broken value: PERMISSIVE parsing would
    // turn this into a null struct -> null Kafka value -> a DELETE on a
    // compacted topic; FAILFAST must surface it as an error instead
    val msgs = Seq(graft.core.Message("k", """{"x": <garbage>""", Map(), "out", 0, -1,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))).toDS()
    val ex = intercept[Exception] {
      Kafka.toSinkColumns(msgs, valueSchema, reg, "out").collect()
    }
    def msgs0(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs0(e.getCause))
    assert(msgs0(ex).exists(m =>
      m.contains("MALFORMED_RECORD") || m.toLowerCase.contains("malformed")),
      s"unexpected error: $ex")
  }

  test("json dump/read roundtrip (K5/K6)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dump").toString
    val msgs = Seq(
      graft.core.Message("k1", """{"a":1}""", Map("guid" -> "g1"), "t", 0, 0,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      graft.core.Message("k2", """{"a":2}""", Map("guid" -> "g2"), "t", 1, 1,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:01"))).toDS()
    Kafka.dumpJson(msgs, dir)
    val back = Kafka.readJsonDump(spark, dir).collect().sortBy(_.key)
    assert(back.toSeq == msgs.collect().toSeq.sortBy(_.key))
  }
}
