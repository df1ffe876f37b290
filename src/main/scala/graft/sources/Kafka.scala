package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.avro.{AvroDecode, AvroEncode, AvroSchemaConverter, SchemaRegistryClient}
import graft.core.{Configs, Message}

/** Kafka source/sink construction (SURVEY.md §2.1/§2.2).
  *
  * The environment has no Kafka broker or connector jar, so everything here
  * is expressed as (a) pure option-map builders — unit-testable, and exactly
  * what `spark.readStream.format("kafka").options(...)` consumes on a real
  * cluster — and (b) envelope projections over the standard Kafka source
  * schema (key/value binary, topic, partition, offset, timestamp, headers),
  * which work identically on any DataFrame with that shape (tests feed them
  * from literals/MemoryStream).
  */
object Kafka {

  /** The Kafka source's fixed output schema, as documented by Spark. */
  val SourceSchema = "key BINARY, value BINARY, topic STRING, partition INT, " +
    "offset BIGINT, timestamp TIMESTAMP, timestampType INT, " +
    "headers ARRAY<STRUCT<key: STRING, value: BINARY>>"

  /** S1 — streaming subscribe-consume options
    * (reference: fluvii/components/consumer/consumer.py:49-62,112-119). */
  def subscribeOptions(
      topics: Seq[String],
      bootstrap: String,
      groupId: String,
      consumer: Configs.ConsumerConfig = Configs.ConsumerConfig()): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topics.mkString(","),
      "kafka.group.id" -> groupId,
      "startingOffsets" -> (if (consumer.autoOffsetReset == "earliest") "earliest" else "latest"),
      "includeHeaders" -> "true",
      // S2 — transaction batching becomes microbatch bounds. Spark's
      // maxOffsetsPerTrigger is a TOTAL per-microbatch cap distributed
      // proportionally across all topic-partitions; count*topics is an
      // approximate total standing in for the reference's per-transaction
      // bound (batch_consume_max_count=100). Sizing it exactly would need
      // partition counts from the AdminClient (minPartitions-style).
      "maxOffsetsPerTrigger" -> (consumer.batchConsumeMaxCount * topics.size).toString,
      // EOS reads: only committed transactional messages
      // (reference: fluvii/apps/transactions/consumer.py:109-116)
      "kafka.isolation.level" -> "read_committed",
      "failOnDataLoss" -> "false") ++ consumer.asSparkOptions

  /** S3 — bounded offset-range dump options from the reference's
    * consume_topics_dict shape {"topic": {0: 100, 2: "earliest"}}
    * (reference: fluvii/kafka_tools/topic_dumper.py:10-97). */
  def offsetRangeOptions(
      bootstrap: String,
      consumeTopicsDict: Map[String, Map[Int, Any]]): Map[String, String] = {
    val starting = consumeTopicsDict.map { case (t, parts) =>
      val inner = parts.toSeq.sortBy(_._1).map {
        case (p, "earliest") => s""""$p": -2"""
        case (p, "latest")   => s""""$p": -1"""
        case (p, off)        => s""""$p": $off"""
      }.mkString(", ")
      s""""$t": {$inner}"""
    }.mkString("{", ", ", "}")
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "startingOffsets" -> starting,
      "endingOffsets" -> "latest")
  }

  /** Kafka-source rows → canonical envelope. Key is a Confluent-framed Avro
    * string when `framedKey` (the reference hardcodes key schema
    * {"type":"string"} — producer.py:62); value decodes with the topic's
    * declared schema and is carried as JSON. */
  def toEnvelope(
      kafkaRows: DataFrame,
      valueSchemaJson: String,
      framedKey: Boolean = true): Dataset[Message] = {
    val s = kafkaRows.sparkSession
    import s.implicits._
    val keyCol =
      if (framedKey) AvroDecode.decodeConfluent(col("key"), "\"string\"")
      else col("key").cast("string")
    kafkaRows.select(
      keyCol.as("key"),
      to_json(AvroDecode.decodeConfluent(col("value"), valueSchemaJson)).as("value"),
      headersToMap(col("headers")).as("headers"),
      col("topic"),
      col("partition"),
      col("offset"),
      col("timestamp"))
      .as[Message]
  }

  /** headers array<struct<key,value:binary>> → map<string,string>, bytes
    * UTF-8 decoded, null values dropped (reference: general_utils.py:4-15). */
  def headersToMap(headers: Column): Column =
    map_from_entries(
      transform(
        filter(coalesce(headers, array()), h => h.getField("value").isNotNull),
        h => struct(h.getField("key"), h.getField("value").cast("string"))))

  /** K1/K4 — envelope → Kafka sink columns the Confluent way: the JSON
    * value is parsed back to a struct of the topic's declared Avro schema
    * and encoded as Confluent-framed Avro; the key is framed with the
    * reference's hardcoded {"type":"string"} key schema (producer.py:62).
    * Schema ids come from registering `{topic}-key`/`{topic}-value`
    * subjects at plan-build time, mirroring the producer's topic→serializer
    * map (producer.py:136-140). Round-trips through [[toEnvelope]] with its
    * `framedKey=true` default. */
  def toSinkColumns(
      messages: Dataset[Message],
      valueSchemaJson: String,
      registry: SchemaRegistryClient,
      topic: String): DataFrame = {
    val valueSchema = SchemaRegistryClient.parse(valueSchemaJson)
    val keySchemaJson = "\"string\""
    val valueId = registry.register(s"$topic-value", valueSchema)
    val keyId = registry.register(s"$topic-key", SchemaRegistryClient.parse(keySchemaJson))
    // Record schemas: envelope JSON -> struct -> Avro. Bare-type schemas
    // (e.g. the changelog's {"type":"string"}) encode the raw value string —
    // the registry monkey-patch parity case (schema_registry.py:6-15).
    // FAILFAST: in default PERMISSIVE mode a malformed value (possible on
    // the K6 bulk-produce path, where the JSON dump is user-supplied) would
    // silently become a null struct and then a null Kafka value — a
    // tombstone that can DELETE records on a compacted topic. Fail loudly.
    val parsedValue = AvroSchemaConverter.toSqlType(valueSchema) match {
      case st: StructType => from_json(col("value"), st, Map("mode" -> "FAILFAST"))
      case _              => col("value")
    }
    messages.toDF()
      .select(
        AvroEncode.encodeConfluent(col("key"), keySchemaJson, keyId).as("key"),
        AvroEncode.encodeConfluent(parsedValue, valueSchemaJson, valueId).as("value"),
        col("topic"),
        col("partition"),
        sinkHeaders)
  }

  /** Raw (unframed) sink columns: key/value as plain UTF-8 bytes. This is
    * the JSON-passthrough path (K6 bulk produce of a JSON dump) — a
    * reference consumer expecting Confluent framing needs [[toSinkColumns]]
    * instead. */
  def toSinkColumnsRaw(messages: Dataset[Message]): DataFrame =
    messages.toDF()
      .select(
        col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        col("topic"),
        col("partition"),
        sinkHeaders)

  private def sinkHeaders: Column =
    transform(map_entries(col("headers")),
      e => struct(e.getField("key").as("key"),
        e.getField("value").cast("binary").as("value"))).as("headers")

  /** K5 — JSON file dump of consumed messages
    * (reference: fluvii/cli/commands/topics.py:85-97). */
  def dumpJson(messages: Dataset[Message], path: String): Unit =
    messages.toDF().write.mode("overwrite").json(path)

  /** K6 — bulk produce from a JSON dump (reference:
    * fluvii/kafka_tools/fluvii_toolbox.py:209-229): read back and hand to
    * the Kafka sink via [[toSinkColumns]] (framed Avro) or
    * [[toSinkColumnsRaw]] (JSON passthrough). */
  def readJsonDump(s: SparkSession, path: String): Dataset[Message] = {
    import s.implicits._
    s.read.schema(
      "key STRING, value STRING, headers MAP<STRING,STRING>, topic STRING, " +
      "partition INT, offset BIGINT, timestamp TIMESTAMP").json(path).as[Message]
  }
}
