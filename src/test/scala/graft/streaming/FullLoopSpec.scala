package graft.streaming

import java.sql.Timestamp
import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkTestSession.spark
import graft.avro.{ConfluentAvro, InMemorySchemaRegistry, SchemaRegistryClient}
import graft.core.Message
import graft.functions.Murmur3
import graft.sinks.{InMemoryTxBroker, KafkaTransaction, Transactions}
import graft.sources.Kafka
import graft.state.GraftTableApp

/** Full-loop integration parity: the reference's only end-to-end evidence
  * is tests/temp_integration/integration.py:85-121 — produce 3 unique keys
  * x 3 partitions of Confluent-framed Avro into an input topic, run the
  * table app (read entry → append iteration marker → update entry →
  * produce downstream on the same partition), then assert (1) the output
  * topic holds every record, (2) each partition's table holds exactly its
  * keys, (3) every table value carries exactly `repeats` changes.
  *
  * This spec chains the engine's equivalents over the in-memory
  * transactional broker double: S1 (wire-format rows → envelope decode) →
  * T1/ST1/ST2 (GraftTableApp keyed state) → K1 (Confluent-framed Avro sink
  * columns) → strict transactional produce (K2/X1), with Murmur3 (K4)
  * partition parity checked on the producer's default routing. */
class FullLoopSpec extends AnyFunSuite {
  import spark.implicits._

  private val SchemaJson =
    """{"name":"CoolSchema","type":"record","fields":[
      |{"name":"my_data_dict","type":{"type":"map","values":"string"},
      |"default":{}}]}""".stripMargin.replaceAll("\n", "")
  private val InTopic = "fluvii_testing_input"
  private val OutTopic = "fluvii_testing_output"
  private val Partitions = 3
  private val UniqueKeys = 3
  private val Repeats = 1

  private def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  /** integration.py:41-52 (get_data_set): key {k}-p{p}, value
    * {my_data_dict: {key_out: key_out-r{r}}}, explicit partition. */
  test("full loop: S1 consume -> T1 table app -> K1 avro produce, 3x3 partition parity") {
    val broker = new InMemoryTxBroker
    val reg = new InMemorySchemaRegistry
    val schema = SchemaRegistryClient.parse(SchemaJson)
    val keySchema = SchemaRegistryClient.parse("\"string\"")

    // ---- seed: 3 keys x 3 partitions of Confluent wire-format rows ----
    for {
      r <- 0 until Repeats
      p <- 0 until Partitions
      k <- 0 until UniqueKeys
    } {
      val keyOut = s"test--key_$k-p$p"
      val framedKey = ConfluentAvro.serialize(keyOut, keySchema, s"$InTopic-key", reg)
      val rec = ConfluentAvro.record(schema,
        Map("my_data_dict" -> Map(keyOut -> s"$keyOut-r$r")))
      val framedVal = ConfluentAvro.serialize(rec, schema, s"$InTopic-value", reg)
      broker.produceRaw(InTopic, p, b64(framedKey), b64(framedVal))
    }

    // ---- S1: broker poll -> kafka-source-shaped rows -> envelope ----
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType),
      StructField("headers", ArrayType(StructType(Seq(
        StructField("key", StringType), StructField("value", BinaryType)))))))
    val polled = broker.consumeCommitted("app-group", InTopic)
    val rows = polled.map(r => Row(unb64(r.key), unb64(r.value), r.topic,
      r.partition, r.offset, new Timestamp(1700000000000L), 0, null))
    val srcDf = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), kafkaSchema)
    val envelopes = Kafka.toEnvelope(srcDf, SchemaJson)

    // ---- T1/ST1/ST2: the reference's table_app_func (integration.py:55-67)
    // locals only: the state closure ships to executors and must not drag
    // the (unserializable) suite instance along
    val mapEntry = """"my_data_dict":\{"([^"]+)":"([^"]+)"\}""".r.unanchored
    val outTopic = OutTopic
    val nParts = Partitions
    val outs = GraftTableApp.transform(envelopes) { txn =>
      val old = txn.readTableEntry()
      val iterCount = old.map(_.split(",").length).getOrElse(0)
      val (k, v) = txn.message.value match {
        case mapEntry(k, v) => (k, v)
        case other =>
          throw new IllegalStateException(s"undecodable envelope value: $other")
      }
      val newVal = s"$v-t$iterCount"
      val newEntry = old.map(_ + "," + newVal).getOrElse(newVal)
      txn.updateTableEntry(newEntry)
      // Produce.message routes by Murmur3 (K4) when no partition given;
      // the reference pins partition=transaction.partition() — keep both:
      // record the murmur route for the parity check, emit the pinned one
      val routed = Produce.message(txn.message,
        s"""{"my_data_dict":{"$k":"$newVal"}}""", outTopic, nParts)
      val pinned = routed.copy(partition = txn.message.partition)
      Iterator((pinned, routed.partition, txn.message.partition,
        txn.message.key, newEntry))
    }.collect()

    // ---- K1 + K2/X1: framed avro sink columns, transactional produce ----
    val outMsgs = outs.map(_._1).toSeq.toDS()
    val sinkRows = Kafka.toSinkColumns(outMsgs, SchemaJson, reg, OutTopic)
      .collect()
    val producer = broker.producer("full-loop-app")
    producer.initTransactions()
    val txn = new KafkaTransaction(producer, "app-group")
    polled.foreach(r => txn.markConsumed(r.topic, r.partition, r.offset))
    sinkRows.foreach { r =>
      txn.produce(r.getAs[String]("topic"), r.getAs[Int]("partition"),
        b64(r.getAs[Array[Byte]]("key")), b64(r.getAs[Array[Byte]]("value")),
        Map.empty)
    }
    Transactions.commitWithRetries(txn, 3)

    // ---- assertion 1 (integration.py:100-104): nothing missing downstream,
    // and every value decodes to the expected -r{r}-t{iter} progression
    val produced = broker.readCommitted(OutTopic)
    assert(produced.size == UniqueKeys * Partitions * Repeats)
    val decoded = produced.map { r =>
      val key = ConfluentAvro.deserialize(unb64(r.key), reg).toString
      val rec = ConfluentAvro.deserialize(unb64(r.value), reg)
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      val m = rec.get("my_data_dict")
        .asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      (key, r.partition, m.size,
        m.values.iterator().next().toString)
    }
    decoded.foreach { case (key, _, mapSize, value) =>
      assert(mapSize == 1)
      assert(value == s"$key-r0-t0")
    }

    // partition parity: the app pinned output partition = input partition
    // (table_app_func's produce(partition=transaction.partition()))
    val byKey = decoded.map(d => (d._1, d._2)).toMap
    outs.foreach { case (_, _, inPart, key, _) =>
      assert(byKey(key) == inPart)
    }
    // Murmur3 parity (K4): the default route the producer WOULD take is
    // exactly the published-vector partitioner — same on every engine
    outs.foreach { case (_, routedPart, _, key, _) =>
      assert(routedPart == Murmur3.partition(key, Partitions))
    }

    // ---- assertions 2+3 (integration.py:105-115): per-partition table
    // state has exactly its keys, each with `repeats` recorded changes
    val stateByPartition = outs.groupBy(_._3)
      .view.mapValues(_.map(o => (o._4, o._5)).toMap).toMap
    (0 until Partitions).foreach { p =>
      val table = stateByPartition(p)
      assert(table.keySet ==
        (0 until UniqueKeys).map(k => s"test--key_${k}-p$p").toSet)
      table.values.foreach(v => assert(v.split(",").length == Repeats))
    }

    // consumption progress committed atomically with the produce
    (0 until Partitions).foreach { p =>
      assert(broker.committedOffset("app-group", InTopic, p)
        .contains(UniqueKeys.toLong))
    }
    // T4: every produced message carries an injected guid header
    assert(outs.forall(_._1.headers.contains(Message.GuidHeader)))
  }

  /** Round-13 (verdict item 6): the SAME full loop, but the strict-EOS
    * produce leg runs through [[graft.bindings.KafkaClientsTxProducer]] —
    * the reflective kafka-clients binding a production deployment uses —
    * driven by [[Transactions.writeBatchTransactional]] over the
    * kafka-clients-shaped doubles, with the post-commit replay filter
    * (via the fake Admin's group-offset read) and zombie fencing
    * exercised end-to-end (reference contract:
    * apps/transactions/consumer.py:94-107, producer.py:18-20). */
  test("full loop over the reflective binding: strict EOS + replay + fencing") {
    import graft.bindings.{KafkaClients, KafkaClientsTxProducer}
    import graft.bindings.fake.FakeCluster
    import graft.sinks.{Transactions, TxClientError, TxProducers}

    val fakeNs = KafkaClients.Namespace(
      producer = "graft.bindings.fake.FakeKafkaProducer",
      record = "graft.bindings.fake.FakeProducerRecord",
      topicPartition = "graft.bindings.fake.FakeTopicPartition",
      offsetAndMetadata = "graft.bindings.fake.FakeOffsetAndMetadata",
      groupMetadata = "graft.bindings.fake.FakeConsumerGroupMetadata",
      admin = "graft.bindings.fake.FakeAdmin")

    FakeCluster.reset()
    FakeCluster.knownSources = (0 until Partitions).map(p => (InTopic, p))
    val broker = FakeCluster.broker
    val reg = new InMemorySchemaRegistry
    val schema = SchemaRegistryClient.parse(SchemaJson)
    val keySchema = SchemaRegistryClient.parse("\"string\"")

    // seed: 3 keys x 3 partitions (integration.py:41-52)
    for (p <- 0 until Partitions; k <- 0 until UniqueKeys) {
      val keyOut = s"test--key_$k-p$p"
      broker.produceRaw(InTopic, p,
        b64(ConfluentAvro.serialize(keyOut, keySchema, s"$InTopic-key", reg)),
        b64(ConfluentAvro.serialize(ConfluentAvro.record(schema,
          Map("my_data_dict" -> Map(keyOut -> s"$keyOut-r0"))),
          schema, s"$InTopic-value", reg)))
    }

    // S1 consume -> T1 table app (the first test's pipeline, condensed)
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType),
      StructField("headers", ArrayType(StructType(Seq(
        StructField("key", StringType), StructField("value", BinaryType)))))))
    val polled = broker.consumeCommitted("app-group", InTopic)
    val srcDf = spark.createDataFrame(java.util.Arrays.asList(
      polled.map(r => Row(unb64(r.key), unb64(r.value), r.topic, r.partition,
        r.offset, new Timestamp(1700000000000L), 0, null)): _*), kafkaSchema)
    val mapEntry = """"my_data_dict":\{"([^"]+)":"([^"]+)"\}""".r.unanchored
    val outTopic = OutTopic
    val outs = GraftTableApp.transform(Kafka.toEnvelope(srcDf, SchemaJson)) { txn =>
      val iterCount = txn.readTableEntry().map(_.split(",").length).getOrElse(0)
      val (k, v) = txn.message.value match {
        case mapEntry(k, v) => (k, v)
        case other => throw new IllegalStateException(s"bad envelope: $other")
      }
      txn.updateTableEntry(s"$v-t$iterCount")
      val routed = Produce.message(txn.message,
        s"""{"my_data_dict":{"$k":"$v-t$iterCount"}}""", outTopic, 3)
      Iterator((routed.copy(partition = txn.message.partition),
        txn.message.partition, txn.message.offset, txn.message.key))
    }.collect()

    // K1 sink columns + source coordinates, keyed back by the avro key
    val srcByKey = outs.map(o => (o._4, Transactions.SourceOffset(InTopic, o._2, o._3))).toMap
    val headersByKey = outs.map(o => (o._4, o._1.headers)).toMap
    val sinkRows = Kafka.toSinkColumns(outs.map(_._1).toSeq.toDS(),
      SchemaJson, reg, OutTopic).collect()
    val batch = sinkRows.map { r =>
      val keyBytes = r.getAs[Array[Byte]]("key")
      val keyStr = ConfluentAvro.deserialize(keyBytes, reg).toString
      (Message(b64(keyBytes), b64(r.getAs[Array[Byte]]("value")),
        headersByKey(keyStr), r.getAs[String]("topic"),
        r.getAs[Int]("partition"), 0L, new Timestamp(1700000000000L)),
        srcByKey(keyStr))
    }.toSeq.toDS()

    // K2/X1 through the binding: one reflective producer per task
    val txSeq = new java.util.concurrent.atomic.AtomicInteger
    TxProducers.register("full-loop-binding", () => new KafkaClientsTxProducer(
      Map("transactional.id" -> s"flb-${txSeq.incrementAndGet()}"),
      Some(Map.empty), fakeNs))
    Transactions.writeBatchTransactional(batch, "full-loop-binding", "app-group")

    // nothing missing downstream; decoded values carry the -r0-t0 progression
    val produced = broker.readCommitted(OutTopic)
    assert(produced.size == UniqueKeys * Partitions)
    produced.foreach { r =>
      val key = ConfluentAvro.deserialize(unb64(r.key), reg).toString
      val rec = ConfluentAvro.deserialize(unb64(r.value), reg)
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      val m = rec.get("my_data_dict").asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      assert(m.size == 1 && m.values.iterator().next().toString == s"$key-r0-t0")
    }
    // consumption progress committed atomically through the binding
    (0 until Partitions).foreach { p =>
      assert(broker.committedOffset("app-group", InTopic, p)
        .contains(UniqueKeys.toLong))
    }
    // the reflective protocol actually ran (sends carry the guid header)
    assert(FakeCluster.calls.count(_ == "commitTransaction") >= 1)
    assert(FakeCluster.calls.count(_.startsWith("send(")) ==
      UniqueKeys * Partitions)
    assert(FakeCluster.calls.filter(_.startsWith("send("))
      .forall(_.contains(Message.GuidHeader)))

    // POST-COMMIT REPLAY: a retried task re-runs the same batch; every row
    // sits below the committed floor (read back through the fake Admin),
    // so no transaction begins and nothing duplicates
    val callsBefore = FakeCluster.calls.size
    Transactions.writeBatchTransactional(batch, "full-loop-binding", "app-group")
    assert(broker.readCommitted(OutTopic).size == UniqueKeys * Partitions)
    assert(!FakeCluster.calls.drop(callsBefore).contains("beginTransaction"))

    // FENCING: a zombie incarnation produces, a fresh incarnation of the
    // same transactional.id fences it; the zombie's commit surfaces the
    // fence error and its record never becomes visible
    val zombie = new KafkaClientsTxProducer(
      Map("transactional.id" -> "flb-zombie"), Some(Map.empty), fakeNs)
    zombie.initTransactions()
    zombie.beginTransaction()
    zombie.produce(OutTopic, 0, "zk", "zv", Map.empty)
    val fresh = new KafkaClientsTxProducer(
      Map("transactional.id" -> "flb-zombie"), Some(Map.empty), fakeNs)
    fresh.initTransactions() // fences the zombie, aborts its pending slot
    val fenced = intercept[TxClientError](zombie.commitTransaction(30))
    assert(fenced.code == "_FENCED")
    assert(broker.readCommitted(OutTopic).size == UniqueKeys * Partitions)
    assert(!broker.readCommitted(OutTopic).exists(_.key == "zk"))
    // the fresh incarnation owns the id and commits normally
    fresh.beginTransaction()
    fresh.produce(OutTopic, 0, "fk", "fv", Map.empty)
    fresh.commitTransaction(30)
    assert(broker.readCommitted(OutTopic).exists(_.key == "fk"))
  }
}
