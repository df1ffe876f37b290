package graft.bindings.fake

import graft.sinks.InMemoryTxBroker
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Recording doubles that mirror the kafka-clients REFLECTIVE surface the
  * binding drives (same method names, arities and compatible types), so
  * the sequence-parity specs can prove [[graft.bindings.KafkaClientsTxProducer]]
  * and [[graft.bindings.KafkaClientsAdmin]] emit the exact protocol the
  * in-memory broker double expects — without the kafka-clients jar, which
  * does not exist in this environment. Every double DELEGATES to the same
  * [[InMemoryTxBroker]] the strict-EOS specs already trust, so parity is
  * asserted on both the call sequence and the broker end-state. */
object FakeCluster {
  val calls = mutable.ArrayBuffer.empty[String]
  var broker = new InMemoryTxBroker
  /** Source coordinates the fake admin reports group offsets for. */
  var knownSources: Seq[(String, Int)] = Nil
  /** Exceptions the next commitTransaction calls throw, in order. */
  val commitFailures = mutable.Queue.empty[Throwable]

  def reset(): Unit = synchronized {
    calls.clear(); broker = new InMemoryTxBroker; knownSources = Nil
    commitFailures.clear()
  }
  def record(s: String): Unit = synchronized { calls += s }
}

class FakeFuture(value: () => AnyRef) {
  def get(): AnyRef = value()
}

class FakeHeaders {
  val items = mutable.LinkedHashMap.empty[String, Array[Byte]]
  def add(key: String, value: Array[Byte]): FakeHeaders = {
    items(key) = value; this
  }
}

class FakeProducerRecord(val topic: String, val partition: Integer,
    val key: String, val value: String) {
  private val hs = new FakeHeaders
  def headers(): FakeHeaders = hs
  def headerMap: Map[String, String] =
    hs.items.map { case (k, v) => k -> new String(v, "UTF-8") }.toMap
}

case class FakeTopicPartition(topic: String, partition: Integer)

class FakeOffsetAndMetadata(off: java.lang.Long) {
  def offset(): Long = off.longValue()
}

class FakeConsumerGroupMetadata(val groupId: String)

/** Mirrors KafkaProducer's transactional surface; delegates to an
  * [[InMemoryTxBroker]] producer keyed by the configured transactional.id
  * (which is exactly what the real client does). */
class FakeKafkaProducer(configs: java.util.Map[String, AnyRef]) {
  private val txId = configs.get("transactional.id").toString
  private val inner = FakeCluster.broker.producer(txId)

  def initTransactions(): Unit = {
    FakeCluster.record("initTransactions"); inner.initTransactions()
  }
  def beginTransaction(): Unit = {
    FakeCluster.record("beginTransaction"); inner.beginTransaction()
  }
  def send(rec: FakeProducerRecord): AnyRef = {
    FakeCluster.record(s"send(${rec.topic},${rec.partition},${rec.key}," +
      s"${rec.value},${rec.headerMap.toSeq.sorted.mkString(";")})")
    inner.produce(rec.topic, rec.partition.intValue(), rec.key, rec.value,
      rec.headerMap)
    new FakeFuture(() => null)
  }
  def sendOffsetsToTransaction(
      offsets: java.util.Map[FakeTopicPartition, FakeOffsetAndMetadata],
      gm: FakeConsumerGroupMetadata): Unit = {
    val m = offsets.asScala.map { case (tp, oam) =>
      (tp.topic, tp.partition.intValue()) -> oam.offset()
    }.toMap
    FakeCluster.record(s"sendOffsetsToTransaction(${gm.groupId}," +
      s"${m.toSeq.sorted.mkString(";")})")
    inner.sendOffsetsToTransaction(m, gm.groupId)
  }
  def commitTransaction(): Unit = {
    FakeCluster.record("commitTransaction")
    FakeCluster.synchronized {
      if (FakeCluster.commitFailures.nonEmpty)
        throw FakeCluster.commitFailures.dequeue()
    }
    inner.commitTransaction(30)
  }
  def abortTransaction(): Unit = {
    FakeCluster.record("abortTransaction"); inner.abortTransaction(10)
  }
  def close(): Unit = FakeCluster.record("close")
}

// ------------------------------ admin side ------------------------------

/** Kafka-like exception shapes for classification-parity tests — matched
  * by SIMPLE name walked up the hierarchy, like the binding does. */
object errors {
  class KafkaException(msg: String) extends RuntimeException(msg)
  class RetriableException(msg: String) extends KafkaException(msg)
  class TimeoutException(msg: String) extends RetriableException(msg)
  class NotEnoughReplicasException(msg: String) extends RetriableException(msg)
  class ProducerFencedException(msg: String) extends KafkaException(msg)
  class InvalidTxnStateException(msg: String) extends KafkaException(msg)
  class TopicExistsException(msg: String) extends KafkaException(msg)
  class UnknownTopicOrPartitionException(msg: String) extends KafkaException(msg)
  class PolicyViolationException(msg: String) extends KafkaException(msg)
}

class FakeListTopicsOptions {
  var internal = false
  def listInternal(b: Boolean): FakeListTopicsOptions = { internal = b; this }
}

class FakeListTopicsResult(ns: => java.util.Collection[String]) {
  def names(): FakeFuture = new FakeFuture(() => ns)
}

class FakePartitionInfo(nReplicas: Int) {
  def replicas(): java.util.List[AnyRef] =
    Seq.fill[AnyRef](nReplicas)("r").asJava
}

class FakeTopicDescription(parts: Int, rf: Int) {
  def partitions(): java.util.List[AnyRef] =
    Seq.fill(parts)(new FakePartitionInfo(rf): AnyRef).asJava
}

class FakeConfigEntry(n: String, v: String, dynamic: Boolean) {
  // the binding constructs entries with the real ConfigEntry's 2-arg ctor
  def this(n: String, v: String) = this(n, v, true)
  def name(): String = n
  def value(): String = v
  def source(): AnyRef =
    if (dynamic) "DYNAMIC_TOPIC_CONFIG" else "DEFAULT_CONFIG"
}

class FakeConfig(es: java.util.Collection[AnyRef]) {
  def entries(): java.util.Collection[AnyRef] = es
}

class FakeNewTopic(val name: String, val parts: Integer, val rf: java.lang.Short) {
  var cfg: Map[String, String] = Map.empty
  def configs(m: java.util.Map[String, AnyRef]): FakeNewTopic = {
    cfg = m.asScala.map { case (k, v) => k -> v.toString }.toMap; this
  }
}

class FakeGenericResult(fs: Map[String, FakeFuture]) {
  def values(): java.util.Map[String, AnyRef] =
    fs.map { case (k, v) => k -> (v: AnyRef) }.asJava
}

class FakeAlterResult(fs: java.util.Map[AnyRef, AnyRef]) {
  def values(): java.util.Map[AnyRef, AnyRef] = fs
}

class FakeLCGOResult(m: () => java.util.Map[AnyRef, AnyRef]) {
  def partitionsToOffsetAndMetadata(): FakeFuture = new FakeFuture(() => m())
}

class FakeDescribeTopicsResult(m: () => java.util.Map[String, AnyRef]) {
  def allTopicNames(): FakeFuture = new FakeFuture(() => m())
}

class FakeDescribeConfigsResult(m: () => java.util.Map[AnyRef, AnyRef]) {
  def all(): FakeFuture = new FakeFuture(() => m())
}

/** Broker-state holder for [[FakeAdmin]] — one topics map shared by every
  * FakeAdmin instance until reset. */
object FakeAdminState {
  final case class T(partitions: Int, rf: Int, configs: Map[String, String])
  val topics = mutable.LinkedHashMap.empty[String, T]
  var restricted: Set[String] = Set.empty
  def reset(): Unit = { topics.clear(); restricted = Set.empty }
}

/** Mirrors the Admin interface surface the binding drives. A static
  * `create` forwarder is generated from this companion, which is what
  * `Admin.create(configs)` resolves to reflectively. */
class FakeAdmin {
  import FakeAdminState._

  def listTopics(opts: FakeListTopicsOptions): FakeListTopicsResult = {
    FakeCluster.record(s"admin.listTopics(internal=${opts.internal})")
    new FakeListTopicsResult(
      topics.keys.filter(t => opts.internal || !t.startsWith("__"))
        .toSeq.asJava)
  }

  def describeTopics(names: java.util.Collection[String]): FakeDescribeTopicsResult = {
    FakeCluster.record(s"admin.describeTopics(${names.asScala.toSeq.sorted.mkString(",")})")
    new FakeDescribeTopicsResult(() =>
      names.asScala.map(n =>
        n -> (new FakeTopicDescription(topics(n).partitions,
          topics(n).rf): AnyRef)).toMap.asJava)
  }

  def describeConfigs(rs: java.util.Collection[AnyRef]): FakeDescribeConfigsResult = {
    FakeCluster.record("admin.describeConfigs")
    new FakeDescribeConfigsResult(() =>
      rs.asScala.map { r =>
        val name = r.asInstanceOf[FakeConfigResource].name()
        r -> (new FakeConfig(topics(name).configs.map(kv =>
          new FakeConfigEntry(kv._1, kv._2): AnyRef).toSeq.asJava): AnyRef)
      }.toMap.asJava)
  }

  def createTopics(ts: java.util.Collection[AnyRef]): FakeGenericResult = {
    val specs = ts.asScala.map(_.asInstanceOf[FakeNewTopic]).toSeq
    FakeCluster.record(s"admin.createTopics(${specs.map(_.name).sorted.mkString(",")})")
    new FakeGenericResult(specs.map { t =>
      t.name -> new FakeFuture(() => {
        if (topics.contains(t.name))
          throw new java.util.concurrent.ExecutionException(
            new errors.TopicExistsException(t.name))
        topics(t.name) = T(t.parts.intValue(), t.rf.intValue(), t.cfg)
        null
      })
    }.toMap)
  }

  def deleteTopics(ns: java.util.Collection[String]): FakeGenericResult = {
    val names = ns.asScala.toSeq
    FakeCluster.record(s"admin.deleteTopics(${names.sorted.mkString(",")})")
    new FakeGenericResult(names.map { n =>
      n -> new FakeFuture(() => {
        if (!topics.contains(n))
          throw new java.util.concurrent.ExecutionException(
            new errors.UnknownTopicOrPartitionException(n))
        topics.remove(n); null
      })
    }.toMap)
  }

  def alterConfigs(m: java.util.Map[AnyRef, AnyRef]): FakeAlterResult = {
    val futures = m.asScala.map { case (res, cfg) =>
      val name = res.asInstanceOf[FakeConfigResource].name()
      val entries = cfg.asInstanceOf[FakeConfig].entries().asScala
        .map(_.asInstanceOf[FakeConfigEntry]).map(e => e.name() -> e.value())
        .toMap
      FakeCluster.record(s"admin.alterConfigs($name," +
        s"${entries.toSeq.sorted.mkString(";")})")
      (res, new FakeFuture(() => {
        val bad = entries.keySet.intersect(restricted).toSeq.sorted
        if (bad.nonEmpty)
          // the broker's POLICY_VIOLATION text shape the reference parses
          // (fluvii_toolbox.py:144-149): fields from the third ':' on,
          // uneditable ones carrying "This config cannot be updated."
          throw new java.util.concurrent.ExecutionException(
            new errors.PolicyViolationException(
              "Broker: Policy violation: " + bad.map(k =>
                s"${k}=${entries(k)}. This config cannot be updated.")
                .mkString(":")))
        val cur = topics(name)
        topics(name) = cur.copy(configs = entries)
        null
      }): AnyRef)
    }
    new FakeAlterResult(futures.toMap.asJava)
  }

  def listConsumerGroupOffsets(groupId: String): FakeLCGOResult = {
    FakeCluster.record(s"admin.listConsumerGroupOffsets($groupId)")
    new FakeLCGOResult(() =>
      FakeCluster.knownSources.flatMap { case (t, p) =>
        FakeCluster.broker.committedOffset(groupId, t, p).map(o =>
          (FakeTopicPartition(t, Int.box(p)): AnyRef,
            new FakeOffsetAndMetadata(Long.box(o)): AnyRef))
      }.toMap.asJava)
  }

  def close(): Unit = FakeCluster.record("admin.close")
}

object FakeAdmin {
  /** Static forwarder target for the binding's `Admin.create(configs)`. */
  def create(configs: java.util.Map[String, AnyRef]): FakeAdmin = {
    FakeCluster.record("admin.create")
    new FakeAdmin
  }
}

/** A kafka-clients-4.x-shaped admin double: the legacy `alterConfigs`
  * (removed in 4.0) does NOT exist on this surface, so the binding's
  * reflective dispatch throws NoSuchMethodException and must fall back to
  * `incrementalAlterConfigs` with SET ops ([[FakeAlterConfigOp]]).
  * Incremental semantics are faithfully MERGE (a dynamic key absent from
  * the ops survives), and the policy-violation message is the java
  * client's RAW plugin text — no librdkafka 'Broker: Policy violation'
  * preamble — so the tolerant parse is exercised too. Everything else
  * delegates to [[FakeAdmin]]. */
class FakeAdmin4x {
  import FakeAdminState._
  import scala.jdk.CollectionConverters._
  private val inner = new FakeAdmin

  def listTopics(o: FakeListTopicsOptions): FakeListTopicsResult =
    inner.listTopics(o)
  def describeTopics(n: java.util.Collection[String]): FakeDescribeTopicsResult =
    inner.describeTopics(n)
  def describeConfigs(r: java.util.Collection[AnyRef]): FakeDescribeConfigsResult =
    inner.describeConfigs(r)
  def createTopics(t: java.util.Collection[AnyRef]): FakeGenericResult =
    inner.createTopics(t)
  def deleteTopics(n: java.util.Collection[String]): FakeGenericResult =
    inner.deleteTopics(n)
  def listConsumerGroupOffsets(g: String): FakeLCGOResult =
    inner.listConsumerGroupOffsets(g)
  def close(): Unit = inner.close()

  def incrementalAlterConfigs(
      m: java.util.Map[AnyRef, AnyRef]): FakeAlterResult = {
    val futures = m.asScala.map { case (res, opsAny) =>
      val name = res.asInstanceOf[FakeConfigResource].name()
      val ops = opsAny.asInstanceOf[java.util.Collection[AnyRef]].asScala
        .map(_.asInstanceOf[FakeAlterConfigOp])
      require(ops.forall(_.opType() == FakeAlterConfigOp.OpType.SET),
        "binding fallback must emit SET ops only")
      val entries = ops.map { op =>
        val e = op.configEntry().asInstanceOf[FakeConfigEntry]
        e.name() -> e.value()
      }.toMap
      FakeCluster.record(s"admin.incrementalAlterConfigs($name," +
        s"${entries.toSeq.sorted.mkString(";")})")
      (res, new FakeFuture(() => {
        val bad = entries.keySet.intersect(restricted).toSeq.sorted
        if (bad.nonEmpty)
          // java-client shape: the broker plugin's raw error_message,
          // WITHOUT librdkafka's preamble
          throw new java.util.concurrent.ExecutionException(
            new errors.PolicyViolationException(
              bad.map(k =>
                s"${k}=${entries(k)}. This config cannot be updated.")
                .mkString(":")))
        val cur = topics(name)
        topics(name) = cur.copy(configs = cur.configs ++ entries) // MERGE
        null
      }): AnyRef)
    }
    new FakeAlterResult(futures.toMap.asJava)
  }
}

object FakeAdmin4x {
  def create(configs: java.util.Map[String, AnyRef]): FakeAdmin4x = {
    FakeCluster.record("admin.create")
    new FakeAdmin4x
  }
}
