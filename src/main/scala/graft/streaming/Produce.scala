package graft.streaming

import java.sql.Timestamp
import graft.core.Message
import graft.functions.Murmur3

/** Producer-side message construction, with the reference's exact rules
  * (reference: fluvii/components/producer/producer.py:151-175):
  *   - the produced message inherits the consumed message's key and headers
  *     unless overridden; None-valued headers are dropped (T3);
  *   - a `guid` header is injected if absent (T4, producer.py:92-93);
  *   - the partition is murmur3-32(key) mod partition_count — NOT Kafka's
  *     default murmur2 partitioner (K4, producer.py:89-90);
  *   - with no explicit topic and exactly one registered non-changelog
  *     topic, that topic is used (T5, producer.py:163-168).
  */
object Produce {

  /** Pluggable guid source: RFC 4122 v1 (time-based) by default — the same
    * UUID version the reference's `uuid1()` emits (producer.py:92-93) —
    * fixable for deterministic tests. */
  type GuidFactory = () => String
  val defaultGuid: GuidFactory = () => graft.functions.Uuid1.next().toString

  def message(
      consumed: Message,
      value: String,
      topic: String,
      partitionCount: Int,
      key: Option[String] = None,
      headers: Map[String, Option[String]] = Map.empty,
      nowMillis: Long = System.currentTimeMillis(),
      guid: GuidFactory = defaultGuid): Message = {
    val k = key.getOrElse(consumed.key)
    val merged = mergeHeaders(consumed.headers, headers, guid)
    Message(
      key = k,
      value = value,
      headers = merged,
      topic = topic,
      partition = Murmur3.partition(k, partitionCount),
      offset = -1L, // assigned by the log on append
      timestamp = new Timestamp(nowMillis))
  }

  /** Header merge: inherited ++ overrides, None values dropped, guid
    * injected when absent (reference: producer.py:151-161,
    * fluvii/general_utils.py:4-15). */
  def mergeHeaders(
      inherited: Map[String, String],
      overrides: Map[String, Option[String]],
      guid: GuidFactory = defaultGuid): Map[String, String] = {
    val overridden = overrides.collect { case (k, Some(v)) => k -> v }
    val dropped = overrides.collect { case (k, None) => k }.toSet
    val base = (inherited -- dropped) ++ overridden
    if (base.contains(Message.GuidHeader)) base
    else base + (Message.GuidHeader -> guid())
  }

  /** Default-topic inference (T5): exactly one non-changelog topic or error
    * (reference: producer.py:163-168). */
  def inferTopic(registered: Seq[String]): String = {
    // substring test, not suffix — the reference excludes any topic whose
    // name CONTAINS '__changelog' (producer.py:163-168)
    val nonChangelog = registered.filterNot(_.contains("__changelog"))
    require(nonChangelog.size == 1,
      s"cannot infer default topic from $registered — exactly one non-changelog topic required")
    nonChangelog.head
  }
}
