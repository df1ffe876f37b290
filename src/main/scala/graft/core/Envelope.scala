package graft.core

import java.sql.Timestamp

/** The engine's canonical message envelope (SURVEY.md §1.1).
  *
  * Mirrors the reference's Transaction facade field set
  * (reference: fluvii/apps/transactions/transaction.py:61-77): key, value,
  * headers, topic, partition, offset, timestamp. The value is carried as a
  * JSON string — the reference's values are Avro-decoded Python dicts and
  * its state is JSON (reference: fluvii/components/sqlite/sqlite.py:96), so
  * a schema-free JSON payload is the faithful representation; typed access
  * goes through from_json/get_json_object or the Avro codec.
  */
case class Message(
    key: String,
    value: String,
    headers: Map[String, String],
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: Timestamp) {

  /** Message age in seconds at `now` — the reference's lag heuristic input
    * (reference: fluvii/apps/transactions/consumer.py:60-69). */
  def ageSeconds(nowMillis: Long): Double =
    (nowMillis - timestamp.getTime) / 1000.0
}

object Message {
  /** Reserved header: every produced message carries a guid
    * (reference: fluvii/components/producer/producer.py:92-93,160-161). */
  val GuidHeader = "guid"

  /** Changelog topic naming rule
    * (reference: fluvii/apps/config.py:26-30). */
  def changelogTopic(appName: String): String = s"${appName}__changelog"
}
