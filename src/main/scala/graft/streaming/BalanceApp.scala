package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Message, Tables}
import graft.functions.Murmur3
import graft.state.{GraftTableApp, TableTransaction}

/** The reference's flagship demo — per-key running account balance with
  * table state (reference: examples/fluvii_demo_current_2023/consumer/
  * fluvii_consumer_ex.py:21-42) — expressed on the graft state facade.
  *
  * The same app function runs in three modes:
  *   - batch over the events table (exposed as query st01, whose oracle is
  *     the SQL running-sum window — proving the state semantics against
  *     DuckDB);
  *   - MemoryStream microbatches (ScalaTest, proving state persists across
  *     batches exactly like the SQLite table + changelog do);
  *   - a real Kafka stream via the same Dataset[Message] shape.
  */
object BalanceApp {

  case class BalanceUpdate(user_id: Long, event_id: Long, balance: Double)

  /** State document: {"balance": <double>} — JSON, like the reference demo
    * (fluvii_consumer_ex.py:30-36). */
  private val BalanceRe = """\{"balance":([-0-9.eE]+)\}""".r

  def readBalance(state: Option[String]): Double = state match {
    case Some(BalanceRe(v)) => v.toDouble
    case _                  => 0.0
  }

  def writeBalance(b: Double): String = s"""{"balance":$b}"""

  /** The app function: read state, accumulate, update state, emit. */
  def appFn(txn: TableTransaction): Iterator[BalanceUpdate] = {
    val m = txn.message
    val bal = readBalance(txn.readTableEntry()) + m.value.toDouble
    txn.updateTableEntry(writeBalance(bal))
    Iterator.single(BalanceUpdate(m.key.toLong, m.offset, bal))
  }

  /** events rows → canonical envelope. The amount rides in `value`;
    * event_id is the per-key order key (validated: per-user event_id order
    * equals (ts, event_id) order in this corpus), and the partition is the
    * reference's mmh3 partitioner over the key. */
  def eventsAsMessages(s: SparkSession, dir: String, partitions: Int = 32): Dataset[Message] = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        col("user_id").cast("string").as("key"),
        col("value").cast("string").as("value"),
        map(lit("source"), lit("events")).as("headers"),
        lit("events").as("topic"),
        lit(0).as("partition"),
        col("event_id").as("offset"),
        col("ts").as("timestamp")) // TimestampType, normalized by Tables.events
      .as[Message]
      .map(m => m.copy(partition = Murmur3.partition(m.key, partitions)))
  }

  /** Query st01: batch run of the stateful app; equals the SQL running-sum
    * window, which is its DuckDB oracle. */
  def runningBalanceQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    GraftTableApp.transform(eventsAsMessages(s, dir))(appFn)
      .toDF()
      .withColumn("balance", round(col("balance"), 2))
      .orderBy(col("user_id"), col("event_id"))
  }
}
