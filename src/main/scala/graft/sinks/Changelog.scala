package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** External state changelog (SURVEY.md §2.2 K3 / §2.1 S4).
  *
  * The reference mirrors every table update to a compacted Kafka topic
  * `{app}__changelog` (reference: fluvii/apps/transactions/transaction.py:
  * 158-161) so other apps can bootstrap state from it. Spark keeps state in
  * checkpoints, so recovery does NOT need this (SURVEY.md §7.4 risk 3) —
  * but external consumers might. This sink reproduces the contract on
  * storage: an append log of (key, state, batch_id, seq) plus log
  * compaction to latest-state-per-key, which is exactly what a compacted
  * topic materializes to.
  */
object Changelog {

  /** foreachBatch body: append this batch's state updates (state=null is
    * the tombstone, like a null Kafka record). */
  def appendBatch(updates: DataFrame, batchId: Long, dir: String): Unit = {
    require(updates.columns.toSet == Set("key", "state"),
      s"changelog batch must be (key, state), got ${updates.columns.mkString(",")}")
    updates
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)      // idempotent per-batch replay
      .parquet(s"$dir/batch_id=$batchId")
  }

  /** Log compaction: latest state per key, tombstones dropped — what a
    * compacted topic converges to, and what S4 recovery replays. */
  def compact(spark: SparkSession, dir: String): DataFrame = {
    val log = spark.read.parquet(s"$dir/batch_id=*")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("batch_id").desc)
    log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("state").isNotNull)
      .select(col("key"), col("state"))
  }
}
