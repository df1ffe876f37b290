package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import graft.core.Message

/** Exactly-once output (SURVEY.md §2.9 X1 / §2.2 K2).
  *
  * The reference gets EOS from Kafka transactions: consumed offsets +
  * outputs + changelog commit atomically (reference: fluvii/apps/
  * transactions/consumer.py:94-107, producer.py (transactions):7-41).
  * Spark's file sinks are already exactly-once via the checkpointed commit
  * log; the Kafka sink is at-least-once. The pragmatic parity documented in
  * SURVEY.md §7.3 is implemented here:
  *
  *   - every produced message carries a `guid` header (Produce.mergeHeaders);
  *   - [[writeBatchIdempotent]] is a foreachBatch body that makes replays
  *     harmless: a batch is written to a batchId-keyed location with
  *     overwrite semantics, and duplicate guids within the batch are
  *     collapsed — re-running batch N (the only at-least-once failure mode:
  *     a batch retried after a partial write) rewrites the same data
  *     instead of appending it twice;
  *   - a downstream Kafka consumer gets the same guarantee by keying on the
  *     guid header (idempotent consumption).
  *
  * The STRICT broker-side form — consumed offsets committed inside the
  * producer transaction, with the reference's retriable/fatal/timeout
  * classification — lives in [[Transactions]]; this file remains the
  * pragmatic file-sink path for pipelines that land in storage rather
  * than Kafka.
  */
object Eos {

  /** foreachBatch((batch, id) => writeBatchIdempotent(batch, id, dir)). */
  def writeBatchIdempotent(batch: Dataset[Message], batchId: Long, outDir: String): Unit = {
    val deduped = batch.toDF()
      .withColumn("guid", coalesce(col("headers").getItem(Message.GuidHeader),
        concat(col("topic"), lit("-"), col("partition"), lit("-"), col("offset"))))
      .dropDuplicates("guid")
    deduped.write
      .mode(SaveMode.Overwrite) // replayed batch overwrites, never appends
      .parquet(s"$outDir/batch_id=$batchId")
  }

  /** Read back everything committed so far (all batches). */
  def readCommitted(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/batch_id=*")
}
