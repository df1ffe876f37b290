package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestSession.spark
import graft.core.Message
import graft.state.GraftTableApp

/** S4/X1/X6 end-to-end: a stateful streaming query stopped mid-stream and
  * restarted from its checkpoint must (a) retain keyed state and (b) not
  * duplicate or lose output — the behavior the reference gets from
  * changelog-topic recovery + Kafka transactions (reference: fluvii/apps/
  * fluvii_table_app.py:82-136, README "Processing Guarantees"). */
class RecoverySpec extends AnyFunSuite {
  import spark.implicits._

  private def msg(k: String, off: Long) =
    Message(k, "1", Map.empty, "in", 0, off, new Timestamp(1700000000000L + off))

  test("stateful query restarted from checkpoint: state kept, no dup output") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_eos_out").toString

    def counterApp(in: MemoryStream[Message]) =
      GraftTableApp.transform(in.toDS()) { txn =>
        val n = txn.readTableEntry().map(_.toLong).getOrElse(0L) + 1
        txn.updateTableEntry(n.toString)
        Iterator.single((txn.message.key, txn.message.offset, n))
      }.toDF("key", "offset", "count")

    // phase 1: two batches, then stop
    val in1 = MemoryStream[Message](spark)
    val q1 = counterApp(in1).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
      }
      .start()
    in1.addData(Seq(msg("a", 0), msg("b", 1))); q1.processAllAvailable()
    in1.addData(Seq(msg("a", 2))); q1.processAllAvailable()
    q1.stop()

    // phase 2: new stream instance, SAME checkpoint -> state must resume.
    // MemoryStream offsets restart per instance, so re-feed the already-
    // committed batches (their offsets are in the WAL and are skipped) plus
    // the new data.
    val in2 = MemoryStream[Message](spark)
    in2.addData(Seq(msg("a", 0), msg("b", 1)))
    in2.addData(Seq(msg("a", 2)))
    in2.addData(Seq(msg("a", 3), msg("b", 4)))
    val q2 = counterApp(in2).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
      }
      .start()
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(s"$outDir/batch_id=*")
      .as[(String, Long, Long)].collect().toSet
    // per-key counters must continue across the restart: a:1,2,3  b:1,2
    assert(rows == Set(("a", 0L, 1L), ("b", 1L, 1L), ("a", 2L, 2L),
      ("a", 3L, 3L), ("b", 4L, 2L)),
      s"got $rows")
  }
}
