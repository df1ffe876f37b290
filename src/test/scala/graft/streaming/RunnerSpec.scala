package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestSession.spark
import graft.core.{Configs, Message}

/** X2/X7 — runner lifecycle: trigger derivation from consumer config,
  * checkpointed start, clean stop. */
class RunnerSpec extends AnyFunSuite {
  import spark.implicits._

  test("trigger derives from batch_consume_max_time_seconds") {
    assert(Runner.trigger(Configs.ConsumerConfig()) ==
      Trigger.ProcessingTime(10000L))
    assert(Runner.trigger(Configs.ConsumerConfig(batchConsumeMaxTimeSeconds = 3)) ==
      Trigger.ProcessingTime(3000L))
  }

  test("start() runs a checkpointed query end to end and stops cleanly") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_runner_ckpt").toString
    val input = MemoryStream[Message](spark)
    val out = input.toDS().map(m => (m.key, m.value))
    val q = Runner.start(out, ckpt, "runner_out",
      Configs.ConsumerConfig(batchConsumeMaxTimeSeconds = 1))
    try {
      input.addData(Seq(
        Message("k1", "v1", Map.empty, "t", 0, 0, new Timestamp(0L)),
        Message("k2", "v2", Map.empty, "t", 0, 1, new Timestamp(1L))))
      q.processAllAvailable()
      assert(spark.table("runner_out").count() == 2)
      assert(q.isActive)
    } finally q.stop()
    assert(!q.isActive)
    // the checkpoint directory was really used
    assert(new java.io.File(s"$ckpt/offsets").exists())
  }
}
