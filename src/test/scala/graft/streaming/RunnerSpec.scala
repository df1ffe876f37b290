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

  test("lag policy mirrors the reference batch-mode state machine (X2)") {
    // reference defaults: gate = batch_consume_trigger_message_age_seconds,
    // cap = batch_consume_max_count, compared UNMULTIPLIED on refresh
    val p = new LagBatchPolicy(triggerAgeSeconds = 60.0, maxCount = 100,
      batchMultiplier = 10)
    assert(!p.batchMode && p.offsetsPerTrigger == 100)
    p.observeMessageAge(59.9)            // fresh message: stay latency mode
    assert(!p.batchMode)
    p.observeMessageAge(60.1)            // stale message: flip to batch
    assert(p.batchMode && p.offsetsPerTrigger == 1000)
    p.observeBatchSize(1000)             // full batches: still behind
    assert(p.batchMode)
    p.observeBatchSize(100)              // exactly at cap: still behind
    assert(p.batchMode)
    p.observeBatchSize(99)               // under the cap: caught up
    assert(!p.batchMode && p.offsetsPerTrigger == 100)
    p.observeBatchSize(5)                // refresh is idempotent out of batch
    assert(!p.batchMode)
  }

  test("runAdaptive restarts the query with the multiplied cap on a mode flip (X2)") {
    import org.apache.spark.sql.streaming.StreamingQuery
    val started = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stopped = scala.collection.mutable.ArrayBuffer.empty[Long]
    final class FakeQuery(val cap: Long) extends StreamingQuery {
      override def name: String = s"fake-$cap"
      override def id: java.util.UUID = java.util.UUID.randomUUID()
      override def runId: java.util.UUID = java.util.UUID.randomUUID()
      override def sparkSession: org.apache.spark.sql.SparkSession = spark
      override def isActive: Boolean = true
      override def exception = None
      override def status = null
      override def recentProgress = Array.empty
      override def lastProgress = null // age comes from the injected ageOf
      override def awaitTermination(): Unit = ()
      override def awaitTermination(timeoutMs: Long): Boolean = true
      override def processAllAvailable(): Unit = ()
      override def stop(): Unit = stopped += cap
      override def explain(): Unit = ()
      override def explain(extended: Boolean): Unit = ()
    }
    def mkQuery(cap: Long): StreamingQuery = { started += cap; new FakeQuery(cap) }
    // lag script: two fresh polls, then stale (flip on), then after one
    // more poll the under-cap refresh is driven via observeBatchSize
    val ages = Iterator(10.0, 10.0, 120.0, 5.0, 5.0)
    val policy = new LagBatchPolicy(60.0, 100, 10)
    var polls = 0
    val q = Runner.runAdaptive(
      mkQuery, policy,
      until = () => { polls += 1; polls > 5 },
      pollMillis = 1,
      ageOf = { q =>
        // once in batch mode, simulate the catch-up completing: a batch
        // under the cap arrives and the policy refreshes out of batch
        if (policy.batchMode) policy.observeBatchSize(42)
        if (ages.hasNext) Some(ages.next()) else None
      })
    q.stop()
    // latency start (100) -> flip to batch (1000) -> refresh under cap
    // flips back (100); each superseded incarnation was stopped
    assert(started.toSeq == Seq(100, 1000, 100))
    assert(stopped.toSeq == Seq(100, 1000, 100))
  }

  test("runAdaptive surfaces a dead query instead of polling it forever (round-10 advice)") {
    // a REAL query that fails its first batch: the adaptive loop must
    // rethrow the failure, not keep sleeping against a dead query until
    // until() flips (which here never does)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_runner_dead").toString
    val input = MemoryStream[Message](spark)
    val failing = input.toDS().map { m =>
      if (m.key == "boom") throw new IllegalStateException("induced failure")
      m
    }
    input.addData(Seq(msgAt("boom", 0)))
    def mk(cap: Long) = failing.writeStream.format("noop")
      .option("checkpointLocation", ckpt).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Runner.runAdaptive(mk, new LagBatchPolicy(60.0, 100),
        until = () => false, pollMillis = 10)
    }
    assert(e.getMessage.contains("induced failure") ||
      Option(e.getCause).exists(_.getMessage.contains("induced failure")))
  }

  test("runAdaptive returns when the query was stopped externally (no exception)") {
    import org.apache.spark.sql.streaming.StreamingQuery
    final class StoppedQuery extends StreamingQuery {
      override def name: String = "stopped"
      override def id: java.util.UUID = java.util.UUID.randomUUID()
      override def runId: java.util.UUID = java.util.UUID.randomUUID()
      override def sparkSession: org.apache.spark.sql.SparkSession = spark
      override def isActive: Boolean = false // externally stopped
      override def exception = None
      override def status = null
      override def recentProgress = Array.empty
      override def lastProgress = null
      override def awaitTermination(): Unit = ()
      override def awaitTermination(timeoutMs: Long): Boolean = true
      override def processAllAvailable(): Unit = ()
      override def stop(): Unit = ()
      override def explain(): Unit = ()
      override def explain(extended: Boolean): Unit = ()
    }
    // restarting on top of whoever stopped it would race — the loop ends
    val q = Runner.runAdaptive(_ => new StoppedQuery,
      new LagBatchPolicy(60.0, 100), until = () => false, pollMillis = 1)
    assert(!q.isActive)
  }

  private def msgAt(key: String, off: Long): Message =
    Message(key, s"v$off", Map.empty, "t", 0, off, new Timestamp(off))

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
