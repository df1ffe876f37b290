package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import graft.core.Configs

/** Streaming app lifecycle (SURVEY.md §2.9).
  *
  * X2 — the reference's transaction batching (<=100 msgs / 10 s / lag-gated,
  * reference: fluvii/apps/transactions/consumer.py:22-75) maps to the
  * microbatch trigger + maxOffsetsPerTrigger (set on the source options).
  * X6/X1 — retry/abort/exactly-once collapse into checkpointed microbatch
  * replay: a failed batch re-runs from the offset WAL, state updates are
  * versioned per batch, so "abort + seek back to batch start" is Spark's
  * native failure path, not code.
  * X7 — graceful shutdown: a JVM shutdown hook stopping the query mirrors
  * SignalRaise -> abort -> close (reference: fluvii/exceptions.py:4-30,
  * fluvii/apps/fluvii_app.py:74-109).
  * X8 + §2.12 — the metrics listener exposes the reference's metric names.
  */
object Runner {

  /** Trigger from consumer config: batch wall-time bound
    * (batch_consume_max_time_seconds -> processing-time trigger). */
  def trigger(c: Configs.ConsumerConfig): Trigger =
    Trigger.ProcessingTime(c.batchConsumeMaxTimeSeconds * 1000L)

  /** Start a query with checkpointing + graceful-shutdown hook. */
  def start[T](
      out: Dataset[T],
      checkpointDir: String,
      queryName: String,
      c: Configs.ConsumerConfig = Configs.ConsumerConfig(),
      format: String = "memory"): StreamingQuery = {
    val q = out.writeStream
      .format(format)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger(c))
      .start()
    sys.addShutdownHook { if (q.isActive) q.stop() }
    q
  }
}

/** Prometheus-style counters with the reference's metric names
  * (reference: fluvii/components/metrics/manager/metrics_manager.py:56-60):
  * messages_consumed{topic}, messages_produced{topic},
  * message_errors{exception}, seconds_behind. Fed from Spark's
  * StreamingQueryListener progress events. */
final class GraftMetricsListener extends StreamingQueryListener {
  val messagesConsumed = new ConcurrentHashMap[String, LongAdder]() // by source
  val messagesProduced = new ConcurrentHashMap[String, LongAdder]() // by sink
  val messageErrors = new ConcurrentHashMap[String, LongAdder]()    // by exception
  @volatile var secondsBehind: Double = 0.0

  private def add(m: ConcurrentHashMap[String, LongAdder], k: String, n: Long): Unit =
    m.computeIfAbsent(k, _ => new LongAdder).add(n)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    p.sources.foreach(s => add(messagesConsumed, s.description, s.numInputRows))
    Option(p.sink).foreach(s => add(messagesProduced, s.description, s.numOutputRows))
    // batchDuration as a proxy for lag when no event-time watermark exists
    secondsBehind = p.batchDuration / 1000.0
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    e.exception.foreach(ex => add(messageErrors, ex.takeWhile(_ != ':'), 1))

  /** Prometheus text exposition (gauge/counter lines). */
  def scrape(): String = {
    import scala.jdk.CollectionConverters._
    val b = new StringBuilder
    messagesConsumed.asScala.foreach { case (t, n) =>
      b ++= s"""messages_consumed{topic="$t"} ${n.sum()}\n""" }
    messagesProduced.asScala.foreach { case (t, n) =>
      b ++= s"""messages_produced{topic="$t"} ${n.sum()}\n""" }
    messageErrors.asScala.foreach { case (t, n) =>
      b ++= s"""message_errors{exception="$t"} ${n.sum()}\n""" }
    b ++= s"seconds_behind $secondsBehind\n"
    b.result()
  }
}
