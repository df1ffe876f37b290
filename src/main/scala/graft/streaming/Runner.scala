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

  /** X2, strict form — the reference's lag-gated consume-mode switch as a
    * run loop: the query starts with the policy's current per-trigger
    * offset cap; each poll feeds observed lag (message age) and batch
    * size into the [[LagBatchPolicy]]; when the mode FLIPS, the query is
    * stopped and restarted with the new cap. A restart against the same
    * checkpoint resumes from the offset WAL, so the switch is
    * exactly-once — Spark's restart idiom standing in for the
    * reference's in-place batch-state mutation
    * (fluvii/apps/transactions/consumer.py:22-75).
    *
    * `mkQuery` receives the offsets-per-trigger cap and must start a
    * query on the SAME checkpoint each time (thread the cap into the
    * source's maxOffsetsPerTrigger). `ageOf` extracts the newest
    * message's age from the running query ([[lastEventAgeSeconds]] reads
    * it off progress event-time; tests inject a fake). `until` bounds
    * the loop (production passes the shutdown flag). */
  def runAdaptive(
      mkQuery: Long => StreamingQuery,
      policy: LagBatchPolicy,
      until: () => Boolean,
      pollMillis: Long = 500,
      ageOf: StreamingQuery => Option[Double] = lastEventAgeSeconds): StreamingQuery = {
    var q = mkQuery(policy.offsetsPerTrigger)
    var mode = policy.batchMode
    while (!until()) {
      Thread.sleep(pollMillis)
      // a dead query must surface, not be polled forever: rethrow its
      // failure (the reference's consume loop likewise lets the fatal
      // exception propagate to the app runner rather than spinning). A
      // query that stopped WITHOUT an exception (external stop) just ends
      // the loop — restarting on top of whoever stopped it would race.
      if (!q.isActive) {
        q.exception.foreach(throw _)
        return q
      }
      Option(q.lastProgress).foreach(p => policy.observeBatchSize(p.numInputRows))
      ageOf(q).foreach(policy.observeMessageAge)
      if (policy.batchMode != mode) {
        q.stop()
        q = mkQuery(policy.offsetsPerTrigger)
        mode = policy.batchMode
      }
    }
    q
  }

  /** Newest-message age from query progress: trigger timestamp minus
    * event-time max — the same derivation the metrics listener publishes
    * as seconds_behind (consumer.py:94's semantics). */
  def lastEventAgeSeconds(q: StreamingQuery): Option[Double] =
    for {
      p <- Option(q.lastProgress)
      et <- Option(p.eventTime) if et.containsKey("max")
      age <- try Some(
        (java.time.Instant.parse(p.timestamp).toEpochMilli -
          java.time.Instant.parse(et.get("max")).toEpochMilli) / 1000.0)
      catch { case _: Exception => None }
    } yield age

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

/** The reference's batch-consume state machine, clock-free
  * (fluvii/apps/transactions/consumer.py:22-75): a consumed message older
  * than `triggerAgeSeconds` (batch_consume_trigger_message_age_seconds)
  * flips BATCH mode ON — the app is behind, stop optimizing latency and
  * catch up in bulk; a batch that arrives UNDER `maxCount`
  * (batch_consume_max_count, compared UNMULTIPLIED like
  * `_refresh_batch_consume_status`) means the app has caught up and
  * flips batch mode OFF. In batch mode the per-trigger offset cap is
  * `maxCount * batchMultiplier` (the reference's consume_multiplier). */
final class LagBatchPolicy(
    val triggerAgeSeconds: Double,
    val maxCount: Long,
    val batchMultiplier: Long = 10) {
  @volatile private var batch = false
  def batchMode: Boolean = batch
  /** consumer.py:60-69 (_requires_batch_consuming). */
  def observeMessageAge(ageSeconds: Double): Unit =
    if (!batch && ageSeconds > triggerAgeSeconds) batch = true
  /** consumer.py:22-31 (_refresh_batch_consume_status). */
  def observeBatchSize(rows: Long): Unit =
    if (batch && rows < maxCount) batch = false
  def offsetsPerTrigger: Long =
    if (batch) maxCount * batchMultiplier else maxCount
}

/** Prometheus-style counters with the reference's metric names
  * (reference: fluvii/components/metrics/manager/metrics_manager.py:56-60):
  * messages_consumed{topic}, messages_produced{topic},
  * message_errors{exception}, external_requests{...}, seconds_behind.
  * Fed from Spark's StreamingQueryListener progress events.
  *
  * seconds_behind carries the reference's semantics — wall clock minus the
  * produce/event timestamp of the newest message processed
  * (reference: fluvii/components/consumer/consumer.py:94) — derived from
  * the batch's event-time progress (trigger timestamp minus eventTime.max),
  * so it is only published once a query tracking event time has progressed;
  * batch processing time is published separately as batch_duration_seconds,
  * never under the lag name. */
final class GraftMetricsListener extends StreamingQueryListener {
  val messagesConsumed = new ConcurrentHashMap[String, LongAdder]() // by source
  val messagesProduced = new ConcurrentHashMap[String, LongAdder]() // by sink
  val messageErrors = new ConcurrentHashMap[String, LongAdder]()    // by exception
  val externalRequests = new ConcurrentHashMap[String, LongAdder]() // by label set
  @volatile var secondsBehind: Option[Double] = None
  @volatile var batchDurationSeconds: Double = 0.0

  private def add(m: ConcurrentHashMap[String, LongAdder], k: String, n: Long): Unit =
    m.computeIfAbsent(k, _ => new LongAdder).add(n)

  /** external_requests with the reference's label set
    * (metrics_manager.py:59) — call from any client that leaves the app
    * (schema registry, token endpoint, ...). */
  def recordExternalRequest(requestTo: String, requestEndpoint: String,
      requestType: String = "GET", isBulk: Boolean = false,
      statusCode: Int = 200): Unit =
    add(externalRequests,
      s"""request_to="$requestTo",request_endpoint="$requestEndpoint",""" +
        s"""request_type="$requestType",is_bulk="$isBulk",status_code="$statusCode"""", 1)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    p.sources.foreach(s => add(messagesConsumed, s.description, s.numInputRows))
    Option(p.sink).foreach(s => add(messagesProduced, s.description, s.numOutputRows))
    batchDurationSeconds = p.batchDuration / 1000.0
    val et = p.eventTime
    if (et != null && et.containsKey("max")) {
      try {
        val maxMs = java.time.Instant.parse(et.get("max")).toEpochMilli
        val trigMs = java.time.Instant.parse(p.timestamp).toEpochMilli
        secondsBehind = Some((trigMs - maxMs) / 1000.0)
      } catch { case _: Exception => () } // unparsable progress: keep last
    }
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
    externalRequests.asScala.foreach { case (labels, n) =>
      b ++= s"external_requests{$labels} ${n.sum()}\n" }
    secondsBehind.foreach(v => b ++= s"seconds_behind $v\n")
    b ++= s"batch_duration_seconds $batchDurationSeconds\n"
    b.result()
  }
}

/** Push-gateway loop (reference: fluvii/components/metrics/pusher/
  * metrics_pusher.py:52-66): a daemon thread pushing the scrape text on an
  * interval through a pluggable push function (prometheus push_to_gateway
  * there; any HTTP POST here — kept a function so offline tests stub it).
  * Push failures are logged and the loop continues, like the reference. */
final class MetricsPusher(
    scrape: () => String,
    push: String => Unit,
    pushIntervalMillis: Long = 10000) {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  @volatile private var running = false
  private var thread: Thread = _

  def start(): Unit = synchronized {
    if (!running) {
      running = true
      thread = new Thread(() => loop(), "graft-metrics-pusher")
      thread.setDaemon(true)
      thread.start()
    }
  }

  def stop(): Unit = synchronized {
    running = false
    if (thread != null) { thread.interrupt(); thread = null }
  }

  private def loop(): Unit =
    try while (running) {
      Thread.sleep(pushIntervalMillis)
      if (running)
        try push(scrape())
        catch { case e: Exception => log.warn(s"metrics push failed: ${e.getMessage}") }
    } catch { case _: InterruptedException => () }
}
