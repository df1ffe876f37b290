package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.streaming.GraftMetricsListener

case class Ev(et: Timestamp, event_type: String, value: Double)

/** Streaming forms of the windowed aggregations: watermarks, late-data
  * dropping, streaming==batch equivalence, and the metrics listener. */
class WindowsStreamingSpec extends AnyFunSuite {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("streaming tumbling agg (complete mode) == batch agg") {
    val input = MemoryStream[Ev](spark)
    val agg = input.toDS()
      .groupBy(window(col("et"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("tumb_out")
      .outputMode("complete").start()
    try {
      val evs = Seq(Ev(t(0), "a", 1), Ev(t(10), "a", 2), Ev(t(70), "b", 3), Ev(t(80), "a", 4))
      input.addData(evs.take(2)); q.processAllAvailable()
      input.addData(evs.drop(2)); q.processAllAvailable()
      val streamed = spark.table("tumb_out").as[(Long, String, Long)].collect().toSet
      val batch = evs.toDS()
        .groupBy(window(col("et"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")), col("event_type"), col("n"))
        .as[(Long, String, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming exact dedup (dropDuplicatesWithinWatermark) == batch distinct") {
    // the streaming twin of dd01: duplicates replayed across microbatches
    // inside the watermark horizon are emitted once; state is bounded by
    // the watermark (unlike plain dropDuplicates, whose state only grows)
    val input = MemoryStream[Ev](spark)
    val dedup = input.toDS()
      .withWatermark("et", "2 hours")
      .dropDuplicatesWithinWatermark("event_type", "value")
      .select(col("event_type"), col("value"))
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(Seq(Ev(t(0), "a", 1), Ev(t(1), "a", 1), Ev(t(2), "b", 2)))
      q.processAllAvailable()
      // same logical rows replayed in a later microbatch, still in horizon
      input.addData(Seq(Ev(t(3), "a", 1), Ev(t(4), "b", 2), Ev(t(5), "c", 3)))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").as[(String, Double)].collect().toSeq
      assert(rows.sorted == Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)))
    } finally q.stop()
  }

  test("watermark drops data later than the delay (X3)") {
    val input = MemoryStream[Ev](spark)
    val agg = input.toDS()
      .withWatermark("et", "10 minutes")
      .groupBy(window(col("et"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      input.addData(Seq(Ev(t(0), "a", 1), Ev(t(5), "a", 1))); q.processAllAvailable()
      // advance event time far past window [0,30) + delay => it finalizes
      input.addData(Seq(Ev(t(120), "a", 1))); q.processAllAvailable()
      // this event is > 10 min behind the watermark: must be DROPPED
      input.addData(Seq(Ev(t(1), "late", 99))); q.processAllAvailable()
      input.addData(Seq(Ev(t(240), "a", 1))); q.processAllAvailable()
      val finalized = spark.table("wm_out").as[(Long, Long)].collect().toMap
      val w0 = (1700000000L / 1800) * 1800 // epoch-aligned 30-min window start
      assert(finalized(w0) == 2, s"late row leaked into finalized window: $finalized")
    } finally q.stop()
  }

  test("metrics listener exposes the reference metric names (X8/§2.12)") {
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    val input = MemoryStream[Ev](spark)
    val q = input.toDS().writeStream.format("memory")
      .queryName("metrics_out").outputMode("append").start()
    try {
      input.addData(Seq(Ev(t(0), "a", 1), Ev(t(1), "b", 2)))
      q.processAllAvailable()
      // listener events are async — wait briefly for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (listener.messagesConsumed.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val scrape = listener.scrape()
      assert(scrape.contains("messages_consumed{topic="), scrape)
      // no event time tracked on this query -> the lag metric must NOT be
      // fabricated from batch duration; that has its own honest name
      assert(!scrape.contains("seconds_behind"), scrape)
      assert(scrape.contains("batch_duration_seconds"), scrape)
      assert(listener.messagesConsumed.values().iterator().next().sum() >= 2)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("seconds_behind is genuine event-time lag; pusher pushes the scrape") {
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    val input = MemoryStream[Ev](spark)
    // watermarked aggregation => progress carries eventTime.max
    val agg = input.toDS().withWatermark("et", "1 minute")
      .groupBy(window(col("et"), "30 minutes")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("lag_out")
      .outputMode("append").start()
    try {
      input.addData(Seq(Ev(t(0), "a", 1), Ev(t(5), "a", 2)))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 10000
      while (listener.secondsBehind.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      // events are stamped at epoch 1700000000 (Nov 2023) — the genuine lag
      // to wall clock is years, not a batch duration of milliseconds
      val lag = listener.secondsBehind.getOrElse(fail("no seconds_behind published"))
      assert(lag > 1e6, s"lag=$lag does not look like event-time lag")
      assert(listener.scrape().contains(s"seconds_behind "), listener.scrape())

      // external_requests with the reference's label set
      listener.recordExternalRequest("schema-registry", "/subjects", "POST")
      assert(listener.scrape().contains(
        """external_requests{request_to="schema-registry",request_endpoint="/subjects","""),
        listener.scrape())

      // pusher: periodic scrape through the pluggable push fn
      val pushes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val pusher = new graft.streaming.MetricsPusher(
        () => listener.scrape(), s => pushes.add(s), pushIntervalMillis = 50)
      pusher.start()
      val pushDeadline = System.currentTimeMillis() + 10000
      while (pushes.isEmpty && System.currentTimeMillis() < pushDeadline)
        Thread.sleep(50)
      pusher.stop()
      assert(!pushes.isEmpty, "pusher never pushed")
      assert(pushes.peek().contains("messages_consumed"), pushes.peek())
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
