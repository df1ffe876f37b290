package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Event-time windowing (SURVEY.md §2.9 X3/X4 — absent in the reference,
  * which concedes missing "rolling table windows" in its Faust comparison,
  * README.md:687; supplied by Spark's window()/session_window()).
  *
  * These are the batch twins of the streaming aggregations (the streaming
  * forms with watermarks run in ScalaTest over MemoryStream); window starts
  * are emitted as epoch seconds so the DuckDB oracle compares integers, not
  * timestamp encodings.
  */
object Windows {

  private def eventTime = Tables.nanosToTimestamp(col("ts"))

  /** Tumbling 1-hour windows per event type. */
  def tumblingQuery(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(eventTime.as("et"), col("event_type"), col("value"))
      .groupBy(window(col("et"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Session windows per user with a 30-minute inactivity gap. */
  def sessionQuery(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(eventTime.as("et"), col("user_id"), col("value"))
      .groupBy(col("user_id"), session_window(col("et"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Sliding windows (1 h length, 30 min slide) — global event counts. */
  def slidingQuery(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(eventTime.as("et"), col("value"))
      .groupBy(window(col("et"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("n"), col("sum_value"))
      .orderBy(col("window_start"))
}
