package graft.state

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.core.Tables

/** ev06's CONTINUOUS form — last-touch attribution as a running service
  * (the shape a production marketing pipeline actually deploys: conversions
  * must be attributed as they arrive, not in a nightly batch). Keyed state
  * per user is ONE [[AttributionStream.Touch]] — the most recent qualifying
  * touch — so the store is O(users), not O(events): the streaming twin of
  * the batch query's running struct-max frame
  * ([[graft.operators.Windows.attributionQuery]]).
  *
  * The dd12 shared-fold discipline: [[AttributionStream.processUser]] is
  * the ONE fold both backends run — the batch form replays each user's
  * whole history through it with empty initial state (flatMapGroups), the
  * streaming form runs it per microbatch over the durable ValueState
  * (transformWithState) — so batch/stream equality is structural, proven
  * on replay increments in AttributionStreamSpec, and the batch form is
  * itself pinned equal to the oracle-checked window query.
  *
  * Arrival-order contract (same as [[NearDupStream]]): order across
  * microbatches is the replay order (ascending event time); within a
  * microbatch the fold sorts by (tus, event_id). A touch at the exact
  * conversion timestamp orders AFTER the purchase only by event_id — the
  * same (tus, id) total order the batch frame uses. */
object AttributionStream {

  case class Ev(user_id: Long, event_id: Long, event_type: String, tus: Long)
  case class Touch(tus: Long, id: Long, ty: String)
  case class Attribution(purchase_id: Long, user_id: Long, purchase_us: Long,
      touch_id: Option[Long], touch_type: Option[String],
      gap_secs: Option[Long])

  /** ev06's default 3-day lookback. */
  val DefaultLookbackSecs = 259200L

  /** The shared fold: one user's events in (tus, event_id) order against
    * the carried last-touch state. Touches update the state; purchases
    * emit an attribution from the state as of strictly-before themselves
    * (the update happens after the emit for an equal-sort-key touch can
    * never occur — types are disjoint, so the (tus, id) sort decides). */
  def processUser(last0: Option[Touch], rows: Iterator[Ev],
      lookbackUs: Long): (Option[Touch], Seq[Attribution]) = {
    val sorted = rows.toVector.sortBy(e => (e.tus, e.event_id))
    var last = last0
    val out = Vector.newBuilder[Attribution]
    sorted.foreach { e =>
      if (e.event_type == "purchase") {
        val eligible = last.filter(t => e.tus - t.tus <= lookbackUs)
        out += Attribution(e.event_id, e.user_id, e.tus,
          eligible.map(_.id), eligible.map(_.ty),
          eligible.map(t => (e.tus - t.tus) / 1000000L))
      } else if (e.event_type == "click" || e.event_type == "view") {
        last = Some(Touch(e.tus, e.event_id, e.event_type))
      }
    }
    (last, out.result())
  }

  /** Batch backend: every user's whole history is one group, the fold runs
    * with empty initial state — plain flatMapGroups, shuffle keyed by user
    * exactly like the streaming plan. AttributionStreamSpec pins this equal
    * to the oracle-checked [[graft.operators.Windows.attributionQuery]]. */
  def attributionFold(s: SparkSession, dir: String,
      lookbackSecs: Long = DefaultLookbackSecs): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us").as("tus"))
      .filter(col("event_type").isin("purchase", "click", "view"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroups((_: Long, rows: Iterator[Ev]) =>
        processUser(None, rows, lookbackSecs * 1000000L)._2.iterator)
      .toDF()
      .orderBy(col("purchase_id"))
  }

  /** Streaming backend: the same fold over durable per-user ValueState. */
  def attributionStream(events: Dataset[Ev],
      lookbackSecs: Long = DefaultLookbackSecs): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new LastTouchProcessor(lookbackSecs * 1000000L),
        TimeMode.None(), OutputMode.Append())
  }
}

/** The per-user last-touch store as a [[StatefulProcessor]]: ValueState of
  * the single most recent touch — bounded per key by construction (no cap
  * or TTL needed for correctness; a retention TTL would only matter to
  * forget users entirely, which the lookback window already subsumes
  * semantically since an aged touch can never attribute). */
private[state] final class LastTouchProcessor(lookbackUs: Long)
    extends StatefulProcessor[Long, AttributionStream.Ev, AttributionStream.Attribution] {
  import AttributionStream.{Attribution, Ev, Touch, processUser}

  @transient private var store: ValueState[Touch] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    store = getHandle.getValueState[Touch]("lastTouch",
      Encoders.product[Touch], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Attribution] = {
    val last0 = if (store.exists()) Some(store.get()) else None
    val (last, out) = processUser(last0, rows, lookbackUs)
    last.foreach(store.update)
    out.iterator
  }
}
