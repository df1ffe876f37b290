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

  private def eventTime = col("ts") // TimestampType, normalized by Tables.events

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

  /** Conversion funnel (ordered-sequence analytics): per user, the first
    * 'signup' and the first 'purchase' at-or-after it, whether the user
    * converted, and the integer seconds in between. Times stay in epoch
    * micros (the canonical `ts_us` key) so the comparison and the difference
    * are exact integer arithmetic on both engines.
    *
    * Plan shape for 100 TB: two event-type-filtered scans each reduced by a
    * map-side-combined min per user, then user-keyed joins — the exchanges
    * carry one row per user, never the raw event stream; no window over the
    * full event sequence is ever materialized. */
  def funnelQuery(s: SparkSession, dir: String): DataFrame = {
    // epoch MICROS both sides (ts_us == DuckDB's epoch_us(ts) exactly — see
    // Tables.events) so both engines apply identical at-or-after semantics
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us").as("tus"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("tus")).as("signup_us"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus").as("pus"))
      .join(signup, "user_id")
      .filter(col("pus") >= col("signup_us"))
      .groupBy(col("user_id")).agg(min(col("pus")).as("purchase_us"))
    signup.join(purchase, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_us"), col("purchase_us"),
        col("purchase_us").isNotNull.as("converted"),
        expr("(purchase_us - signup_us) div 1000000").as("secs_to_convert"))
      .orderBy(col("user_id"))
  }

  /** DuckDB SQL replicating [[funnelQuery]] exactly. */
  val funnelOracleSql: String = """
      WITH s AS (SELECT user_id, min(epoch_us(ts)) AS signup_us
                 FROM events WHERE event_type = 'signup' GROUP BY user_id),
      p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS purchase_us
            FROM events e JOIN s USING (user_id)
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
            GROUP BY e.user_id)
      SELECT s.user_id, s.signup_us, p.purchase_us,
             p.purchase_us IS NOT NULL AS converted,
             (p.purchase_us - s.signup_us) // 1000000 AS secs_to_convert
      FROM s LEFT JOIN p USING (user_id) ORDER BY s.user_id"""

  /** Cohort retention (the cohort x day-offset matrix every product
    * analytics stack computes): users are bucketed by first-activity day;
    * for each (cohort_day, day_offset) the count of cohort members active
    * that day. Days are exact integer micros-div-86400e6 — no timezone or
    * calendar arithmetic, identical in every engine.
    *
    * Plan shape for 100 TB: activity reduces to distinct (user, day) pairs
    * with a map-side-combined aggregate BEFORE anything else (the raw event
    * stream is touched once); cohorts are a per-user min over those pairs;
    * the user-keyed join reuses the same shuffle key; the final matrix agg
    * is over (cohort, offset) cardinality. Nothing downstream of the first
    * aggregate scales with raw event volume. */
  def retentionQuery(s: SparkSession, dir: String): DataFrame = {
    val userDays = Tables.events(s, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val cohorts = userDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    userDays.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** DuckDB SQL replicating [[retentionQuery]] exactly (count(*) == count
    * distinct users here because the (user, day) pairs are pre-distinct). */
  val retentionOracleSql: String = """
      WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                  FROM events),
      c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
      SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
             CAST(count(*) AS BIGINT) AS n_users
      FROM ud JOIN c USING (user_id)
      GROUP BY c.cohort_day, day_offset
      ORDER BY cohort_day, day_offset"""

  /** Event-type transition matrix (first-order Markov analytics over the
    * event stream): for every ordered pair of consecutive events of the
    * same user, the transition count and probability
    * P(to | from) = n(from, to) / n(from, *).
    *
    * Plan shape for 100 TB: ONE shuffle of the event stream, keyed by
    * user_id (the window's partition key); the lead() pass emits one row
    * per event, immediately reduced by a map-side-combined count into at
    * most |types|^2 rows. The probability normalization is a window over
    * that tiny matrix — nothing downstream of the per-user window scales
    * with event volume. Times stay in exact integer micros (the
    * cross-engine resolution — see [[funnelQuery]]). */
  def transitionsQuery(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us").as("tus"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") / sum(col("n")).over(wf).cast("double"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** The transition-matrix CTE chain shared by the ev03 and ev11 oracles
    * (ONE derivation, so the compositions cannot drift): `e` (events with
    * integer microsecond timestamps), `c` (integer transition counts) and
    * `tm` (the matrix with its exact-ratio probability). */
  private val transitionsCtesSql: String = """e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
                 FROM events),
      tp AS (SELECT event_type AS from_type,
                   lead(event_type, 1) OVER (PARTITION BY user_id
                     ORDER BY tus, event_id) AS to_type
            FROM e),
      c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
            FROM tp WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      tm AS (SELECT from_type, to_type, n,
               CAST(n AS DOUBLE) /
                 CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
             FROM c)"""

  /** DuckDB SQL replicating [[transitionsQuery]] exactly (the n/total
    * division is one IEEE op over exact integers — no rounding needed). */
  val transitionsOracleSql: String = s"""
      WITH $transitionsCtesSql
      SELECT from_type, to_type, n, p
      FROM tm ORDER BY from_type, to_type"""

  /** ev11 — Markov next-event prediction: train the first-order transition
    * matrix ([[transitionsQuery]]'s derivation, shared code path) and
    * predict every user's NEXT event as the argmax row of their LAST
    * event's transition distribution — the classic "what does this user do
    * next" scorer (and the sequence-model baseline an event pipeline ships
    * before anything learned).
    *
    * Determinism: the argmax ranks on the exact integer count n (same
    * order as p within a from_type — the denominator is shared), tie-break
    * to_type ascending; the last event per user ranks on (tus DESC,
    * event_id DESC) — all integer keys. The probability is the exact
    * integer ratio ev03 emits (one IEEE division, no rounding needed).
    *
    * Plan shape for 100 TB: the matrix aggregate reduces to |types|² cells
    * (map-side combined) and its argmax is a window over those cells —
    * broadcast-sized by construction; the last-event pass reuses the ONE
    * user-keyed exchange every ev-family query shares; the final join
    * broadcasts the |types|-row prediction table. The event stream never
    * shuffles twice. */
  def markovNextQuery(s: SparkSession, dir: String): DataFrame = {
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type")).orderBy(col("n").desc, col("to_type"))
    val best = transitionsQuery(s, dir)
      .withColumn("rn", row_number().over(wb))
      .filter(col("rn") === 1)
      .select(col("from_type"), col("to_type").as("pred_type"),
        col("p").as("prob"))
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("tus").desc, col("event_id").desc)
    val last = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us").as("tus"))
      .withColumn("rn", row_number().over(wl))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"))
    last.join(broadcast(best), col("last_type") === col("from_type"), "left")
      .select(col("user_id"), col("last_type"), col("pred_type"), col("prob"))
      .orderBy(col("user_id"))
  }

  /** DuckDB SQL replicating [[markovNextQuery]] exactly (the shared
    * [[transitionsCtesSql]] matrix, the same integer-keyed argmax and
    * last-event windows, LEFT join for a terminal-only last type). */
  val markovNextOracleSql: String = s"""
      WITH $transitionsCtesSql,
      best AS (SELECT from_type, to_type AS pred_type, p AS prob FROM (
                 SELECT *, row_number() OVER (PARTITION BY from_type
                   ORDER BY n DESC, to_type) AS rn FROM tm) z WHERE rn = 1),
      last AS (SELECT user_id, event_type AS last_type FROM (
                 SELECT user_id, event_type,
                        row_number() OVER (PARTITION BY user_id
                          ORDER BY tus DESC, event_id DESC) AS rn
                 FROM e) z WHERE rn = 1)
      SELECT l.user_id, l.last_type, b.pred_type, b.prob
      FROM last l LEFT JOIN best b ON l.last_type = b.from_type
      ORDER BY l.user_id"""

  /** ev12 — per-user event cadence: count, LOWER-median / max / mean
    * inter-event gap in microseconds — the activity-rhythm profile behind
    * engagement scoring and bot detection (a human's median gap is minutes
    * to hours; a scripted client's collapses toward a constant). The
    * median is the lower median (element ceil(n/2) of the sorted gaps) so
    * it stays an EXACT integer — no cross-engine averaging of middles.
    *
    * Determinism: gaps are exact integer differences of the (tus,
    * event_id)-ordered stream; median/max index into the sorted gap list
    * (integer arithmetic); the mean folds the sorted list into an exact
    * integer sum, then ONE IEEE division. Nothing rounds.
    *
    * Plan shape for 100 TB: the ONE user-keyed exchange every ev-family
    * query shares — the lag and the gap aggregate both ride it; per-user
    * state is the user's own gap list (bounded by per-user activity, the
    * same bound sessionization already carries). */
  def cadenceQuery(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val gs = col("gs")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us").as("tus"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(col("gap"))).as("gs"))
      .select(col("user_id"), col("n_events"),
        when(size(gs) > 0,
          element_at(gs, ((size(gs) + 1) / 2).cast("int"))).as("median_gap_us"),
        when(size(gs) > 0, element_at(gs, size(gs))).as("max_gap_us"),
        when(size(gs) > 0,
          aggregate(gs, lit(0L), (a, x) => a + x).cast("double") /
            size(gs).cast("double")).as("mean_gap_us"))
      .orderBy(col("user_id"))
  }

  /** DuckDB SQL replicating [[cadenceQuery]] exactly (same ordered gap
    * stream, same lower-median index arithmetic, same exact-sum mean). */
  val cadenceOracleSql: String = """
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
      g AS (SELECT user_id,
                   tus - lag(tus, 1) OVER (PARTITION BY user_id
                     ORDER BY tus, event_id) AS gap
            FROM e),
      a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   list(gap ORDER BY gap) FILTER (WHERE gap IS NOT NULL) AS gs
            FROM g GROUP BY user_id)
      SELECT user_id, n_events,
             CASE WHEN len(gs) > 0
                  THEN gs[CAST((len(gs) + 1) // 2 AS INT)] END AS median_gap_us,
             CASE WHEN len(gs) > 0 THEN gs[len(gs)] END AS max_gap_us,
             CASE WHEN len(gs) > 0
                  THEN CAST(list_sum(gs) AS DOUBLE) / CAST(len(gs) AS DOUBLE)
             END AS mean_gap_us
      FROM a ORDER BY user_id"""

  /** ev13 — time-to-convert by acquisition cohort: for every user whose
    * first purchase follows their first view, the lag between the two, then
    * per cohort day (the date of the first view) the converting-user count
    * and the exact lower-median / max / mean lag. The funnel (ev01) says
    * WHETHER users convert; this says HOW FAST, per cohort — the curve a
    * growth dashboard plots.
    *
    * Determinism: first-view/first-purchase are integer mins; lag is
    * integer; median/max index into the sorted lag list (integer
    * arithmetic); the mean folds the sorted list to an exact integer sum
    * then does ONE IEEE division. Cohort day = UTC date of the first-view
    * micros on both engines.
    *
    * Plan shape for 100 TB: ONE user-keyed exchange (the same one the
    * whole ev family rides) with map-side partial min aggregation — the
    * conditional firsts need no window — then a cohort-day aggregate over
    * one row per converting user (users × ~16 bytes, trivially small).
    * Per-cohort state is the lag list, bounded by converters-per-day. */
  def conversionLagQuery(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts_us"))).as("fv_us"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("fp_us"))
      .filter(col("fv_us").isNotNull && col("fp_us").isNotNull &&
        col("fp_us") >= col("fv_us"))
      .select(
        to_date(timestamp_micros(col("fv_us"))).as("cohort_day"),
        (col("fp_us") - col("fv_us")).as("lag_us"))
    val gs = col("gs")
    perUser.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_converted"),
        sort_array(collect_list(col("lag_us"))).as("gs"))
      .select(col("cohort_day"), col("n_converted"),
        element_at(gs, ((size(gs) + 1) / 2).cast("int")).as("median_lag_us"),
        element_at(gs, size(gs)).as("max_lag_us"),
        (aggregate(gs, lit(0L), (a, x) => a + x).cast("double") /
          size(gs).cast("double")).as("mean_lag_us"))
      .orderBy(col("cohort_day"))
  }

  /** DuckDB SQL replicating [[conversionLagQuery]] exactly (same integer
    * firsts, same lower-median index arithmetic, same exact-sum mean;
    * `make_timestamp(us)` is UTC like Spark's `timestamp_micros` under the
    * session's UTC timezone). */
  val conversionLagOracleSql: String = """
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus
                 FROM events WHERE event_type IN ('view', 'purchase')),
      u AS (SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN tus END) AS fv_us,
                   min(CASE WHEN event_type = 'purchase' THEN tus END) AS fp_us
            FROM e GROUP BY user_id),
      c AS (SELECT CAST(make_timestamp(fv_us) AS DATE) AS cohort_day,
                   fp_us - fv_us AS lag_us
            FROM u
            WHERE fv_us IS NOT NULL AND fp_us IS NOT NULL AND fp_us >= fv_us),
      a AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_converted,
                   list(lag_us ORDER BY lag_us) AS gs
            FROM c GROUP BY cohort_day)
      SELECT cohort_day, n_converted,
             gs[CAST((len(gs) + 1) // 2 AS INT)] AS median_lag_us,
             gs[len(gs)] AS max_lag_us,
             CAST(list_sum(gs) AS DOUBLE) / CAST(len(gs) AS DOUBLE)
               AS mean_lag_us
      FROM a ORDER BY cohort_day"""

  /** Rolling z-score anomaly flags (streaming-telemetry style): each event's
    * value against the mean/stddev of the SAME USER's previous 10 events —
    * the trailing frame deliberately excludes the current row, so the
    * baseline cannot absorb the anomaly it is judging.
    *
    * Plan shape for 100 TB: one exchange keyed by user_id and one in-task
    * sort; the bounded ROWS frame keeps per-row state at 10 values
    * regardless of history length (an UNBOUNDED frame would too, but a
    * trailing window is also what a streaming twin with keyed state would
    * maintain).
    *
    * Determinism: floating-point windowed avg/stddev are summation-order-
    * dependent (engines use different frame algorithms — a 4dp rounding of
    * avg() still flipped at a rounding boundary in testing). The values are
    * 2-decimal quantities, so the moments are computed as EXACT integer
    * sums of cents (Σc, Σc²) — order-independent under any partitioning —
    * and converted to mean/stddev by a fixed IEEE op sequence both engines
    * execute identically. No rounding anywhere. */
  def rollingZscoreQuery(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      .rowsBetween(-10, -1)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts_us").as("tus"))
      .withColumn("c", round(col("value") * 100, 0).cast("long"))
      .withColumn("n", count(col("c")).over(w))
      .withColumn("sc", sum(col("c")).over(w))
      .withColumn("sc2", sum(col("c") * col("c")).over(w))
      .select(col("user_id"), col("event_id"), col("c"),
        when(col("n") > 0,
          (col("sc").cast("double") / col("n").cast("double")) / 100.0).as("mu"),
        when(col("n") > 1,
          sqrt((col("n") * col("sc2") - col("sc") * col("sc")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double")) / 100.0).as("sd"))
      // a constant baseline (sd == 0) makes ANY deviation an anomaly — the
      // clearest spike class must not fall through to NULL; NULL only when
      // the frame is too short to have a deviation at all (n < 2)
      .withColumn("is_anomaly",
        when(col("sd").isNotNull,
          when(col("sd") > 0,
            abs(col("c").cast("double") / 100.0 - col("mu")) > col("sd") * 3.0)
          .otherwise(col("c").cast("double") / 100.0 =!= col("mu"))))
      .select(col("user_id"), col("event_id"), col("mu"), col("sd"),
        col("is_anomaly"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** DuckDB SQL replicating [[rollingZscoreQuery]] exactly (same integer
    * moment sums, same IEEE conversion sequence). */
  val rollingZscoreOracleSql: String = """
      WITH e AS (SELECT user_id, event_id,
                        CAST(round(value * 100, 0) AS BIGINT) AS c,
                        epoch_us(ts) AS tus
                 FROM events),
      m AS (SELECT user_id, event_id, c,
              count(c) OVER w AS n,
              CAST(sum(c) OVER w AS BIGINT) AS sc,
              CAST(sum(c * c) OVER w AS BIGINT) AS sc2
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
                         ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
      r AS (SELECT user_id, event_id, c,
              CASE WHEN n > 0
                   THEN (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 END AS mu,
              CASE WHEN n > 1
                   THEN sqrt(CAST(n * sc2 - sc * sc AS DOUBLE) /
                             CAST(n * (n - 1) AS DOUBLE)) / 100.0 END AS sd
            FROM m)
      SELECT user_id, event_id, mu, sd,
             CASE WHEN sd IS NOT NULL THEN
               CASE WHEN sd > 0
                    THEN abs(CAST(c AS DOUBLE) / 100.0 - mu) > sd * 3.0
                    ELSE CAST(c AS DOUBLE) / 100.0 <> mu END
             END AS is_anomaly
      FROM r ORDER BY user_id, event_id"""

  /** Gap-based sessionization, the BATCH form (the replayable twin of the
    * streaming `session_window` in [[sessionQuery]]): per user, events are
    * segmented into sessions wherever the gap to the previous event exceeds
    * `gapSecs`, and each session reduces to its span, event count and
    * distinct-type count. Unlike [[sessionQuery]] (which keys sessions by
    * their merged window start), this emits the per-user ordinal session
    * index — the form downstream user-journey joins consume.
    *
    * Times stay in exact integer epoch micros (`ts_us`) so the gap
    * comparison, the span and the duration are identical integer arithmetic
    * in both engines; `(tus, event_id)` ordering is unique, so the running
    * session index is fully deterministic.
    *
    * Plan shape for 100 TB: ONE exchange keyed by user_id and one in-task
    * sort serve both the lag() and the running-sum window (same
    * partition+order key); the session aggregate groups by
    * (user_id, session_idx) with map-side partial aggregation, so the
    * second exchange carries one row per session, not per event. Nothing
    * global: no window spans more than one user's slice. */
  /** The gap-rule session indexing shared by every session-consuming
    * operator (ev05 sessionize, ev08 path mining, ev10 bounce report):
    * events projected to (user_id, event_id, event_type, tus) with a
    * running `session_idx` per user — a new session starts when the gap to
    * the previous event exceeds `gapSecs`. ONE definition (and one oracle
    * CTE chain, [[sessionCtesSql]]) so the boundary rule cannot drift
    * between consumers. All windows partition by user_id only, so a
    * consumer's follow-up windows/aggregates reuse the same exchange. */
  private def sessionIndexed(s: SparkSession, dir: String,
      gapSecs: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val gapUs = gapSecs * 1000000L
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us").as("tus"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("boundary",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("boundary")).over(run))
      .drop("prev", "boundary")
  }

  /** The shared e/b/sx oracle CTE chain of [[sessionIndexed]], ending in
    * `sx(user_id, event_id, event_type, tus, session_idx)`. */
  private def sessionCtesSql(gapSecs: Long): String = s"""
      e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
                 FROM events),
      b AS (SELECT user_id, event_id, event_type, tus,
              CASE WHEN lag(tus, 1) OVER w IS NULL
                     OR tus - lag(tus, 1) OVER w > ${gapSecs}000000
                   THEN 1 ELSE 0 END AS boundary
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      sx AS (SELECT user_id, event_id, event_type, tus,
               CAST(sum(boundary) OVER (PARTITION BY user_id
                 ORDER BY tus, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS session_idx
             FROM b)"""

  def sessionizeQuery(s: SparkSession, dir: String, gapSecs: Long = 1800): DataFrame =
    sessionIndexed(s, dir, gapSecs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
      .withColumn("duration_secs", expr("(end_us - start_us) div 1000000"))
      .orderBy(col("user_id"), col("session_idx"))

  /** DuckDB SQL replicating [[sessionizeQuery]] exactly (gap = 1800 s; same
    * ROWS running frame, same integer micros arithmetic). */
  val sessionizeOracleSql: String = s"""
      WITH ${sessionCtesSql(1800)}
      SELECT user_id, session_idx,
             min(tus) AS start_us, max(tus) AS end_us,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
             (max(tus) - min(tus)) // 1000000 AS duration_secs
      FROM sx GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""

  /** Last-touch attribution (the marketing-analytics join every event
    * pipeline ends up writing): each conversion ('purchase') is attributed
    * to the SAME USER's most recent preceding touch ('click' or 'view'),
    * provided the touch happened within `lookbackSecs`; conversions with no
    * in-window touch stay unattributed (NULL touch columns).
    *
    * The "most recent preceding touch" is a running `max` over a
    * `(tus, event_id, event_type)` struct — lexicographic struct ordering
    * makes latest-timestamp-wins with an event_id tiebreak a SINGLE window
    * aggregate instead of a lag-scan, and the identical struct-max exists in
    * the SQL oracle, so the tie rules are structural, not re-implemented.
    * The frame ends at `-1 PRECEDING`: a touch at the exact conversion
    * timestamp does not attribute itself.
    *
    * Plan shape for 100 TB: ONE exchange keyed by user_id and one in-task
    * sort serve the running struct-max; the event stream is pre-projected to
    * four columns (never the props payload) and pre-filtered to the three
    * participating types, so the exchange carries only touch/conversion
    * rows. Nothing global, no join — the attribution is resolved inside the
    * per-user window. Times are exact integer epoch micros throughout. */
  def attributionQuery(s: SparkSession, dir: String,
      lookbackSecs: Long = 259200): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val lookbackUs = lookbackSecs * 1000000L
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us").as("tus"))
      .filter(col("event_type").isin("purchase", "click", "view"))
      .withColumn("touch",
        max(when(col("event_type") =!= "purchase",
          struct(col("tus").as("t"), col("event_id").as("id"),
            col("event_type").as("ty")))).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("in_window",
        col("touch").isNotNull && col("tus") - col("touch.t") <= lookbackUs)
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        col("tus").as("purchase_us"),
        when(col("in_window"), col("touch.id")).as("touch_id"),
        when(col("in_window"), col("touch.ty")).as("touch_type"),
        when(col("in_window"),
          expr("(tus - touch.t) div 1000000")).as("gap_secs"))
      .orderBy(col("purchase_id"))
  }

  /** DuckDB SQL replicating [[attributionQuery]] exactly (same struct-max
    * frame, same 3-day lookback, same integer micros arithmetic). */
  def attributionOracleSql(lookbackSecs: Long = 259200): String = s"""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
                 FROM events
                 WHERE event_type IN ('purchase', 'click', 'view')),
      t AS (SELECT user_id, event_id, event_type, tus,
              max(CASE WHEN event_type <> 'purchase'
                       THEN struct_pack(t := tus, id := event_id,
                                        ty := event_type) END)
                OVER (PARTITION BY user_id ORDER BY tus, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS touch
            FROM e),
      p AS (SELECT *,
              touch IS NOT NULL AND
                tus - touch.t <= ${lookbackSecs}000000 AS in_window
            FROM t WHERE event_type = 'purchase')
      SELECT event_id AS purchase_id, user_id, tus AS purchase_us,
             CASE WHEN in_window THEN touch.id END AS touch_id,
             CASE WHEN in_window THEN touch.ty END AS touch_type,
             CASE WHEN in_window THEN (tus - touch.t) // 1000000 END
               AS gap_secs
      FROM p ORDER BY purchase_id"""

  /** Daily heavy hitters (the "trending entities" query of every event
    * pipeline): per day, the `k` most active users with their event counts
    * and ranks. Exact integer counts, rank ties on user_id — fully
    * deterministic cross-engine.
    *
    * Plan shape for 100 TB: the event stream collapses to (day, user)
    * counts via ONE map-side-combined aggregate; the per-day top-k is a
    * window that Catalyst's InferWindowGroupLimit cuts to k rows per map
    * task BEFORE the day-keyed exchange (pinned in PlanAuditSpec) — the
    * exact-count analog of what a space-saving sketch would stream. Days
    * are exact integer micros-div-86400e6. */
  def heavyHittersQuery(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("n_events").desc, col("user_id"))
    Tables.events(s, dir)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .groupBy(col("day"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy(col("day"), col("rnk"))
  }

  /** DuckDB SQL replicating [[heavyHittersQuery]] exactly (k = 3). */
  val heavyHittersOracleSql: String = """
      WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id,
                        CAST(count(*) AS BIGINT) AS n_events
                 FROM events GROUP BY day, user_id)
      SELECT day, user_id, n_events, rnk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY day
                    ORDER BY n_events DESC, user_id) AS BIGINT) AS rnk
        FROM c) z
      WHERE rnk <= 3 ORDER BY day, rnk"""

  /** ev08 — session path mining: the `k` most frequent length-3 event-type
    * sequences taken by users WITHIN a session (the [[sessionizeQuery]]
    * gap rule), e.g. `view>click>purchase` — the "what journeys happen"
    * query behind funnel design and anomaly triage.
    *
    * Every window (the session boundary running-sum AND the two leads)
    * partitions by user_id only — session membership is enforced by
    * DISCARDING trigrams whose 2-ahead row crossed a session boundary
    * (lead(session_idx, 2) != session_idx), not by re-partitioning on
    * (user, session): ONE exchange + one in-task sort serve everything.
    * Exact integer counts, ties on path string — fully deterministic.
    *
    * Plan shape for 100 TB: the user-keyed exchange carries (user_id,
    * event_type, tus, event_id) only; trigram counting is a map-side-
    * combined aggregate over path strings (vocabulary-scale: |types|³
    * distinct keys), and the top-k is TakeOrderedAndProject — the corpus
    * is never globally sorted. */
  def pathNgramsQuery(s: SparkSession, dir: String, gapSecs: Long = 1800,
      k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    sessionIndexed(s, dir, gapSecs)
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .withColumn("s3", lead(col("session_idx"), 2).over(w))
      .filter(col("s3") === col("session_idx"))
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** DuckDB SQL replicating [[pathNgramsQuery]] exactly (gap = 1800 s,
    * k = 20; same single-partition-key window discipline). */
  val pathNgramsOracleSql: String = s"""
      WITH ${sessionCtesSql(1800)},
      tri AS (SELECT event_type AS t1,
                lead(event_type, 1) OVER w AS t2,
                lead(event_type, 2) OVER w AS t3,
                session_idx,
                lead(session_idx, 2) OVER w AS s3
              FROM sx
              WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
      SELECT t1 || '>' || t2 || '>' || t3 AS path,
             CAST(count(*) AS BIGINT) AS n
      FROM tri WHERE s3 = session_idx
      GROUP BY path ORDER BY n DESC, path LIMIT 20"""

  val EwmaAlpha = 0.3
  val EwmaHorizon = 14

  /** ev09 — EWMA volume anomaly (the trailing-smoother complement of
    * dq04's global z-score): per event type and day, the exponentially-
    * weighted moving average of the last `horizon` OBSERVED daily counts
    * (weights (1−α)^h, normalized over the lags that exist, so early days
    * are unbiased), the day's ratio to it, and the 2×/0.5× anomaly flag —
    * the standard ops-dashboard "is today's volume weird" statistic.
    *
    * Determinism: weights are Scala-computed doubles interpolated into
    * the oracle via shortest-round-trip decimal strings (bit-identical
    * parse); numerator and denominator are FIXED left-to-right chains in
    * lag order h=0..H−1 on both sides; ewma and ratio round 6dp and the
    * flag reads the ROUNDED ratio.
    *
    * Plan shape for 100 TB: the event stream collapses to the (type, day)
    * matrix via one map-side-combined aggregate (dq04's shape); the EWMA
    * is `horizon` lags over ONE type-keyed window — matrix-scale work
    * (|types|×|days|), corpus-scale never re-exchanges. */
  def ewmaAnomalyQuery(s: SparkSession, dir: String, alpha: Double = EwmaAlpha,
      horizon: Int = EwmaHorizon): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val weights = (0 until horizon).map(h => math.pow(1.0 - alpha, h))
    val num = (0 until horizon).map { h =>
      val x = if (h == 0) col("n") else lag(col("n"), h).over(w)
      when(x.isNotNull, x.cast("double") * lit(weights(h))).otherwise(lit(0.0))
    }.reduce(_ + _)
    val den = (0 until horizon).map { h =>
      val x = if (h == 0) col("n") else lag(col("n"), h).over(w)
      when(x.isNotNull, lit(weights(h))).otherwise(lit(0.0))
    }.reduce(_ + _)
    Tables.events(s, dir)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("ewma", round(num / den, 6))
      .withColumn("ratio", round(col("n").cast("double") / col("ewma"), 6))
      .withColumn("anomaly", col("ratio") > 2.0 || col("ratio") < 0.5)
      .orderBy(col("event_type"), col("day"))
  }

  /** DuckDB SQL replicating [[ewmaAnomalyQuery]] exactly: the SAME weight
    * doubles (interpolated from the Scala computation) in the SAME
    * left-to-right chain. */
  def ewmaAnomalyOracleSql(alpha: Double = EwmaAlpha,
      horizon: Int = EwmaHorizon): String = {
    val weights = (0 until horizon).map(h => math.pow(1.0 - alpha, h))
    def x(h: Int) = if (h == 0) "CAST(n AS DOUBLE)"
      else s"CAST(lag(n, $h) OVER w AS DOUBLE)"
    val num = (0 until horizon).map(h =>
      s"CASE WHEN ${x(h)} IS NOT NULL THEN ${x(h)} * ${weights(h)} ELSE 0.0 END")
      .mkString(" + ")
    val den = (0 until horizon).map(h =>
      s"CASE WHEN ${x(h)} IS NOT NULL THEN ${weights(h)} ELSE 0.0 END")
      .mkString(" + ")
    s"""
      WITH c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                        CAST(count(*) AS BIGINT) AS n
                 FROM events GROUP BY event_type, day),
      e AS (SELECT event_type, day, n,
              round(($num) / ($den), 6) AS ewma
            FROM c
            WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      r AS (SELECT *, round(CAST(n AS DOUBLE) / ewma, 6) AS ratio FROM e)
      SELECT event_type, day, n, ewma, ratio,
             ratio > 2.0 OR ratio < 0.5 AS anomaly
      FROM r ORDER BY event_type, day"""
  }

  /** ev10 — session entry/exit report: per ENTRY event type, how many
    * sessions start there, how many bounce (single-event sessions), the
    * bounce rate, and mean session size/duration — the landing-page
    * analytics readout over the [[sessionizeQuery]] gap rule.
    *
    * Entry and exit resolve as min/max over a (tus, event_id, type)
    * struct inside the session aggregate (latest/earliest-wins without a
    * second window — the attribution recipe). Means are exact integer
    * sums over exact counts: ONE division each, rounded 6dp; bounce rate
    * likewise.
    *
    * Plan shape for 100 TB: the user-keyed window exchange, then the
    * (user, session) aggregate (pre-combined map-side), then a
    * |entry-types|-scale report aggregate — event rows cross the wire
    * once. */
  def sessionBounceQuery(s: SparkSession, dir: String,
      gapSecs: Long = 1800): DataFrame = {
    val sessions = sessionIndexed(s, dir, gapSecs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(struct(col("tus"), col("event_id"), col("event_type"))).as("entry"),
        max(struct(col("tus"), col("event_id"), col("event_type"))).as("exit"),
        count(lit(1)).as("n_events"))
    sessions
      .select(col("entry.event_type").as("entry_type"),
        col("n_events"),
        (col("exit.tus") - col("entry.tus")).as("dur_us"))
      .groupBy(col("entry_type"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounces"),
        sum(col("n_events")).as("sum_events"),
        sum(col("dur_us")).as("sum_dur_us"))
      .select(col("entry_type"), col("n_sessions"), col("n_bounces"),
        round(col("n_bounces").cast("double") /
          col("n_sessions").cast("double"), 6).as("bounce_rate"),
        round(col("sum_events").cast("double") /
          col("n_sessions").cast("double"), 6).as("avg_events"),
        round((col("sum_dur_us").cast("double") /
          col("n_sessions").cast("double")) / lit(1000000.0), 6)
          .as("avg_duration_secs"))
      .orderBy(col("entry_type"))
  }

  /** DuckDB SQL replicating [[sessionBounceQuery]] exactly (gap = 1800 s;
    * same struct-min/max entry/exit, same exact-ratio means). */
  val sessionBounceOracleSql: String = s"""
      WITH ${sessionCtesSql(1800)},
      ses AS (SELECT user_id, session_idx,
                min(struct_pack(tus := tus, event_id := event_id,
                                event_type := event_type)) AS entry,
                max(struct_pack(tus := tus, event_id := event_id,
                                event_type := event_type)) AS exit,
                CAST(count(*) AS BIGINT) AS n_events
              FROM sx GROUP BY user_id, session_idx),
      agg AS (SELECT entry.event_type AS entry_type,
                CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_bounces,
                CAST(sum(n_events) AS BIGINT) AS sum_events,
                CAST(sum(exit.tus - entry.tus) AS BIGINT) AS sum_dur_us
              FROM ses GROUP BY 1)
      SELECT entry_type, n_sessions, n_bounces,
             round(CAST(n_bounces AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)
               AS bounce_rate,
             round(CAST(sum_events AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)
               AS avg_events,
             round((CAST(sum_dur_us AS DOUBLE) / CAST(n_sessions AS DOUBLE))
               / 1000000.0, 6) AS avg_duration_secs
      FROM agg ORDER BY entry_type"""

  /** ev14 — exponentially time-decayed engagement score per user: each
    * event contributes weight(type) · 2^(−age_days), age measured in whole
    * days back from the corpus' most recent event — the recency-weighted
    * "how alive is this user" signal behind churn models and audience
    * ranking (a purchase last night outscores ten views last month).
    * Weights: purchase 5, signup 3, click 2, view 1, error 0.
    *
    * Determinism: age_days is exact integer division of microsecond longs;
    * 2^(−n) is a power of two — EXACTLY representable in IEEE and computed
    * exactly by both engines' pow — so each term is exact; the per-user sum
    * folds terms in ascending (ts, event_id) order (the gr01 ordered-fold
    * recipe: the identical IEEE sequence as the oracle's
    * `list_sum(list(... ORDER BY ...))`), 6dp round on output only.
    *
    * Plan shape for 100 TB: the reference time is a 1-row max broadcast
    * back onto the scan (no second shuffle of the corpus); then ONE
    * user-keyed exchange serves the count, the last-seen min and the
    * ordered fold. Per-user state is that user's event list — the same
    * bound every ev-family aggregate carries. */
  def decayEngagementQuery(s: SparkSession, dir: String): DataFrame = {
    val w = when(col("event_type") === "purchase", 5)
      .when(col("event_type") === "signup", 3)
      .when(col("event_type") === "click", 2)
      .when(col("event_type") === "view", 1)
      .otherwise(0)
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us").as("tus"),
        w.cast("double").as("w"))
    val mx = e.agg(max(col("tus")).as("mt"))
    val terms = e.join(broadcast(mx))
      .withColumn("age_days", expr("(mt - tus) div 86400000000"))
      .withColumn("term",
        col("w") * pow(lit(2.0), -col("age_days").cast("double")))
    terms.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("age_days")).as("days_since_last"),
        aggregate(
          transform(array_sort(collect_list(
            struct(col("tus"), col("event_id"), col("term")))),
            x => x.getField("term")),
          lit(0.0d), (acc, x) => acc + x).as("raw"))
      .select(col("user_id"), col("n_events"), col("days_since_last"),
        round(col("raw"), 6).as("engagement"))
      .orderBy(col("user_id"))
  }

  /** DuckDB SQL replicating [[decayEngagementQuery]] exactly (same integer
    * day ages, same exact 2^(−n) terms, same ascending-(ts, event_id) fold
    * order, same 6dp round). */
  val decayEngagementOracleSql: String = """
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                   CAST(CASE event_type WHEN 'purchase' THEN 5
                     WHEN 'signup' THEN 3 WHEN 'click' THEN 2
                     WHEN 'view' THEN 1 ELSE 0 END AS DOUBLE) AS w
                 FROM events),
      mx AS (SELECT max(tus) AS mt FROM e),
      t AS (SELECT user_id, event_id, tus, (mt - tus) // 86400000000 AS age_days,
                   w * pow(2.0, -CAST((mt - tus) // 86400000000 AS DOUBLE)) AS term
            FROM e, mx)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(min(age_days) AS BIGINT) AS days_since_last,
             round(list_sum(list(term ORDER BY tus, event_id)), 6) AS engagement
      FROM t GROUP BY user_id ORDER BY user_id"""

  /** ev15 — one-sided CUSUM changepoint detection over daily event volumes
    * per event type: with slack k = the type's mean daily count, the
    * classic recursion S_i = max(0, S_{i-1} + (x_i − k)) accumulates only
    * SUSTAINED above-average runs (a single spike decays, a level shift
    * ramps); alarm when S_i > 3k. The standard sequential drift detector —
    * where dq04 z-scores each day in isolation, CUSUM catches the slow
    * ingest regression that never produces one outlier day. Days with zero
    * events carry no row (CUSUM over observed days — documented contract).
    *
    * Determinism: daily counts are exact integers, so the full-partition
    * mean is exact-sum/n in ANY order; the recursion is computed in closed
    * form S_i = P_i − min(0, min_{j≤i} P_j) from the prefix sums P of
    * (x − k), and BOTH engines stream the cumulative ROWS frame in the
    * identical day order (the q06 running-balance precedent) — one IEEE
    * sequence; 6dp round on output, alarm compared on the unrounded value.
    *
    * Plan shape for 100 TB: the corpus collapses at the (type, day)
    * aggregate — map-side combined, day-grain output bounded by calendar ×
    * |types|, NOT by corpus size; both windows then run on that tiny
    * table. One corpus exchange total. */
  def cusumQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val pt = Window.partitionBy(col("event_type"))
    val po = pt.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("k", avg(col("n_events").cast("double")).over(pt))
      .withColumn("p", sum(col("n_events").cast("double") - col("k")).over(po))
      .withColumn("s", col("p") - least(min(col("p")).over(po), lit(0.0)))
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("s"), 6).as("cusum"),
        (col("s") > lit(3.0) * col("k")).as("alarm"))
      .orderBy(col("event_type"), col("day"))
  }

  /** DuckDB SQL replicating [[cusumQuery]] exactly (same exact-integer
    * mean, same closed-form prefix recursion over the same day-ordered
    * cumulative frames, same 6dp round and unrounded alarm compare). */
  val cusumOracleSql: String = """
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n_events
                     FROM events GROUP BY 1, 2),
      w AS (SELECT event_type, day, n_events,
              avg(CAST(n_events AS DOUBLE)) OVER (PARTITION BY event_type) AS k
            FROM daily),
      p AS (SELECT *, sum(CAST(n_events AS DOUBLE) - k) OVER
              (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
            FROM w),
      sx AS (SELECT *, pp - least(min(pp) OVER
               (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS s
             FROM p)
      SELECT event_type, day, n_events, round(s, 6) AS cusum,
             s > 3.0 * k AS alarm
      FROM sx ORDER BY event_type, day"""

  /** Goal event types evaluated by [[abTestQuery]]. */
  val AbGoals: Seq[String] = Seq("click", "purchase", "signup")

  /** ev16 — two-proportion A/B test per conversion goal: users split into
    * arms by id parity (the deterministic stand-in for an assignment
    * column), per goal the arms' user-level conversion rates are compared
    * with the pooled two-proportion z statistic, significant at |z| > 1.96
    * (two-sided 5%). The experimentation primitive an event pipeline runs
    * continuously; ev01's funnel measures a flow, this DECIDES between
    * two populations.
    *
    * Determinism: user counts and converter counts are exact integers;
    * p̂/pooled-p̂ are single divisions; the standard error is one fixed
    * IEEE sequence ending in sqrt — which IEEE 754 requires correctly
    * rounded, so it is bit-identical cross-engine; z is one subtraction
    * and one division; 6dp round on output, significance compared on the
    * unrounded z. Degenerate arms (se = 0) report NULL z, not-significant.
    *
    * Plan shape for 100 TB: ONE user-keyed corpus exchange produces the
    * per-user conversion flags; the goal expansion and arm aggregation run
    * on user-scale rows (3 per user), collapsing to |goals| rows. No
    * joins. */
  def abTestQuery(s: SparkSession, dir: String): DataFrame = {
    val flags = AbGoals.map(g =>
      max(when(col("event_type") === g, 1).otherwise(0)).as(s"f_$g"))
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(flags.head, flags.tail: _*)
      .withColumn("arm",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
    val goalMap = map(AbGoals.flatMap(g =>
      Seq(lit(g), col(s"f_$g"))): _*)
    val goals = perUser.select(col("arm"),
      explode(goalMap).as(Seq("goal", "flag")))
    val agg = goals.groupBy(col("goal")).agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "A", col("flag").cast("long")).otherwise(0L))
        .as("conv_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "B", col("flag").cast("long")).otherwise(0L))
        .as("conv_b"))
    val p1 = col("conv_a").cast("double") / col("n_a").cast("double")
    val p2 = col("conv_b").cast("double") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double")))
    agg.select(col("goal"), col("n_a"), col("conv_a"), col("n_b"),
        col("conv_b"),
        round(p1, 6).as("p_a"), round(p2, 6).as("p_b"),
        when(se > 0, round((p1 - p2) / se, 6)).as("z"),
        when(se > 0, abs((p1 - p2) / se) > 1.96).otherwise(false)
          .as("significant"))
      .orderBy(col("goal"))
  }

  /** DuckDB SQL replicating [[abTestQuery]] exactly (same parity arms,
    * same exact-integer conversion censuses, same IEEE sequence through
    * the correctly-rounded sqrt, same 6dp rounds and unrounded
    * significance compare). */
  def abTestOracleSql: String = {
    val flagCols = AbGoals.map(g =>
      s"max(CASE WHEN event_type = '$g' THEN 1 ELSE 0 END) AS f_$g")
      .mkString(",\n               ")
    val goalRows = AbGoals.map(g =>
      s"SELECT arm, '$g' AS goal, f_$g AS flag FROM a").mkString(
      "\n             UNION ALL ")
    s"""
      WITH pu AS (SELECT user_id,
               $flagCols
             FROM events GROUP BY user_id),
      a AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
                   ${AbGoals.map(g => s"f_$g").mkString(", ")}
            FROM pu),
      g AS ($goalRows),
      ag AS (SELECT goal,
               CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN arm = 'A' THEN flag ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN arm = 'B' THEN flag ELSE 0 END) AS BIGINT) AS conv_b
             FROM g GROUP BY goal),
      x AS (SELECT *,
              CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p1,
              CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p2,
              CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
            FROM ag),
      y AS (SELECT *, sqrt(pp * (1.0 - pp) *
              (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS se
            FROM x)
      SELECT goal, n_a, conv_a, n_b, conv_b,
             round(p1, 6) AS p_a, round(p2, 6) AS p_b,
             CASE WHEN se > 0 THEN round((p1 - p2) / se, 6) END AS z,
             CASE WHEN se > 0 THEN abs((p1 - p2) / se) > 1.96
                  ELSE false END AS significant
      FROM y ORDER BY goal"""
  }
}
