package graft.state

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import graft.core.Tables
import graft.functions.Text
import graft.operators.{Curation, TextAnalysis}

/** Continuous (streaming) ingestion admission — the gate a 100 TB pipeline
  * puts IN FRONT of its corpus store: every arriving document is either
  * admitted or rejected-with-reason in one pass, so curation happens at
  * ingest time instead of as a batch rewrite. The same keyed-state pattern
  * as the reference's table apps (reference:
  * fluvii/apps/transactions/transaction.py:180-192 — read state, decide,
  * update state, emit) carrying a per-source token-budget counter, composed
  * with the engine's existing batch gates:
  *
  *   1. empty      — the document normalizes to zero tokens (ta02's count);
  *   2. lang       — the ta01 stopword-profile language ID disagrees with
  *                   the declared language (cl08's agreement check, applied
  *                   as an admission rule);
  *   3. quality    — mean token length outside [[QualityMinTokLen]],
  *                   [[QualityMaxTokLen]] (the Gopher-style length heuristic
  *                   over ta02's exact derivations);
  *   4. sample     — deterministic md5-prefix hash sampling at
  *                   [[SampleRate]] (sa03's recipe: same doc is kept or
  *                   dropped on every replay, no RNG state);
  *   5. budget     — STATEFUL: a per-source running counter of tokens that
  *                   passed gates 1-4; a document is admitted while the
  *                   counter (before it) is under [[BudgetTokens]]. This is
  *                   sa12's token-budget admission with ARRIVAL-order
  *                   priority — the only priority a stream can offer, since
  *                   scores of future arrivals are unknowable.
  *
  * Gates 1-4 are stateless columnar expressions (zero exchanges, codegen'd
  * — exactly the ta01/ta02/sa03 plans); only the budget needs state: ONE
  * long per source, keyed by source. The counter holds ADMITTED spend and
  * advances only when a document is admitted — crucial for the TTL
  * semantics below: a budget-REJECTED arrival performs no state write, so
  * a flooding over-budget source does not keep refreshing its own lockout.
  * The admit decision (counter-before < budget) still yields exactly the
  * prefix of gate-passing arrivals whose cumulative tokens stay under the
  * budget: both counters agree up to the first rejection (every earlier
  * passer was admitted), and from it on both sit >= budget forever — so
  * the DuckDB oracle derives the admitted FLAG from a plain window cumsum
  * over gate-passing tokens, and the reported `cum_before` from a second
  * cumsum over admitted tokens.
  *
  * Plan shape for 100 TB: the stateless gates ride the ingest scan; the
  * budget stage shuffles ONLY (doc_id, source, n_tokens, reason) — the
  * text never reaches the exchange — keyed by source (a domain-scale key;
  * a skewed mega-source bounds state at one long regardless). State size
  * is 8 bytes x |sources|. With a retention `ttl` the budget is a ROLLING
  * window budget: the counter ages out with the retention window, so a
  * long-running deployment re-opens admission as old spend expires
  * ([[candidatesStream]]'s TTL discipline, same mechanism). The TTL clock
  * restarts on state WRITES, which is why only admissions write: under a
  * continuous flood of rejected arrivals the admitted spend still expires
  * on schedule and the source re-opens (AdmissionSpec pins both the
  * no-write-on-reject fold and the post-expiry re-admission).
  *
  * Batch twin: [[graft.operators.Curation.tokenBudgetQuery]] (sa12) is the
  * score-priority batch form; `streamingAdmission` is replay-deterministic
  * (arrival order = doc_id order), which is how the oracle hash-checks a
  * STREAMING operator at all.
  */
object AdmissionStream {

  /** Per-source token budget. Sized so the gate bites mid-corpus at the
    * verify scale (sf0.01 gate-passing spend is 210-749 tokens/source): a
    * production caller passes its own. */
  val BudgetTokens = 400L
  /** Hash-sampling keep rate (gate 4). */
  val SampleRate = 0.8
  /** Mean-token-length window (gate 3) — the Gopher-style band, tightened
    * to this corpus's observed [3.7, 5.3] spread so the gate is live. */
  val QualityMinTokLen = 4.05
  val QualityMaxTokLen = 4.95

  /** A document after the stateless gates: `reason` is null iff gates 1-4
    * passed (the budget gate decides the rest). */
  case class GateRow(doc_id: Long, source: String, n_tokens: Long, reason: String)

  /** The admission verdict. `cum_before` is the budget counter the doc saw
    * (null for docs rejected before the budget gate). */
  case class Verdict(doc_id: Long, source: String, n_tokens: Long,
      admitted: Boolean, reason: String, cum_before: Option[Long])

  /** Stateless gates 1-4 as one columnar pass (the ta01 + ta02 + sa03
    * derivations, verbatim — same expressions, same guards). */
  def gatedDocs(docs: DataFrame): DataFrame = {
    val tok = col("n_tokens")
    docs
      .select(col("doc_id"), col("lang").as("declared_lang"), col("source"),
        Text.normText(col("text")).as("t"))
      .select(col("doc_id"), col("declared_lang"), col("source"), col("t"),
        Text.tokenCount(col("t")).as("n_tokens"),
        TextAnalysis.langCountsCol(col("t")).as("swc"))
      .select(Seq(col("doc_id"), col("declared_lang"), col("source"),
        col("n_tokens"),
        when(tok > 0, (length(col("t")) - tok + 1).cast("double") / tok)
          .as("atl"),
        Curation.md5Prefix32(col("doc_id")).cast("long").as("h32")) ++
        TextAnalysis.langScoreColsFromCounts(col("swc")): _*)
      .withColumn("pred_lang", TextAnalysis.bestLangCol)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        when(col("n_tokens") === 0, "empty")
          .when(col("pred_lang") =!= col("declared_lang"), "lang")
          .when(col("atl") < QualityMinTokLen ||
            col("atl") > QualityMaxTokLen, "quality")
          .when(col("h32") >= hashCutLong, "sample")
          .as("reason"))
  }

  private def hashCutLong: Long = Curation.hashCut(SampleRate)

  /** The budget fold both backends and the spec's reference model run:
    * arrivals in ascending doc_id order against a counter starting at
    * `cum0`; returns the verdicts and the advanced counter. */
  private[state] def processSourceGroup(cum0: Long, rows: Iterator[GateRow],
      budget: Long = BudgetTokens): (Vector[Verdict], Long) = {
    var cum = cum0
    val out = Vector.newBuilder[Verdict]
    rows.toVector.sortBy(_.doc_id).foreach { r =>
      if (r.reason != null)
        out += Verdict(r.doc_id, r.source, r.n_tokens, false, r.reason, None)
      else {
        val admitted = cum < budget
        out += Verdict(r.doc_id, r.source, r.n_tokens, admitted,
          if (admitted) null else "budget", Some(cum))
        // admitted spend only: a rejection must not advance (and, through
        // [[BudgetProcessor]], must not TTL-refresh) the counter
        if (admitted) cum += r.n_tokens
      }
    }
    (out.result(), cum)
  }

  /** sa13 — the deterministic batch replay of the admission stream (the
    * [[NearDupStream.streamingNearDup]] harness pattern: same fold as the
    * streaming backend, arrival order = doc_id order). The per-source
    * group buffer here is corpus/|sources| rows of 4 narrow columns; in
    * the streaming deployment each [[BudgetProcessor]] call buffers only
    * ONE MICRO-BATCH's rows per source (and at batch scale the window-
    * cumsum twin below is the plan you'd run — this entry exists to pin
    * the fold's semantics against the oracle). */
  def streamingAdmission(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    gatedDocs(Tables.parallel(Tables.documents(s, dir)))
      .as[GateRow]
      .groupByKey(_.source)
      .flatMapGroups { (_: String, rows: Iterator[GateRow]) =>
        processSourceGroup(0L, rows)._1.iterator
      }
      .toDF()
      .select(col("doc_id"), col("source"), col("n_tokens"), col("admitted"),
        col("reason"), col("cum_before"))
      .orderBy(col("doc_id"))
  }

  /** The streaming backend: the same fold as a [[transformWithState]]
    * stream over a durable per-source ValueState counter. `ttl` turns the
    * fixed budget into a rolling-retention-window budget (expired spend
    * re-opens admission). AdmissionSpec proves output equality with the
    * batch replay on the same increments. */
  def admissionStream(gated: Dataset[GateRow], budget: Long = BudgetTokens,
      ttl: Option[java.time.Duration] = None): Dataset[Verdict] = {
    import gated.sparkSession.implicits._
    val ttlConfig = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    gated
      .groupByKey(_.source)
      .transformWithState(new BudgetProcessor(budget, ttlConfig),
        timeMode, OutputMode.Append())
  }

  /** DuckDB SQL replicating [[streamingAdmission]] exactly — the gate
    * derivations are the ta01/ta02/sa03 oracle fragments (generated from
    * the same profiles/constants as the Scala side), and the budget fold
    * is the equivalent window cumsum over gate-passing rows documented
    * above. */
  def oracleSql: String = {
    val scores = TextAnalysis.langScoreSqlExprs.mkString(",\n               ")
    val cut = hashCutLong
    s"""
      WITH d AS (SELECT doc_id, lang AS declared_lang, source,
                        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      c AS (SELECT doc_id, declared_lang, source,
              CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
                   ELSE CAST(length(t) - length(regexp_replace(t, ' ', '', 'g')) + 1 AS BIGINT)
              END AS n_tokens,
              CAST(length(t) AS BIGINT) AS nc,
              replace(' ' || t || ' ', ' ', '  ') AS dd
            FROM d),
      scored AS (SELECT doc_id, declared_lang, source, n_tokens, nc,
               $scores,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
             FROM c),
      g AS (SELECT doc_id, source, n_tokens,
              CASE WHEN n_tokens = 0 THEN 'empty'
                   WHEN ${TextAnalysis.predLangCaseSql} <> declared_lang THEN 'lang'
                   WHEN CAST(nc - n_tokens + 1 AS DOUBLE) / n_tokens < $QualityMinTokLen
                     OR CAST(nc - n_tokens + 1 AS DOUBLE) / n_tokens > $QualityMaxTokLen THEN 'quality'
                   WHEN h32 >= $cut THEN 'sample'
              END AS reason
            FROM scored),
      b AS (SELECT doc_id, source, n_tokens, reason,
              CAST(coalesce(sum(CASE WHEN reason IS NULL THEN n_tokens ELSE 0 END)
                OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumg
            FROM g),
      b2 AS (SELECT doc_id, source, n_tokens, reason,
               (reason IS NULL AND cumg < $BudgetTokens) AS admitted
             FROM b)
      SELECT doc_id, source, n_tokens, admitted,
             CASE WHEN reason IS NOT NULL THEN reason
                  WHEN NOT admitted THEN 'budget' END AS reason,
             CASE WHEN reason IS NULL THEN
               CAST(coalesce(sum(CASE WHEN admitted THEN n_tokens ELSE 0 END)
                 OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             END AS cum_before
      FROM b2 ORDER BY doc_id"""
  }
}

/** The per-source budget counter as a [[StatefulProcessor]]: ValueState of
  * the cumulative ADMITTED token spend — rejected rows (gate-failing or
  * over-budget) never advance the counter and never TTL-refresh it, which
  * is what lets a flooded source's budget re-open when the retention
  * window ages the admitted spend out. Within a micro-batch the
  * processor sorts its rows (arrival order across micro-batches is the
  * replay order, ascending doc_id — [[NearDupBucketProcessor]]'s
  * discipline); `ttl` ages the counter out with the retention window. */
private[state] final class BudgetProcessor(budget: Long, ttl: TTLConfig)
    extends StatefulProcessor[String, AdmissionStream.GateRow, AdmissionStream.Verdict] {
  import AdmissionStream.{GateRow, Verdict}

  @transient private var cum: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cum = getHandle.getValueState[Long]("src_budget_spend", Encoders.scalaLong, ttl)

  override def handleInputRows(key: String, rows: Iterator[GateRow],
      timers: TimerValues): Iterator[Verdict] = {
    val cum0 = if (cum.exists()) cum.get() else 0L
    val (out, cumAfter) = AdmissionStream.processSourceGroup(cum0, rows, budget)
    if (cumAfter != cum0) cum.update(cumAfter)
    out.iterator
  }
}
