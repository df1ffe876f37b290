package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text

/** The composed end-to-end corpus pipeline — the full funnel a training
  * run actually executes, chaining the engine's already-audited stages in
  * production order: benchmark carve-out, curation verdict
  * ([[Curation.curationQuery]]), eval-set decontamination
  * ([[Dedup.decontaminate]]), deterministic hash downsampling
  * ([[Curation.hashSampleQuery]] semantics) and shard assignment
  * ([[Curation.shardAssignQuery]] semantics) over the survivors. One row
  * per document with its FINAL disposition — the first stage that dropped
  * it, or `kept` with its training shard and in-shard position — so the
  * whole funnel is auditable from a single manifest.
  *
  * Plan shape for 100 TB: every stage keeps its own audited scalable
  * formulation (columnar verdict passes, broadcast benchmark spans,
  * map-only hash sampling, per-shard windows); the composition itself only
  * ever joins doc-keyed MANIFEST rows (doc_id + a few scalars, never
  * text). The shard/pos assignment is ONE window pass over the staged
  * manifest: kept rows partition by their shard; dropped rows are spread
  * across disjoint synthetic partitions whose row_numbers are discarded —
  * so no single skewed "dropped" partition forms (the naive
  * `when(kept, row_number)` over a two-valued partition key would pile
  * every dropped doc into one partition), and the manifest is computed
  * exactly once with nothing persisted (round-5 review: a leaked cache
  * entry at 100 TB evicts working state).
  */
object Pipeline {

  val SampleRate = 0.5

  /** Per-document funnel manifest: (doc_id, stage, shard, pos, n_tokens)
    * where stage ∈ benchmark | exact_dup | lang_mismatch | too_short |
    * span_dup | contaminated | sampled_out | kept, and shard/pos are -1
    * unless kept. */
  def pipelineQuery(s: SparkSession, dir: String, benchSource: String = "src0",
      rate: Double = SampleRate, nShards: Int = 8): DataFrame = {
    val staged = stagedDisposition(s, dir, benchSource, rate)
    val isKept = col("stage") === "kept"
    // One window pass assigns (shard, pos) to kept rows. Dropped rows need
    // no position, but they must not collapse into one skew partition — so
    // they ride DISJOINT synthetic keys (negative, spread by doc_id) whose
    // tiny per-partition row_numbers are computed and discarded. No
    // self-join, no persisted manifest.
    val partKey = when(isKept,
        pmod(Curation.prefix32(col("rk")).cast("long"), lit(nShards.toLong)))
      .otherwise(lit(-1L) - pmod(col("doc_id"), lit(1024L)))
    val w = Window.partitionBy(col("pk")).orderBy(col("rk"), col("doc_id"))
    staged
      .withColumn("pk", partKey)
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("stage"),
        when(isKept, col("pk")).otherwise(lit(-1L)).as("shard"),
        when(isKept, (col("rn") - 1).cast("long")).otherwise(lit(-1L)).as("pos"),
        col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Funnel observability: documents and tokens entering each stage bucket
    * — the "where did my corpus go" report every pipeline owner reads
    * first. Aggregates the staged manifest directly (shard/pos would be
    * dropped by the groupBy anyway, so the kept-side window and final join
    * are skipped); the ORACLE still re-aggregates the full pl01 result,
    * which is where drift-proofing matters. */
  def funnelQuery(s: SparkSession, dir: String): DataFrame =
    stagedDisposition(s, dir)
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("stage"))

  /** The manifest-scale (doc_id, stage, rk, n_tokens) disposition behind
    * [[pipelineQuery]] — read exactly once by each consumer (the window
    * formulation above removed the second read), so nothing is persisted
    * and no cache entry outlives the query. */
  private[operators] def stagedDisposition(s: SparkSession, dir: String,
      benchSource: String = "src0", rate: Double = SampleRate): DataFrame = {
    val cut = Curation.hashCut(rate) // sa03's threshold, one shared definition
    val base = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"),
        Text.tokenCount(Text.normText(col("text"))).as("n_tokens"),
        Curation.md5Prefix32(col("doc_id")).cast("long").as("h32"),
        md5(col("doc_id").cast("string")).as("rk"))
    val cur = Curation.curationVerdicts(s, dir).select(col("doc_id"), col("reason"))
    val dec = Dedup.decontamVerdicts(s, dir, benchSource, 8)
      .select(col("doc_id"), col("contaminated"))
    base
      .join(cur, "doc_id")
      .join(dec, Seq("doc_id"), "left") // benchmark docs have no dec row
      .select(col("doc_id"), col("n_tokens"), col("rk"),
        when(col("source") === benchSource, lit("benchmark"))
          .when(col("reason") =!= "ok", col("reason"))
          .when(col("contaminated"), lit("contaminated"))
          .when(col("h32") >= cut, lit("sampled_out"))
          .otherwise(lit("kept")).as("stage"))
  }

  /** DuckDB oracle for [[pipelineQuery]]: the sub-operators' own oracle SQL
    * as CTEs, the identical stage cascade, and sa05's shard/pos formula
    * over the kept set — a def interpolating the SAME sampling cut the
    * Scala side derives from `rate`. */
  def pipelineOracleSql(benchSource: String = "src0",
      rate: Double = SampleRate, nShards: Int = 8): String = {
    val cut = Curation.hashCut(rate)
    s"""
      WITH cur AS (${Curation.curationOracleSql}),
      dec AS (${Dedup.decontaminateOracleSql(benchSource)}),
      base AS (SELECT doc_id, source,
          CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
               ELSE CAST(length(t) - length(regexp_replace(t, ' ', '', 'g')) + 1 AS BIGINT)
          END AS n_tokens,
          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h32,
          md5(CAST(doc_id AS VARCHAR)) AS rk
        FROM (SELECT doc_id, source,
                trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
              FROM documents) z),
      staged AS (SELECT b.doc_id, b.n_tokens, b.rk,
          CASE WHEN b.source = '$benchSource' THEN 'benchmark'
               WHEN cur.reason <> 'ok' THEN cur.reason
               WHEN dec.contaminated THEN 'contaminated'
               WHEN b.h32 >= $cut THEN 'sampled_out'
               ELSE 'kept' END AS stage
        FROM base b JOIN cur USING (doc_id) LEFT JOIN dec USING (doc_id)),
      kp AS (SELECT doc_id,
          CAST(concat('0x', substr(rk, 1, 8)) AS BIGINT) % $nShards AS shard,
          row_number() OVER (PARTITION BY
            CAST(concat('0x', substr(rk, 1, 8)) AS BIGINT) % $nShards
            ORDER BY rk, doc_id) - 1 AS pos
        FROM staged WHERE stage = 'kept')
      SELECT s.doc_id, s.stage, coalesce(kp.shard, -1) AS shard,
             coalesce(kp.pos, -1) AS pos, s.n_tokens
      FROM staged s LEFT JOIN kp USING (doc_id)
      ORDER BY s.doc_id"""
  }

  /** DuckDB oracle for [[funnelQuery]] — the pl01 oracle re-aggregated, so
    * the report cannot drift from the manifest it reports on. */
  def funnelOracleSql: String = s"""
      WITH pl AS (${pipelineOracleSql()})
      SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM pl GROUP BY stage ORDER BY stage"""

  /** The FINAL per-document training weight — the number a weighted data
    * loader actually consumes, composing three audited policies
    * multiplicatively: the curation verdict as a hard gate (weight 0 for
    * any non-`ok` reason), soft dedup's duplicate down-weighting
    * ([[Dedup.softDedup]], 1/cluster-size) and the temperature mixture
    * boost of the document's source ([[Curation.temperatureMixQuery]]).
    * `train_weight = [reason = ok] * dup_weight * boost` — one IEEE
    * multiply of two already-deterministic doubles, so the composition
    * adds no rounding of its own.
    *
    * Plan shape for 100 TB: like pl01, the composition only ever joins
    * doc-keyed MANIFEST rows (doc_id + a few scalars — the sub-operators'
    * text passes stay inside their own audited plans); the 20-row boost
    * table is broadcast. Each sub-operator is read once, nothing is
    * persisted by the composition itself. */
  def trainingWeightsQuery(s: SparkSession, dir: String): DataFrame = {
    val verdicts = Curation.curationVerdicts(s, dir)
      .select(col("doc_id"), col("reason"))
    val dupW = Dedup.softWeights(s, dir)
      .select(col("doc_id"), col("weight").as("dup_weight"))
    val boosts = Curation.temperatureMixQuery(s, dir)
      .select(col("source"), col("boost"))
    Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(verdicts, "doc_id")
      .join(dupW, "doc_id")
      .join(broadcast(boosts), "source")
      .select(col("doc_id"), col("source"), col("reason"), col("dup_weight"),
        col("boost"),
        when(col("reason") === "ok", col("dup_weight") * col("boost"))
          .otherwise(lit(0.0)).as("train_weight"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[trainingWeightsQuery]]: the sub-operators' oracle
    * SQL as CTEs (`ccCtes` is the caller's shared connected-components CTE
    * chain ending in `cl(doc_id, cluster_id)` — the same string the
    * dd05/dd14/dd15 oracles interpolate), the identical gate-and-multiply
    * composition. */
  def trainingWeightsOracleSql(ccCtes: String): String = s"""
      WITH cv AS (${Curation.curationOracleSql}),
      dw AS (WITH RECURSIVE $ccCtes,
             sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
                    FROM cl GROUP BY cluster_id),
             pd AS (SELECT cl.doc_id, sz.csize
                    FROM cl JOIN sz USING (cluster_id))
             SELECT d.doc_id,
                    CAST(1 AS DOUBLE) / CAST(coalesce(pd.csize, 1) AS DOUBLE)
                      AS dup_weight
             FROM documents d LEFT JOIN pd USING (doc_id)),
      tb AS (SELECT source, boost FROM (${Curation.temperatureMixOracleSql}) z)
      SELECT d.doc_id, d.source, cv.reason, dw.dup_weight, tb.boost,
             CASE WHEN cv.reason = 'ok' THEN dw.dup_weight * tb.boost
                  ELSE CAST(0 AS DOUBLE) END AS train_weight
      FROM documents d JOIN cv USING (doc_id) JOIN dw USING (doc_id)
      JOIN tb ON d.source = tb.source
      ORDER BY d.doc_id"""

  /** pl04 — the dataset card: one row per source with the numbers a data
    * release actually publishes — volume (docs/tokens/chars), curation
    * keep count, near-dup involvement, and the leakage-safe split sizes.
    * Every column is an exact integer (counts and integer sums only), so
    * the whole card is bit-deterministic with no rounding.
    *
    * Composition discipline (the pl01 rules): the near-dup labels are
    * computed ONCE and broadcast (pair-graph-scale); the split verdict is
    * derived from those same labels via [[Curation.splitOf]] rather than
    * re-running the LSH pipeline; the only corpus-keyed join carries
    * (doc_id, reason) — text never rides a join.
    *
    * Plan shape for 100 TB: one metric scan (normalize + count, columnar),
    * one broadcast label join, one doc-keyed verdict join, then ONE
    * map-side-combined |sources|-row aggregate. */
  def datasetCardQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), Text.normText(col("text")).as("t"))
      .select(col("doc_id"), col("source"),
        length(col("t")).cast("long").as("nc"),
        Text.tokenCount(col("t")).as("nt"))
    val kept = Curation.curationVerdicts(s, dir)
      .select(col("doc_id"), (col("reason") === "ok").as("kept"))
    val labels = Dedup.clusterLabels(s, dir)
    docs
      .join(broadcast(labels), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", Curation.splitOf(col("rep")))
      .join(kept, "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        sum(col("nc")).as("n_chars"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("cluster_id").isNotNull, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      .orderBy(col("source"))
  }

  /** DuckDB SQL replicating [[datasetCardQuery]] exactly, composed from
    * the shared component oracles (`ccCtes` = the SparkEntry dd05 chain
    * ending in `cl`). */
  def datasetCardOracleSql(ccCtes: String): String = s"""
      WITH RECURSIVE $ccCtes,
      cv AS (${Curation.curationOracleSql}),
      d AS (SELECT doc_id, source,
              trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
            FROM documents),
      m AS (SELECT doc_id, source, CAST(length(t) AS BIGINT) AS nc,
              CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
                   ELSE CAST(length(t) -
                     length(regexp_replace(t, ' ', '', 'g')) + 1 AS BIGINT)
              END AS nt
            FROM d),
      x AS (SELECT m.*, cl.cluster_id IS NOT NULL AS is_dup,
              coalesce(cl.cluster_id, m.doc_id) AS rep,
              cv.reason = 'ok' AS kept
            FROM m LEFT JOIN cl ON cl.doc_id = m.doc_id
                   JOIN cv ON cv.doc_id = m.doc_id),
      y AS (SELECT *,
              CAST(concat('0x', substr(md5(CAST(rep AS VARCHAR)), 1, 8)) AS BIGINT)
                % 10 AS bucket
            FROM x)
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             CAST(sum(nc) AS BIGINT) AS n_chars,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
             CAST(sum(CASE WHEN bucket < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             CAST(sum(CASE WHEN bucket = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
             CAST(sum(CASE WHEN bucket = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
      FROM y GROUP BY source ORDER BY source"""
}
