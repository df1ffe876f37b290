package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Checkpoints, Tables}
import graft.functions.Text

/** Model-based quality filtering — the fasttext/logistic-regression corpus
  * classifier every large LLM pipeline trains (GPT-3's WebText-vs-crawl LR
  * filter, LLaMA's Wikipedia-reference classifier, CCNet): learn a linear
  * model separating a trusted slice of the corpus from the rest, then score
  * every document. Here the trusted label is `source = 'src0'` (a stand-in
  * for "curated corpus" — the label column is the only pluggable part).
  *
  * Training is full-batch logistic-regression gradient descent: exactly the
  * topology of Spark MLlib's `GradientDescent` — per-iteration the corpus
  * computes a partially-aggregated gradient (map-side combine down to 5
  * doubles), the DRIVER holds the weight vector (O(#features), bounded by
  * construction), and the next iteration's expressions embed the weights as
  * literals (a broadcast of size 5). The corpus never leaves the executors
  * and never shuffles: every iteration is one scan of the persisted feature
  * frame + one 5-double aggregate. At 100 TB that is `iters` cached-read
  * passes — the same cost profile as MLlib on the same data.
  *
  * Engine-portable determinism (the [[Similarity.kmeansFit]] recipe):
  * each gradient component is `round(avg(...), 6)` so the two engines'
  * different partial-sum orders cannot drift, and the learning rate is
  * fixed at 1.0 so the weight update `w - g` is a single IEEE subtraction
  * of two 6-dp values — bit-identical everywhere, no re-rounding step
  * whose tie behavior could differ. The oracle unrolls the same loop into
  * generated CTE blocks from the same `iters` spec, so operator and oracle
  * cannot drift.
  */
object Classifier {

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Per-document feature frame: label y (source == trusted) and four
    * scale-normalized quality signals, every one a ratio of exact integer
    * counts (token count, distinct-token count, character count, stopword
    * count) so both engines derive bit-identical doubles. */
  private[operators] def features(s: SparkSession, dir: String,
      trusted: String): DataFrame = {
    val tok = col("n_tok")
    Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), Text.normText(col("text")).as("t"))
      .select(col("doc_id"), col("source"), col("t"),
        Text.tokenCount(col("t")).as("n_tok"),
        Text.doubledSpaces(col("t")).as("dd"))
      .select(
        col("doc_id"),
        when(col("source") === trusted, 1.0).otherwise(0.0).as("y"),
        (tok.cast("double") / 100.0).as("x1"),
        when(tok > 0, size(array_distinct(split(col("t"), " "))).cast("long")
          .cast("double") / tok).otherwise(0.0).as("x2"),
        when(tok > 0, (length(col("t")) - tok + 1).cast("double") / tok / 10.0)
          .otherwise(0.0).as("x3"),
        when(tok > 0,
          (Text.wordOccurrencesInDoubled(col("dd"), "the") +
            Text.wordOccurrencesInDoubled(col("dd"), "a")).cast("double") / tok)
          .otherwise(0.0).as("x4"))
  }

  private def z(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3") + lit(w(4)) * col("x4")

  private def sigmoid(zc: Column): Column = lit(1.0) / (lit(1.0) + exp(-zc))

  /** Session-level trained-model memo, keyed by (application, corpus,
    * spec). The round-10 finding: cl06 and cl09 each re-ran cl01's full
    * 8-iteration GD chain — 27 corpus-linear scans across the three
    * queries where 9 suffice. The model is FIVE DOUBLES, so the
    * scale-correct sharing unit is the weight vector, NOT a persisted
    * corpus-scale scored frame (at 100 TB that cache would pin the
    * working set; the scoring pass it saves is an exchange-free columnar
    * scan, the cheapest thing in the pipeline). Training is
    * deterministic (6dp-rounded gradients, fixed lr), so a memo hit
    * reproduces bit-identical scores to a fresh train — the cl01/cl06/
    * cl09 oracles cannot observe the reuse. Keyed by applicationId so a
    * new session (new data) always retrains; [[clearModelCache]] is the
    * explicit escape for same-session data changes. */
  private val modelCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int, String), Array[Double]]

  def clearModelCache(): Unit = {
    clearWeightsCache()
    clearKnnCache()
  }

  /** Drops only the trained-weights memo (five doubles per spec) — the
    * granular clear Bench's xm03 build entry uses so re-timing the GD
    * chain does not also evict the kNN neighbor blocks. */
  def clearWeightsCache(): Unit = modelCache.clear()

  /** Drops the kNN neighbor memo AND unpersists its checkpoint blocks —
    * dropping only the map references would pin stale corpus-scale
    * blocks until GC (the Dedup.clearPairCache discipline). Route/recall
    * probe memos go with it (they describe the same corpus). */
  def clearKnnCache(): Unit = {
    knnCache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    knnCache.clear()
    knnRouteCache.clear(); knnRecallCache.clear()
  }

  /** Builds (or rebuilds) the trained-weights memo for the default cl01/
    * cl06/cl09 spec — Bench's xm03 entry, so the 9 corpus-linear GD scans
    * have a stable bench home instead of landing on whichever classifier
    * query runs first. */
  def warmModelMemo(s: SparkSession, dir: String): Unit =
    trainedWeights(s, dir, iters = 8, trusted = "src0")

  /** Builds (or rebuilds) the kNN neighbor memo (the routed test×train
    * scoring + top-K cut) — Bench's xm04 entry, same attribution
    * rationale as [[warmModelMemo]]. */
  def warmKnnMemo(s: SparkSession, dir: String): Unit =
    knnNeighbors(s, dir)

  /** The `iters` full-batch GD steps (lr = 1.0) behind cl01/cl06/cl09 —
    * run once per (session, corpus, spec) and memoized. A TrieMap race
    * can at worst train twice; both runs produce the same deterministic
    * weights. */
  private[operators] def trainedWeights(s: SparkSession, dir: String,
      iters: Int, trusted: String): Array[Double] =
    modelCache.getOrElseUpdate(
      (s.sparkContext.applicationId, dir, iters, trusted), {
        val f = features(s, dir, trusted)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val w = Array.fill(5)(0.0)
          for (_ <- 1 to iters) {
            val e = sigmoid(z(w)) - col("y")
            val g = f.agg(
              round(avg(e), 6), round(avg(e * col("x1")), 6),
              round(avg(e * col("x2")), 6), round(avg(e * col("x3")), 6),
              round(avg(e * col("x4")), 6)).head()
            for (j <- 0 until 5) w(j) -= g.getDouble(j)
          }
          w
        } finally {
          // the cache exists FOR the `iters` training actions above, which
          // have all run by now; dropping it here means no RDD blocks
          // outlive the call (round-5 review: at 100 TB a leaked cache
          // evicts working state). Cost: scoring passes recompute the
          // columnar feature scan from source.
          f.unpersist(blocking = false)
        }
      }).clone()

  /** Train the classifier (`iters` full-batch GD steps, lr = 1.0, memoized
    * per session — see [[trainedWeights]]) and score every document:
    * (doc_id, label, score, predicted). */
  def qualityClassifierQuery(s: SparkSession, dir: String, iters: Int = 8,
      trusted: String = "src0"): DataFrame = {
    val w = trainedWeights(s, dir, iters, trusted)
    // trained weights re-embedded as literals; the returned scoring pass
    // is one (columnar, exchange-free) feature scan from source
    features(s, dir, trusted)
      .select(col("doc_id"), col("y").cast("long").as("label"),
        round(sigmoid(z(w)), 6).as("score"))
      .withColumn("predicted", col("score") >= 0.5)
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[qualityClassifierQuery]] exactly — the GD loop
    * unrolled into generated CTE blocks from the SAME `iters` spec
    * (the [[Similarity.kmeansOracleSql]] pattern). */
  def qualityClassifierOracleSql(iters: Int = 8,
      trusted: String = "src0"): String = {
    def zSql(wt: String) = s"($wt.b + $wt.w1*x1 + $wt.w2*x2 + $wt.w3*x3 + $wt.w4*x4)"
    val blocks = (1 to iters).map { i =>
      val pw = s"w${i - 1}"
      s"""
      g$i AS (SELECT round(avg(e), 6) AS g0, round(avg(e*x1), 6) AS g1,
                     round(avg(e*x2), 6) AS g2, round(avg(e*x3), 6) AS g3,
                     round(avg(e*x4), 6) AS g4
              FROM (SELECT 1/(1+exp(-${zSql(pw)})) - y AS e, x1, x2, x3, x4
                    FROM f CROSS JOIN $pw) ze),
      w$i AS (SELECT b - g0 AS b, w1 - g1 AS w1, w2 - g2 AS w2,
                     w3 - g3 AS w3, w4 - g4 AS w4
              FROM w${i - 1} CROSS JOIN g$i)"""
    }.mkString(",")
    s"""
      WITH d AS (SELECT doc_id, source,
                        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      c AS (SELECT doc_id, source, t,
                   CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(length(t) - length(regexp_replace(t, ' ', '', 'g')) + 1 AS BIGINT)
                   END AS n_tok,
                   replace(' ' || t || ' ', ' ', '  ') AS dd
            FROM d),
      f AS (SELECT doc_id,
                   CASE WHEN source = '$trusted' THEN 1.0 ELSE 0.0 END AS y,
                   CAST(n_tok AS DOUBLE)/100.0 AS x1,
                   CASE WHEN n_tok = 0 THEN 0.0
                        ELSE CAST(CAST(len(list_distinct(string_split(t, ' '))) AS BIGINT) AS DOUBLE)/n_tok
                   END AS x2,
                   CASE WHEN n_tok = 0 THEN 0.0
                        ELSE CAST(length(t) - n_tok + 1 AS DOUBLE)/n_tok/10.0
                   END AS x3,
                   CASE WHEN n_tok = 0 THEN 0.0
                        ELSE CAST(CAST((length(dd) - length(regexp_replace(dd, ' \\Qthe\\E ', '', 'g')))/5 AS BIGINT)
                                + CAST((length(dd) - length(regexp_replace(dd, ' \\Qa\\E ', '', 'g')))/3 AS BIGINT) AS DOUBLE)/n_tok
                   END AS x4
            FROM c),
      w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4),
      $blocks,
      scored AS (SELECT doc_id, CAST(y AS BIGINT) AS label,
                        round(1/(1+exp(-${zSql(s"w$iters")})), 6) AS score
                 FROM f CROSS JOIN w$iters)
      SELECT doc_id, label, score, score >= 0.5 AS predicted
      FROM scored ORDER BY doc_id"""
  }

  /** The closed language set of the synthetic corpus (a production caller
    * passes its own label set; the list is a parameter of both the query
    * and the oracle so they cannot drift). */
  val Langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Multinomial naive-Bayes language classifier (the compact supervised
    * twin of ta01's heuristic language ID — the model fasttext-style lang-ID
    * reduces to for unigram features): train per-language word likelihoods
    * with add-one smoothing on the corpus's own labels, then score every
    * document against every language,
    * score(d, l) = ln P(l) + Σ_w cnt(d,w) · ln((c(w,l)+1)/(t(l)+V)),
    * and predict the top-ranked language. Emitted long-form — one row per
    * (document, candidate language) with the rounded score and the
    * predicted flag — so the whole decision surface is oracle-checked, not
    * just the argmax.
    *
    * Determinism: counts, totals and V are exact integers; the per-doc
    * likelihood sum is an order-dependent double agg → rounded 4dp (the
    * ta07 policy); the argmax runs on the ROUNDED scores via
    * row_number ordered (score desc, lang), so the ranking is a total order
    * both engines compute identically.
    *
    * Plan shape for 100 TB: two vocabulary-scale map-side-combined shuffles
    * build the per-(word, lang) count grid and the per-(doc, word) counts;
    * the grid is densified to |langs| rows per word (stack — so smoothing
    * needs no outer-join NULL path) and joined to the doc-word stream —
    * AQE broadcasts it at test SF and degrades to a sort-merge join on the
    * word key at web-corpus vocab; language totals/priors are a
    * |langs|-row broadcast. The scoring exchange carries (doc, lang, sum)
    * rows — |langs| x corpus-count, never text. */
  def naiveBayesLangQuery(s: SparkSession, dir: String,
      langs: Seq[String] = Langs): DataFrame = {
    val docs = Tables.parallel(Tables.documents(s, dir))
    val toks = docs
      .select(col("doc_id"), col("lang"),
        explode(split(Text.normText(col("text")), " ")).as("word"))
    // dense per-(word, lang) counts: conditional sums, stacked long.
    // Generated columns are INDEX-named (c_0..c_n) — a label value is data,
    // not an identifier ('zh-cn' must not have to parse as a column name).
    // (A round-14 A/B tried deriving this from a persisted per-(doc, word)
    // count instead of a second tokenization: 1.9 s → 3.2 s at sf0.1 — the
    // near-unique (doc, word) hash-agg state costs more than the cheap
    // re-explode it saves. The two-aggregation shape is the right one.)
    // the wide grid feeds THREE subtrees (the stacked grid's two consumers
    // and the V census): persist it (round-15) — unpersisted, each re-ran
    // the corpus tokenization + vocabulary aggregation, so the tokenize
    // pass executed 3× here (+1 for the doc-word counts below). The cache
    // is VOCABULARY-scale (one row per word), not the (doc, word) grain
    // the recorded negative A/B below rejects.
    val wide = toks.groupBy(col("word"))
      .agg(sum(when(col("lang") === langs.head, 1L).otherwise(0L)).as("c_0"),
        langs.tail.zipWithIndex.map { case (l, i) =>
          sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"c_${i + 1}") }: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def sparkLit(l: String) = l.replace("\\", "\\\\").replace("'", "\\'")
    val stackArgs = langs.zipWithIndex
      .map { case (l, i) => s"'${sparkLit(l)}', c_$i" }.mkString(", ")
    val grid = wide.select(col("word"),
      expr(s"stack(${langs.length}, $stackArgs) AS (cand_lang, c)"))
    // per-language stats: token totals REDUCED FROM THE GRID (vocab-scale —
    // a third corpus tokenization would re-explode every document for a
    // |langs|-row table); doc priors from a narrow (lang)-only scan
    val langStats = grid.groupBy(col("cand_lang"))
      .agg(sum(col("c")).as("t"))
      .join(docs.groupBy(col("lang").as("cand_lang")).agg(count(lit(1)).as("nd")),
        "cand_lang")
    val totals = wide.agg(count(lit(1)).as("v"))
      .crossJoin(docs.agg(count(lit(1)).as("nd_tot")))
    val dw = toks.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
    val rnk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("cand_lang"))
    dw.join(grid, "word")
      .join(broadcast(langStats), "cand_lang")
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(sum(col("cnt").cast("double") *
        log((col("c") + 1L).cast("double") / (col("t") + col("v")).cast("double")))
        .as("lik"),
        first(col("nd")).as("nd"), first(col("nd_tot")).as("nd_tot"))
      .withColumn("score",
        round(log(col("nd").cast("double") / col("nd_tot").cast("double")) +
          col("lik"), 4))
      .withColumn("predicted", row_number().over(rnk) === 1)
      .join(docs.select(col("doc_id"), col("lang").as("true_lang")), "doc_id")
      .select(col("doc_id"), col("true_lang"), col("cand_lang"), col("score"),
        col("predicted"))
      .orderBy(col("doc_id"), col("cand_lang"))
  }

  /** DuckDB SQL replicating [[naiveBayesLangQuery]] exactly (same dense
    * grid, same smoothing, same 4dp round before the rank). */
  def naiveBayesLangOracleSql(langs: Seq[String] = Langs): String = {
    def lit(l: String) = l.replace("'", "''")
    val condCounts = langs.zipWithIndex.map { case (l, i) =>
      s"CAST(count(*) FILTER (WHERE lang = '${lit(l)}') AS BIGINT) AS c_$i" }
      .mkString(",\n               ")
    val gridSel = langs.zipWithIndex.map { case (l, i) =>
      s"SELECT word, '${lit(l)}' AS cand_lang, c_$i AS c FROM wide" }
      .mkString("\n        UNION ALL ")
    s"""
      WITH d AS (SELECT doc_id, lang,
                        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      toks AS (SELECT doc_id, lang, unnest(string_split(t, ' ')) AS word FROM d),
      wide AS (SELECT word,
               $condCounts
               FROM toks GROUP BY word),
      grid AS ($gridSel),
      ls AS (SELECT cand_lang, CAST(sum(c) AS BIGINT) AS t
             FROM grid GROUP BY cand_lang),
      nd AS (SELECT lang AS cand_lang, CAST(count(*) AS BIGINT) AS nd
             FROM documents GROUP BY lang),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS v FROM wide),
      ndt AS (SELECT CAST(count(*) AS BIGINT) AS nd_tot FROM documents),
      dw AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
             FROM toks GROUP BY doc_id, word),
      lik AS (SELECT doc_id, cand_lang,
                sum(CAST(cnt AS DOUBLE) *
                    ln(CAST(c + 1 AS DOUBLE) / CAST(t + v AS DOUBLE))) AS lik,
                any_value(nd) AS nd, any_value(nd_tot) AS nd_tot
              FROM dw JOIN grid USING (word) JOIN ls USING (cand_lang)
                JOIN nd USING (cand_lang) CROSS JOIN tot CROSS JOIN ndt
              GROUP BY doc_id, cand_lang),
      sc AS (SELECT doc_id, cand_lang,
               round(ln(CAST(nd AS DOUBLE) / CAST(nd_tot AS DOUBLE)) + lik, 4)
                 AS score
             FROM lik),
      rk AS (SELECT doc_id, cand_lang, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, cand_lang) = 1 AS predicted
             FROM sc)
      SELECT doc_id, documents.lang AS true_lang, cand_lang, score, predicted
      FROM rk JOIN documents USING (doc_id)
      ORDER BY doc_id, cand_lang"""
  }

  /** cl03 — k-nearest-neighbor label propagation over the embedding table:
    * vectors hash-split 80/20 into train/test (the [[Curation.md5Prefix32]]
    * family — same verdict on every engine and every run); each test
    * vector takes its `k` nearest TRAIN vectors by cosine and adopts the
    * majority label (ties: smaller label). Emitted with the true label and
    * the hit flag, so the output IS the accuracy report — the standard
    * embedding-quality probe (kNN accuracy) of representation pipelines.
    *
    * Determinism: cosine is the sequential-fold native expression rounded
    * 6dp BEFORE ranking; neighbor rank ties break on cand_id, vote ties on
    * label — fully deterministic cross-engine.
    *
    * Plan shape for 100 TB: the exact form broadcasts the train side like
    * sim01's baseline (valid while train fits [[MaxTrainBroadcastBytes]] —
    * kNN probes use a SAMPLED train set precisely so this usually holds);
    * above that budget the routing switches to the sim04 IVF path
    * ([[knnScoredIvf]]) — coarse centroids broadcast, train assigned to
    * inverted lists, each test vector probing its nearest lists only —
    * the size-guarded hybrid pattern of [[Dedup.DriverCcMaxPairs]].
    * Round-12: above [[KnnScoreBudget]] test×train comparisons the
    * routing derives an APPROXIMATE IVF (√nTrain centroids, nProbe from
    * the budget) by DEFAULT — a corpus too big for exact kNN no longer
    * needs the operator to know to ask — and the output carries the
    * measured `recall_at_k` (sampled exact-vs-routed overlap; exactly
    * 1.0 on the exact route) so the approximation is visible on the row.
    * ClassifierSpec proves the routed path reproduces the exact
    * predictions on this corpus and pins both plans. Neighbor cut and
    * vote are WindowGroupLimit-able windows over the test-keyed
    * partials — the corpus never sorts globally. */
  def knnClassifierQuery(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    knnPredictions(s, dir, k)
      .withColumn("recall_at_k", lit(knnRecallAtK(s, dir, k)))
      .orderBy(col("vec_id"))

  /** Broadcast budget (bytes) for the exact kNN train side — the guard
    * that routes [[knnPredictions]] between the broadcast-exact and the
    * IVF plans. Mirrors [[Dedup.MaxSigBroadcastBytes]]'s role: an
    * estimate, compared against nTrain x row-footprint, kept far under
    * Spark's 8 GB broadcast hard limit. */
  val MaxTrainBroadcastBytes: Long = 512L * 1024 * 1024

  /** Neighbor-cut depth held by the session memo — every consumer's k
    * (cl03/cl04 use 5, cl07 uses 5 and 1) is ≤ this, so ONE scoring pass
    * serves them all: top-1 is a prefix of top-5 under the same
    * (cos DESC, cand_id) order. */
  val KnnMaxK = 5

  /** Session-level kNN neighbor memo — the cl04/cl07 twin of
    * [[trainedWeights]] (round-11 rehearsal finding: cl04 re-ran cl03's
    * full test×train scoring — 1197 s ≈ 2× cl03's 598 s at 100×, and
    * cl07 pays it twice more for k=5 and k=1). Unlike cl01, where the
    * model is five doubles and re-scoring is a cheap columnar scan, kNN's
    * expensive part IS the scoring — and the k-independent unit bounded
    * enough to hold is the top-[[KnnMaxK]] neighbor cut: |test|×maxK
    * narrow rows, localCheckpoint'ed so consumers get a block scan with
    * no re-derivation (and no corpus-scale cache pinned — the scored
    * pre-cut frame is |test|×|train| and is never materialized). Keyed by
    * applicationId + corpus + routing budget; deterministic, so a memo
    * hit is oracle-invisible; [[clearModelCache]] clears it.
    *
    * Cache discipline (round-12, mirrors [[Dedup.materializedVerifiedPairs]]):
    * inserting a NEW corpus key evicts (unpersists) the same
    * application's entries for OTHER dirs, so a long-lived session
    * sweeping many corpora pins at most one corpus's checkpoint blocks —
    * with the same invalidation contract as [[Dedup]]'s evictOtherDirs:
    * a lazy neighbor frame held across a different-dir call is no longer
    * executable (its blocks ARE its lineage); materialize before
    * switching corpora.
    * localCheckpoint caveat: blocks are non-recoverable on executor loss
    * and unsafe under dynamic allocation — production sessions with
    * dynamic allocation should checkpoint to reliable storage instead. */
  private val knnCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int, Long), DataFrame]

  /** The memoized top-[[KnnMaxK]] neighbor cut per test vector (rnk = 1
    * is the nearest), shared by every kNN consumer. */
  private[operators] def knnNeighbors(s: SparkSession, dir: String,
      maxTrainBroadcastBytes: Long = MaxTrainBroadcastBytes): DataFrame = {
    val app = s.sparkContext.applicationId
    knnCache.getOrElseUpdate((app, dir, KnnMaxK, maxTrainBroadcastBytes), {
      knnCache.keys.filter(k => k._1 == app && k._2 != dir).foreach { k =>
        knnCache.remove(k).foreach { df =>
          try df.unpersist(blocking = false) catch { case _: Throwable => () }
        }
      }
      Checkpoints.truncate(knnNeighborsUncached(s, dir, maxTrainBroadcastBytes))
    })
  }

  /** The neighbor-cut derivation itself — split, score (routed), top-maxK
    * window cut. Package-visible so PlanAuditSpec pins the SCORING plan
    * shape here (the memoized consumers' plans are block scans by
    * design). */
  private[operators] def knnNeighborsUncached(s: SparkSession, dir: String,
      maxTrainBroadcastBytes: Long = MaxTrainBroadcastBytes): DataFrame = {
    val byCos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cand_id"))
    knnScored(s, dir, maxTrainBroadcastBytes)
      .withColumn("rnk", row_number().over(byCos))
      .filter(col("rnk") <= KnnMaxK)
  }

  /** The unordered kNN prediction set — shared by [[knnClassifierQuery]]
    * (which reports it), [[confusionReportQuery]] (which aggregates it)
    * and [[ensembleQuery]] (k = 5 and 1), so the split/score/cut
    * derivation exists once per session ([[knnNeighbors]]).
    * `maxTrainBroadcastBytes` is the routing guard (tests force the IVF
    * branch by passing 0). */
  private[operators] def knnPredictions(s: SparkSession, dir: String, k: Int,
      maxTrainBroadcastBytes: Long = MaxTrainBroadcastBytes): DataFrame = {
    require(k <= KnnMaxK, s"k=$k exceeds the memoized neighbor depth $KnnMaxK")
    knnVote(knnNeighbors(s, dir, maxTrainBroadcastBytes)
      .filter(col("rnk") <= k))
  }

  /** The md5 80/20 embedding split behind every kNN consumer — one
    * definition so the train/test verdict can never drift between the
    * scorer, the router, and the recall probe. */
  private def knnSplit(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
      .withColumn("h", Curation.md5Prefix32(col("vec_id")).cast("long") % 10)
    val train = emb.filter(col("h") < 8)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"),
        col("label").as("cand_label"))
    val test = Tables.parallel(emb.filter(col("h") >= 8))
      .select(col("vec_id"), col("v").as("qv"), col("label").as("true_label"))
    (train, test)
  }

  /** Exact-scoring budget in test×train comparisons. Under it the kNN is
    * EXACT (broadcast or block-join by the bytes guard); above it the
    * routing derives an approximate IVF (nProbe < nCentroids) from the
    * measured counts — the round-10 adaptiveCap recipe applied to kNN
    * (round-11 verdict: the 100× rehearsal honestly paid 826 s of
    * quadratic exact scoring because the approximate escape required the
    * operator to know to ask). 6e8 comparisons ≈ a minute and a half at
    * the measured local[32] throughput (the 100× rehearsal: 2e9 → 283 s
    * end to end) — the laptop-scale knee; a cluster deployment raises it
    * proportionally to its executor count. Every test corpus sits far
    * below it, so the sf oracles stay bit-identical exact. */
  val KnnScoreBudget: Long = 600000000L

  /** The derived routing for a corpus: exact under [[KnnScoreBudget]];
    * else IVF with √nTrain centroids (clamped) and the largest nProbe
    * whose expected candidate volume nTest·nProbe·(nTrain/nCentroids)
    * stays inside the budget. Deterministic from the corpus counts, so
    * memo hits and the recall probe agree on the route. */
  private[operators] case class KnnRoute(nTrain: Long, nTest: Long,
      exact: Boolean, nCentroids: Int, nProbe: Int)

  // the route (two corpus counts) and the recall estimate (an nTrain-
  // scale sampled probe on the approximate route) are deterministic per
  // (application, corpus, budget) — memoized like the models, so a cl03
  // rebuild costs neither extra embedding scans nor a probe re-run
  private val knnRouteCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Long), KnnRoute]
  private val knnRecallCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int, Long), Double]

  private[operators] def knnRoute(s: SparkSession, dir: String,
      budget: Long = KnnScoreBudget): KnnRoute =
    knnRouteCache.getOrElseUpdate(
      (s.sparkContext.applicationId, dir, budget), {
        val (train, test) = knnSplit(s, dir)
        val nTrain = train.count()
        val nTest = test.count()
        val work = nTest * math.max(1L, nTrain)
        if (work <= budget) KnnRoute(nTrain, nTest, exact = true, 16, 16)
        else {
          val nc = math.min(4096,
            math.max(64, math.ceil(math.sqrt(nTrain.toDouble)).toInt))
          val np = math.min(nc.toLong,
            math.max(1L, budget / math.max(1L, work / nc))).toInt
          KnnRoute(nTrain, nTest, exact = false, nc, np)
        }
      })

  /** The scored (test × candidate) frame behind the neighbor cut —
    * routed exact (broadcast vs block-join by the bytes guard) under the
    * comparison budget, approximate IVF above it. */
  private def knnScored(s: SparkSession, dir: String,
      maxTrainBroadcastBytes: Long): DataFrame = {
    val (train, test) = knnSplit(s, dir)
    val route = knnRoute(s, dir)
    if (route.exact) {
      // bytes guard: estimated broadcast footprint of the train side
      // (count is a cheap columnar job; dim from the table contract)
      val estBytes = route.nTrain * (8L * 64 + 64)
      if (estBytes <= maxTrainBroadcastBytes)
        test.join(broadcast(train))
          .withColumn("cos", round(Similarity.cosine(col("qv"), col("cv")), 6))
          .select(col("vec_id"), col("true_label"), col("cand_id"),
            col("cand_label"), col("cos"))
      else knnScoredIvf(train, test)
    } else {
      logger.warn(s"knn: ${route.nTest} x ${route.nTrain} exact comparisons " +
        s"exceed KnnScoreBudget ($KnnScoreBudget); routing to APPROXIMATE " +
        s"IVF (nCentroids=${route.nCentroids}, nProbe=${route.nProbe}) - " +
        "cl03 reports the sampled recall@k beside its predictions")
      knnScoredIvf(train, test, route.nCentroids, route.nProbe)
    }
  }

  /** Sample size of the recall probe: exact top-k is recomputed for this
    * many deterministically-chosen test vectors (smallest md5 prefix,
    * vec_id tie-break) and compared against the routed neighbors —
    * nTrain×200 comparisons, ~1/1000 of the exact scan it audits. */
  val KnnRecallSampleN = 200

  /** Measured recall@k of the routed neighbor cut: 1.0 by construction
    * on the exact route (no work); on the approximate route, the sampled
    * |approx∩exact|/k average, HALF_UP 4dp. Deterministic: the sample,
    * both top-k cuts, and the division are all fixed. */
  private[operators] def knnRecallAtK(s: SparkSession, dir: String, k: Int,
      budget: Long = KnnScoreBudget): Double =
    knnRecallCache.getOrElseUpdate(
      (s.sparkContext.applicationId, dir, k, budget),
      knnRecallAtKUncached(s, dir, k, budget))

  private def knnRecallAtKUncached(s: SparkSession, dir: String, k: Int,
      budget: Long): Double = {
    val route = knnRoute(s, dir, budget)
    if (route.exact) 1.0
    else {
      val (train, test) = knnSplit(s, dir)
      // IVF scoring is per-test-vector independent (centroids and list
      // assignment derive from train alone), so running the SAME routed
      // derivation on just the sampled queries reproduces the full
      // pass's neighbors for those queries — the probe never re-scores
      // the whole test side.
      val sample = test
        .withColumn("hp", Curation.md5Prefix32(col("vec_id")))
        .orderBy(col("hp"), col("vec_id")).limit(KnnRecallSampleN)
        .select(col("vec_id"), col("qv"), col("true_label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val byCos = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cand_id"))
      val exactTop = train.join(broadcast(sample.select(col("vec_id"), col("qv"))))
        .withColumn("cos", round(Similarity.cosine(col("qv"), col("cv")), 6))
        .withColumn("rnk", row_number().over(byCos))
        .filter(col("rnk") <= k)
        .select(col("vec_id"), col("cand_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val approxTop = knnScoredIvf(train, sample, route.nCentroids, route.nProbe)
        .withColumn("rnk", row_number().over(byCos))
        .filter(col("rnk") <= k)
        .select(col("vec_id"), col("cand_id"))
      val denom = exactTop.count()
      val hits =
        exactTop.join(approxTop, Seq("vec_id", "cand_id"), "left_semi").count()
      exactTop.unpersist(blocking = false)
      sample.unpersist(blocking = false)
      if (denom == 0L) 1.0
      else BigDecimal.valueOf(hits.toDouble / denom.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).doubleValue
    }
  }

  /** The above-budget kNN scan (the sim04 IVF routing): deterministic
    * coarse centroids = the `nCentroids` smallest-id train vectors
    * (broadcast — tiny); every train vector assigned to its nearest
    * centroid by cosine (argmax aggregation, map-side combined); each
    * test vector probes its `nProbe` nearest centroids' inverted lists,
    * and NOTHING broadcasts the train table — the candidate scan is an
    * equi-join keyed by centroid id.
    *
    * With the DEFAULT nProbe = nCentroids every list is probed: the scan
    * is EXACT — a block-partitioned join replacing the broadcast, which
    * is the correct above-budget *exact* plan (exact kNN must score every
    * train vector; what the budget forbids is the broadcast, not the
    * work), and what lets ClassifierSpec prove routed == exact
    * bit-for-bit. Lowering nProbe below nCentroids is the approximate
    * IVF speedup knob (the sim04 tradeoff: candidate cost scales with
    * nTrain x nProbe/nCentroids, recall is corpus-dependent). */
  private[operators] def knnScoredIvf(train: DataFrame, test: DataFrame,
      nCentroids: Int = 16, nProbe: Int = 16): DataFrame = {
    val cent = train.orderBy(col("cand_id")).limit(nCentroids)
      .select(col("cand_id").as("cid"), col("cv").as("centv"))
    val assign = train.join(broadcast(cent))
      .withColumn("ccos", Similarity.cosine(col("cv"), col("centv")))
      .groupBy(col("cand_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc"))).as("cid"),
        first(col("cv")).as("cv"), first(col("cand_label")).as("cand_label"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val probes = test.join(broadcast(cent))
      .withColumn("ccos", Similarity.cosine(col("qv"), col("centv")))
      .withColumn("r", row_number().over(wp))
      .filter(col("r") <= nProbe)
      .select(col("vec_id"), col("true_label"), col("qv"), col("cid"))
    probes.join(assign, "cid")
      .withColumn("cos", round(Similarity.cosine(col("qv"), col("cv")), 6))
      .select(col("vec_id"), col("true_label"), col("cand_id"),
        col("cand_label"), col("cos"))
  }

  /** Shared kNN tail: majority vote (ties on smaller label) over an
    * already-cut neighbor frame — ONE definition for both routings. The
    * neighbor cut itself (top-k by rounded cosine, id tie-break) lives in
    * [[knnNeighbors]] so the memo can hold it k-independently. */
  private def knnVote(neighbors: DataFrame): DataFrame = {
    val byVotes = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("n_votes").desc, col("cand_label"))
    neighbors
      .groupBy(col("vec_id"), col("true_label"), col("cand_label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(byVotes))
      .filter(col("vr") === 1)
      .select(col("vec_id"), col("true_label"),
        col("cand_label").as("pred_label"), col("n_votes"),
        (col("cand_label") === col("true_label")).as("correct"))
  }

  /** cl04 — per-class evaluation report over the cl03 predictions: support
    * (n_true), prediction volume (n_pred), true positives, and rounded
    * precision/recall/F1 — the standard classifier scorecard, emitted as a
    * query so the evaluation itself is oracle-checked. Classes never
    * predicted report NULL precision (0/0), and F1 is NULL when
    * precision+recall is 0 — the scikit-style conventions, made explicit.
    *
    * Determinism: counts are exact integers; precision/recall round 6dp
    * BEFORE entering the F1 formula, which is the same fixed op sequence
    * on both sides.
    *
    * Plan shape for 100 TB: two label-scale aggregates over the prediction
    * set joined FULL OUTER at |labels| rows — the report costs nothing
    * beyond cl03 itself. */
  def confusionReportQuery(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val pred = knnPredictions(s, dir, k)
    val byTrue = pred.groupBy(col("true_label").as("label"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("tp"))
    val byPred = pred.groupBy(col("pred_label").as("label"))
      .agg(count(lit(1)).as("n_pred"))
    byTrue.join(byPred, Seq("label"), "full_outer")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision",
        when(col("n_pred") > 0,
          round(col("tp").cast("double") / col("n_pred").cast("double"), 6)))
      .withColumn("recall",
        when(col("n_true") > 0,
          round(col("tp").cast("double") / col("n_true").cast("double"), 6)))
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
            col("precision") + col("recall") > 0.0,
          round(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 6)))
      .orderBy(col("label"))
  }

  /** cl05 — nearest-centroid (Rocchio) embedding classifier: per-label
    * mean embedding on the train split, classify each test vector to the
    * centroid with the highest cosine — the cheapest linear-probe-style
    * baseline over a frozen embedding space (and the model a SemDeDup-era
    * pipeline uses to audit whether its embeddings separate its labels at
    * all before paying for kNN). Same md5 80/20 split as [[knnPredictions]]
    * so the two classifiers are comparable on the identical test set.
    *
    * Determinism: centroid components are round(avg, 6) per (label, dim) —
    * the [[Similarity.kmeansFit]] recipe — assembled in dimension order;
    * cosines round 6dp; the argmax is a row_number over (cos DESC, label)
    * — a total order both engines compute identically.
    *
    * Plan shape for 100 TB: the centroid pass is one map-side-combined
    * aggregate keyed (label, dim) — |labels| x dim cells regardless of
    * corpus size; the grid broadcasts (tiny by construction) over ONE pass
    * of the test stream. No corpus shuffle, no pairwise work anywhere —
    * the reason Rocchio is the probe you run before kNN. */
  def centroidClassifierQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
      .withColumn("h", Curation.md5Prefix32(col("vec_id")).cast("long") % 10)
    val train = emb.filter(col("h") < 8)
    val test = Tables.parallel(emb.filter(col("h") >= 8))
      .select(col("vec_id"), col("v").as("qv"), col("label").as("true_label"))
    val cent = train
      .select(col("label").as("cl"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cl"), col("pos"))
      .agg(round(avg(col("x")), 6).as("cx"))
      .groupBy(col("cl"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
        e => e.getField("cx")).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cl"))
    test.join(broadcast(cent))
      .withColumn("cos", round(Similarity.cosine(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("true_label"), col("cl").as("pred_label"),
        col("cos").as("best_cos"),
        (col("cl") === col("true_label")).as("correct"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB SQL replicating [[centroidClassifierQuery]] exactly (same md5
    * split, same per-dim rounded centroid means in dimension order, same
    * sequential-fold cosine, same argmax tie-break). */
  def centroidClassifierOracleSql(dim: Int = 64): String = {
    def fold(a: String, b: String): String =
      s"""(list_sum(list_transform(range(1, len($a)+1), i -> $a[CAST(i AS INT)]*$b[CAST(i AS INT)])) /
         (sqrt(list_sum(list_transform(range(1, len($a)+1), i -> $a[CAST(i AS INT)]*$a[CAST(i AS INT)]))) *
          sqrt(list_sum(list_transform(range(1, len($b)+1), i -> $b[CAST(i AS INT)]*$b[CAST(i AS INT)])))))"""
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
                   CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 10 AS h
                 FROM embeddings),
      train AS (SELECT v, label FROM e WHERE h < 8),
      test AS (SELECT vec_id, v, label AS true_label FROM e WHERE h >= 8),
      cent AS (SELECT cl, list(cx ORDER BY pos) AS cv FROM (
                 SELECT label AS cl, t.i AS pos,
                        round(avg(v[CAST(t.i AS INT)]), 6) AS cx
                 FROM train CROSS JOIN range(1, ${dim + 1}) t(i)
                 GROUP BY label, t.i) z GROUP BY cl),
      sc AS (SELECT t.vec_id, t.true_label, c.cl,
                    round(${fold("t.v", "c.cv")}, 6) AS cos
             FROM test t CROSS JOIN cent c)
      SELECT vec_id, true_label, cl AS pred_label, cos AS best_cos,
             cl = true_label AS correct
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, cl) AS rn FROM sc) z
      WHERE rn = 1 ORDER BY vec_id"""
  }

  /** cl06 — calibration report (the reliability diagram behind Expected
    * Calibration Error, Guo et al. 2017): bin [[qualityClassifierQuery]]'s
    * scores into `bins` equal-width confidence bins and compare each bin's
    * mean confidence against its empirical accuracy — the standard audit
    * of whether a quality filter's scores can be used as sampling weights
    * (an uncalibrated filter silently skews the mixture when its scores
    * feed sa10-style weighted sampling).
    *
    * Bins are RANGE-NORMALIZED — equal-width over [min(score), max(score)]
    * rather than [0, 1] — because a filter whose scores concentrate near
    * the base rate (this corpus: everything ~0.1) would collapse into one
    * [0,1]-width bin and the diagram would audit nothing.
    *
    * Determinism: min/max over the 6dp-rounded scores are order-free; the
    * bin index is floor((score-lo)/(hi-lo)*bins) — a fixed IEEE op
    * sequence on identical doubles — clamped to bins-1 at score = hi (and
    * 0 when the distribution is a point); accuracy is an exact integer
    * ratio; mean confidence is an order-dependent avg → rounded 6dp; the
    * gap is computed FROM the two rounded values, so it is a fixed op
    * sequence both engines share.
    *
    * Plan shape for 100 TB: a 1-row min/max aggregate broadcast back over
    * the score stream, then one |bins|-cell map-side-combined aggregate —
    * on top of cl01's scoring pass (which itself is exchange-free
    * columnar), the report adds two cheap passes and no corpus exchange.
    * The GD training chain is paid once per session ([[trainedWeights]]
    * memo), not re-derived here. */
  def calibrationReportQuery(s: SparkSession, dir: String, iters: Int = 8,
      trusted: String = "src0", bins: Int = 10): DataFrame = {
    val scored = qualityClassifierQuery(s, dir, iters, trusted)
    val mm = scored.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    scored.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("hi") > col("lo"),
          least(floor((col("score") - col("lo")) / (col("hi") - col("lo")) * bins),
            lit((bins - 1).toLong)))
          .otherwise(lit(0L)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("score")), 6).as("avg_conf"),
        round(sum(col("label")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("accuracy"))
      .withColumn("gap", round(abs(col("avg_conf") - col("accuracy")), 6))
      .orderBy(col("bin"))
  }

  /** DuckDB SQL replicating [[calibrationReportQuery]] exactly: the cl01
    * oracle (same `iters` spec) as a subquery, then the identical binning
    * and rounded-ratio arithmetic. */
  def calibrationOracleSql(iters: Int = 8, trusted: String = "src0",
      bins: Int = 10): String = s"""
      WITH q AS (${qualityClassifierOracleSql(iters, trusted)}),
      mm AS (SELECT min(score) AS lo, max(score) AS hi FROM q),
      b AS (SELECT CASE WHEN hi > lo
                     THEN least(CAST(floor((score - lo) / (hi - lo) * $bins)
                                  AS BIGINT), ${bins - 1})
                     ELSE 0 END AS bin, label, score
            FROM q CROSS JOIN mm)
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             round(avg(score), 6) AS avg_conf,
             round(CAST(sum(label) AS DOUBLE) / count(*), 6) AS accuracy,
             round(abs(round(avg(score), 6) -
                       round(CAST(sum(label) AS DOUBLE) / count(*), 6)), 6) AS gap
      FROM b GROUP BY bin ORDER BY bin"""

  /** cl07 — classifier ensemble over the shared train/test split: majority
    * vote of three label predictors on the embedding task — kNN at k=5
    * (cl03), its 1-NN variant, and the nearest-centroid probe (cl05).
    * With three voters the vote reduces to a closed form: if the two
    * secondary voters agree AGAINST the primary, they win 2–1; every
    * other configuration (3–0, any 2–1 including the primary, or a
    * three-way split) resolves to the primary kNN-5 prediction — the
    * deterministic tie-break. Reports each voter's label, the ensemble
    * label, the agreement count and correctness: the standard cheap
    * accuracy lift (and disagreement AUDIT — rows with n_agree = 1 are
    * exactly the examples worth human review).
    *
    * Determinism: every voter is an already-oracle-checked deterministic
    * query; the vote is integer CASE logic on their labels.
    *
    * Plan shape for 100 TB: composes the audited cl03/cl05 plans (the
    * ir10/pl03 composition pattern — each component honestly re-pays its
    * pass); the ensemble joins run on the TEST split only (20% of vec
    * ids, ids+labels — never vectors). */
  def ensembleQuery(s: SparkSession, dir: String): DataFrame = {
    val k5 = knnPredictions(s, dir, 5)
      .select(col("vec_id"), col("true_label"), col("pred_label").as("knn5"))
    val k1 = knnPredictions(s, dir, 1)
      .select(col("vec_id"), col("pred_label").as("knn1"))
    val ce = centroidClassifierQuery(s, dir)
      .select(col("vec_id"), col("pred_label").as("centroid"))
    val j = k5.join(k1, "vec_id").join(ce, "vec_id")
    val ens = when(col("knn1") === col("centroid") &&
      col("knn1") =!= col("knn5"), col("knn1")).otherwise(col("knn5"))
    j.select(col("vec_id"), col("true_label"), col("knn5"), col("knn1"),
        col("centroid"), ens.as("ensemble_label"),
        when(col("knn5") === col("knn1") && col("knn1") === col("centroid"), 3L)
          .when(col("knn5") === col("knn1") || col("knn5") === col("centroid") ||
            col("knn1") === col("centroid"), 2L)
          .otherwise(1L).as("n_agree"),
        (ens === col("true_label")).as("correct"))
      .orderBy(col("vec_id"))
  }

  /** cl08 — cross-model language-ID agreement matrix: ta01's n-gram
    * heuristic vs cl02's naive-Bayes, bucketed by (heuristic prediction,
    * NB prediction) with each cell's doc count and both models'
    * declared-label hit counts. The disagreement AUDIT a curation
    * pipeline reads before trusting either filter — cells off the
    * diagonal are exactly the documents worth a better model, and the
    * per-cell correctness counts say which model to believe there.
    *
    * Determinism: composes two oracle-checked deterministic predictions;
    * the matrix is integer censuses.
    *
    * Plan shape for 100 TB: ta01 is a zero-exchange columnar pass and
    * cl02 a vocabulary-scale NB; the agreement join is doc-keyed
    * (ids+labels, never text) and the output is |langs|² rows. */
  def langAgreementQuery(s: SparkSession, dir: String): DataFrame = {
    val h = TextAnalysis.langIdQuery(s, dir)
      .select(col("doc_id"), col("pred_lang").as("heuristic_lang"),
        col("declared_lang"))
    val nb = naiveBayesLangQuery(s, dir).filter(col("predicted"))
      .select(col("doc_id"), col("cand_lang").as("nb_lang"))
    h.join(nb, "doc_id")
      .groupBy(col("heuristic_lang"), col("nb_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("heuristic_lang") === col("declared_lang"), 1L)
          .otherwise(0L)).as("n_heuristic_correct"),
        sum(when(col("nb_lang") === col("declared_lang"), 1L).otherwise(0L))
          .as("n_nb_correct"))
      .withColumn("agree", col("heuristic_lang") === col("nb_lang"))
      .orderBy(col("heuristic_lang"), col("nb_lang"))
  }

  /** DuckDB SQL replicating [[langAgreementQuery]] exactly — both
    * predictions embedded as the SHARED ta01/cl02 oracle definitions. */
  def langAgreementOracleSql: String = s"""
      WITH h AS (SELECT doc_id, pred_lang AS heuristic_lang, declared_lang
                 FROM (${TextAnalysis.langIdOracleSql}) hz),
      nb AS (SELECT doc_id, cand_lang AS nb_lang
             FROM (${naiveBayesLangOracleSql()}) nz WHERE predicted)
      SELECT heuristic_lang, nb_lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN heuristic_lang = declared_lang THEN 1
                           ELSE 0 END) AS BIGINT) AS n_heuristic_correct,
             CAST(sum(CASE WHEN nb_lang = declared_lang THEN 1
                           ELSE 0 END) AS BIGINT) AS n_nb_correct,
             heuristic_lang = nb_lang AS agree
      FROM h JOIN nb USING (doc_id)
      GROUP BY heuristic_lang, nb_lang
      ORDER BY heuristic_lang, nb_lang"""

  /** Threshold-grid resolution for [[thresholdSweepQuery]]: 21 operating
    * points at 0.05 steps. Membership is evaluated on the score BIN
    * (floor(score·20) ≥ j ⟺ score ≥ j/20 exactly, since j is an
    * integer), so the grid compare is pure integer arithmetic. */
  val SweepSteps = 20

  /** cl09 — operating-point sweep (the PR curve behind choosing cl01's
    * production threshold): precision / recall / F1 of the quality
    * classifier at every threshold j/20, j = 0..20 — the report an
    * operator reads BEFORE committing the 0.5 default cl04 evaluates at
    * a single point. The dd20 sweep discipline applied to a classifier:
    * scores are computed ONCE (the cl01 pass, weights as literals), then
    * REDUCED to a ≤ 2·(steps+1)-row (bin, label) histogram before any
    * threshold logic — the grid joins that tiny aggregate, never the
    * corpus, so sweeping 21 points costs the same one scan as scoring.
    *
    * Determinism: scores are cl01's 6dp-rounded sigmoids; bins and all
    * tp/fp/fn are exact integers; precision/recall/F1 are guarded IEEE
    * divisions rounded 6dp (the cl04 formula sequence).
    *
    * Plan shape for 100 TB: cl01's columnar scoring scan → map-side
    * combined (bin, label) count, COLLECTED — the histogram is bounded by
    * CONSTRUCTION at 2·(steps+1) = 42 rows (bin ∈ [0, steps] because the
    * sigmoid score ∈ [0,1]; label ∈ {0,1}), so this is a counted driver
    * fold like [[Dedup]]'s, not a data-dependent one — and re-emitted as
    * a LocalRelation. The ONE action behind the collect is the only
    * corpus scan the sweep ever runs (round-10 advice: the grid join and
    * the n_pos reduction each re-ran the full scoring pass); the RETURNED
    * plan reads only the 42-row local histogram and the 21-row grid —
    * corpus-free, which PlanAuditSpec pins. n_pos folds on the driver
    * from the same histogram. */
  def thresholdSweepQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = qualityClassifierQuery(s, dir)
      .select(col("label"), floor(col("score") * SweepSteps).as("bin"))
    val histRows = scored.groupBy(col("bin"), col("label"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val hist = histRows.toDF("bin", "label", "cnt")
    val nPos = histRows.collect { case (_, 1L, c) => c }.sum
    val grid = s.range(0, SweepSteps + 1).select(col("id").as("j"))
    val joined = grid.join(broadcast(hist), col("bin") >= col("j"), "left")
    val swept = joined.groupBy(col("j"))
      .agg(
        coalesce(sum(when(col("label") === 1L, col("cnt"))), lit(0L)).as("tp"),
        coalesce(sum(when(col("label") === 0L, col("cnt"))), lit(0L)).as("fp"))
    swept
      .select(col("j"), col("tp"), col("fp"),
        (lit(nPos) - col("tp")).as("fn"))
      .withColumn("threshold",
        round(col("j").cast("double") / SweepSteps, 2))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0, round(col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"), 6)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0, round(col("tp").cast("double") /
          (col("tp") + col("fn")).cast("double"), 6)))
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
            col("precision") + col("recall") > 0.0,
          round(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 6)))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        col("precision"), col("recall"), col("f1"))
      .orderBy(col("threshold"))
  }

  /** DuckDB SQL replicating [[thresholdSweepQuery]] exactly — the shared
    * cl01 oracle as the scored subquery, the same bin histogram, grid
    * compare and guarded ratio sequence. */
  def thresholdSweepOracleSql(iters: Int = 8): String = s"""
      WITH cl01 AS (SELECT * FROM (${qualityClassifierOracleSql(iters)})),
      hist AS (SELECT CAST(floor(score * $SweepSteps) AS BIGINT) AS bin,
                      label, CAST(count(*) AS BIGINT) AS cnt
               FROM cl01 GROUP BY 1, 2),
      grid AS (SELECT CAST(x AS BIGINT) AS j
               FROM range(0, ${SweepSteps + 1}) t(x)),
      swept AS (SELECT j,
                  CAST(coalesce(sum(CASE WHEN label = 1 THEN cnt END), 0) AS BIGINT) AS tp,
                  CAST(coalesce(sum(CASE WHEN label = 0 THEN cnt END), 0) AS BIGINT) AS fp
                FROM grid LEFT JOIN hist ON bin >= j GROUP BY j),
      pos AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_pos
              FROM hist WHERE label = 1),
      base AS (SELECT j, tp, fp, n_pos - tp AS fn,
                 round(CAST(j AS DOUBLE) / $SweepSteps, 2) AS threshold,
                 CASE WHEN tp + fp > 0
                      THEN round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
                 END AS precision,
                 CASE WHEN tp + (n_pos - tp) > 0
                      THEN round(CAST(tp AS DOUBLE) / CAST(tp + (n_pos - tp) AS DOUBLE), 6)
                 END AS recall
               FROM swept CROSS JOIN pos)
      SELECT threshold, tp, fp, fn, precision, recall,
             CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
                       AND precision + recall > 0.0
                  THEN round(2.0 * precision * recall / (precision + recall), 6)
             END AS f1
      FROM base ORDER BY threshold"""
}
