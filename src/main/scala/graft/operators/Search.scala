package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text

/** Keyword search over the corpus: BM25 relevance scoring and top-k
  * retrieval for a fixed term set — the "find the documents most about X"
  * primitive behind relevance filtering and targeted corpus slicing.
  *
  * Plan shape for 100 TB: no inverted index is materialized and nothing is
  * exploded — per-term TFs are columnar count-occurrence expressions, the
  * corpus statistics (N, avgdl, per-term df) reduce to ONE row via a
  * map-side partial aggregate, and that row is broadcast back over the
  * corpus for scoring. Two narrow passes over the scan plus a
  * TakeOrderedAndProject top-k: each task keeps k rows, the driver merges
  * 32 x k — the corpus is never globally sorted. */
object Search {

  /** Query terms for the oracle-checked bm25 query (all present in the
    * synthetic vocabulary). */
  val QueryTerms: Seq[String] = Seq("spark", "join", "window")
  val K1 = 1.2
  val B = 0.75
  val TopK = 50

  /** BM25 top-k: score = sum_t idf_t * tf_t*(k1+1) / (tf_t + k1*(1-b+b*dl/avgdl))
    * with the Lucene-style smoothed idf = ln((N-df+0.5)/(df+0.5) + 1).
    * All inputs to the floating-point score are exact integers (tf, df, N,
    * dl) or exact ratios of integer sums (avgdl), and the arithmetic is
    * written in the same association order as the oracle SQL, so the only
    * cross-engine wobble is ln()'s last ulp — absorbed by the 4dp round.
    * Ties in the rounded score break on doc_id: fully deterministic top-k. */
  def bm25TopK(s: SparkSession, dir: String, terms: Seq[String] = QueryTerms,
      k: Int = TopK): DataFrame = {
    val perDoc = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), Text.normText(col("text")).as("t"))
      .select(col("doc_id"), Text.tokenCount(col("t")).as("dl"),
        Text.doubledSpaces(col("t")).as("dd"))
      .select(Seq(col("doc_id"), col("dl")) ++ terms.map(t =>
        Text.wordOccurrencesInDoubled(col("dd"), t).as(s"tf_$t")): _*)
    val aggCols = Seq(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(aggCols.head, aggCols.tail: _*)
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      val idf = log((col("n_docs").cast("double") - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * (K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / col("avgdl")))
    }
    perDoc.crossJoin(broadcast(stats))
      .select(Seq(col("doc_id")) ++ terms.map(t => col(s"tf_$t")) :+
        round(terms.map(termScore).reduce(_ + _), 4).as("bm25"): _*)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Inverted-index construction (the artifact behind [[bm25TopK]] when the
    * term set is NOT fixed): per term, document frequency, total term
    * frequency, and the first `cap` posting doc_ids in ascending order.
    * Emitted for terms with df >= `minDf` (index pruning).
    *
    * Plan shape for 100 TB: explode tokens → ONE shuffle on term with
    * map-side partial aggregation; postings are capped (slice) so no
    * unbounded list ever crosses the wire — the classic "build the postings
    * table" job. Downstream lookups are then broadcast/shuffle joins
    * against this artifact. */
  /** The shared tokenization contract of the index-building operators
    * (ir02/ir03): normText + single-space split, one exploded row per
    * token occurrence. */
  private def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), explode(split(Text.normText(col("text")), " ")).as("term"))

  def invertedIndex(s: SparkSession, dir: String, minDf: Long = 25,
      cap: Int = 8): DataFrame = {
    tokens(s, dir)
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        concat_ws(",", slice(array_sort(collect_list(col("doc_id"))), 1, cap))
          .as("postings_head"))
      .filter(col("df") >= minDf)
      .orderBy(col("term"))
  }

  /** DuckDB SQL replicating [[invertedIndex]] exactly. */
  val invertedIndexOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM d),
      tfs AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id)
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS total_tf,
             array_to_string(list_sort(list(doc_id))[1:8], ',') AS postings_head
      FROM tfs GROUP BY term HAVING count(*) >= 25 ORDER BY term"""

  /** Per-document tf-idf top terms (the document-vector twin of the
    * query-side [[bm25TopK]]): each document's `k` most characteristic
    * terms by tf x ln(N/df), the keyword-extraction primitive behind
    * topic labeling and sparse retrieval indexes.
    *
    * Plan shape for 100 TB: two map-side-combined shuffles keyed by
    * (doc_id, term) and term build the tf and df tables; N is one
    * broadcast row; ranking is a per-doc window that Catalyst's
    * InferWindowGroupLimit cuts to k rows per map task BEFORE the
    * doc-keyed exchange. Scores are rounded 6dp BEFORE ranking so the
    * rank itself is engine-portable (ties break on the term string). */
  def tfIdfTopTerms(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    // tf feeds BOTH the df aggregate and the score join: persist it once
    // (round-14) — unpersisted, the tokenize + (doc, term) exchange + agg
    // ran twice; released by the session cache-clear between queries
    val tf = tokens(s, dir)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score", round(col("tf").cast("double") *
        log(col("n_docs").cast("double") / col("df").cast("double")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("score"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** DuckDB SQL replicating [[tfIdfTopTerms]] exactly (k = 5). */
  val tfIdfOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM d),
      tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM toks GROUP BY doc_id, term),
      dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      sc AS (SELECT doc_id, term,
               round(CAST(tf AS DOUBLE) *
                 ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
             FROM tf JOIN dfx USING (term) CROSS JOIN n)
      SELECT doc_id, term, score, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY score DESC, term) AS rnk FROM sc) z
      WHERE rnk <= 5 ORDER BY doc_id, rnk"""

  /** Boolean conjunctive retrieval (the AND-query primitive under every
    * corpus-slicing tool): documents containing ALL query terms, ranked by
    * total matched-term frequency (desc, doc_id asc). Scoring is EXACT
    * integer arithmetic end-to-end — unlike [[bm25TopK]] there is no float
    * anywhere, so the ranking is bit-deterministic by construction.
    *
    * Plan shape for 100 TB: identical to bm25's — per-term TFs are columnar
    * count-occurrence expressions over ONE narrow corpus scan (no explode,
    * no index, no join), the conjunctive filter prunes before the top-k,
    * and the k-row TakeOrderedAndProject never globally sorts the corpus.
    * With a pre-built [[invertedIndex]] this becomes a postings
    * intersection; the scan form here is the index-free baseline that works
    * on any corpus snapshot. */
  def booleanRetrieval(s: SparkSession, dir: String,
      terms: Seq[String] = QueryTerms, k: Int = TopK): DataFrame = {
    val perDoc = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), Text.normText(col("text")).as("t"))
      .select(col("doc_id"), Text.doubledSpaces(col("t")).as("dd"))
      .select(Seq(col("doc_id")) ++ terms.map(t =>
        Text.wordOccurrencesInDoubled(col("dd"), t).as(s"tf_$t")): _*)
    perDoc
      .filter(terms.map(t => col(s"tf_$t") > 0).reduce(_ && _))
      .withColumn("total_tf", terms.map(t => col(s"tf_$t")).reduce(_ + _))
      .orderBy(col("total_tf").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB SQL replicating [[booleanRetrieval]] exactly (same
    * doubled-space occurrence counting, same integer ranking). */
  def booleanRetrievalOracleSql: String = {
    def occ(w: String): String =
      s"CAST((length(dd) - length(regexp_replace(dd, ' \\Q$w\\E ', '', 'g'))) / ${w.length + 2} AS BIGINT)"
    val tfCols = QueryTerms.map(t => s"${occ(t)} AS tf_$t").mkString(",\n               ")
    val andPred = QueryTerms.map(t => s"tf_$t > 0").mkString(" AND ")
    val totalTf = QueryTerms.map(t => s"tf_$t").mkString(" + ")
    val tfOut = QueryTerms.map(t => s"tf_$t").mkString(", ")
    s"""
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      d2 AS (SELECT doc_id, replace(' ' || t || ' ', ' ', '  ') AS dd FROM d),
      perdoc AS (SELECT doc_id,
               $tfCols
             FROM d2)
      SELECT doc_id, $tfOut, $totalTf AS total_tf
      FROM perdoc WHERE $andPred
      ORDER BY total_tf DESC, doc_id LIMIT $TopK"""
  }

  /** DuckDB SQL replicating [[bm25TopK]]: same tokenization (doubled-space
    * occurrence counting), same one-row corpus stats, same association
    * order in the score arithmetic. */
  def bm25OracleSql: String = {
    def occ(w: String): String =
      s"CAST((length(dd) - length(regexp_replace(dd, ' \\Q$w\\E ', '', 'g'))) / ${w.length + 2} AS BIGINT)"
    val tfCols = QueryTerms.map(t => s"${occ(t)} AS tf_$t").mkString(",\n               ")
    val dfCols = QueryTerms.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      .mkString(",\n               ")
    val scoreTerms = QueryTerms.map { t =>
      val idf = s"ln((CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5) + 1.0)"
      s"$idf * (CAST(tf_$t AS DOUBLE) * ${K1 + 1.0}) / " +
        s"(CAST(tf_$t AS DOUBLE) + $K1 * ((1.0 - $B) + $B * CAST(dl AS DOUBLE) / avgdl))"
    }.mkString(" + ")
    val tfOut = QueryTerms.map(t => s"tf_$t").mkString(", ")
    s"""
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      d2 AS (SELECT doc_id,
               CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(length(t) - length(regexp_replace(t, ' ', '', 'g')) + 1 AS BIGINT)
               END AS dl,
               replace(' ' || t || ' ', ' ', '  ') AS dd
             FROM d),
      perdoc AS (SELECT doc_id, dl,
               $tfCols
             FROM d2),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl,
               $dfCols
             FROM perdoc)
      SELECT doc_id, $tfOut, round($scoreTerms, 4) AS bm25
      FROM perdoc CROSS JOIN stats
      ORDER BY bm25 DESC, doc_id LIMIT $TopK"""
  }

  /** The oracle-checked phrase for [[phraseSearch]] (both words in the
    * synthetic vocabulary, frequently adjacent). */
  val Phrase: Seq[String] = Seq("table", "scan")

  /** Exact phrase search over a positional index (the capability a plain
    * term index cannot express — "table scan" as CONSECUTIVE tokens, not
    * co-occurrence): per document, the number of positions where the full
    * phrase matches. Implemented the way a positional inverted index
    * resolves phrases: per-term posting lists of (doc, position), aligned by
    * shifting term i's positions back by i and intersecting — a chain of
    * equi-joins on (doc_id, aligned_position). All-integer: bit-exact by
    * construction.
    *
    * Plan shape for 100 TB: the positional explode is filtered to the
    * phrase's terms BEFORE anything shuffles (for a 2-word phrase that is a
    * tiny fraction of the token stream), then each join is keyed on
    * (doc_id, pos) — AQE broadcasts the smaller posting list at typical
    * selectivities and falls back to a co-partitioned shuffle join when both
    * terms are frequent; every join in the chain reuses the same key, so
    * the chain adds no extra exchanges. The corpus text never shuffles. */
  def phraseSearch(s: SparkSession, dir: String,
      phrase: Seq[String] = Phrase): DataFrame = {
    require(phrase.length >= 2, "phrase search needs at least two terms")
    val pos = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"),
        posexplode(split(Text.normText(col("text")), " ")).as(Seq("pos", "w")))
      .filter(col("w").isin(phrase.distinct: _*))
    def positionsOf(w: String, shift: Int): DataFrame =
      pos.filter(col("w") === w)
        .select(col("doc_id"), (col("pos") - shift).as("p"))
    phrase.zipWithIndex.tail
      .foldLeft(positionsOf(phrase.head, 0)) { case (acc, (w, i)) =>
        acc.join(positionsOf(w, i), Seq("doc_id", "p"))
      }
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[phraseSearch]] exactly: the same posting
    * lists derived positionally (1-based; adjacency is shift-invariant),
    * the same shifted-intersection join chain. Terms are escaped as SQL
    * string literals, so a phrase containing a quote cannot break (or
    * inject into) the generated oracle. */
  def phraseSearchOracleSql(phrase: Seq[String] = Phrase): String = {
    def lit(w: String) = w.replace("'", "''")
    val joins = phrase.zipWithIndex.tail.map { case (w, i) =>
      s"JOIN pw t$i ON t$i.doc_id = t0.doc_id AND t$i.i = t0.i + $i AND t$i.w = '${lit(w)}'"
    }.mkString("\n        ")
    s"""
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      ws AS (SELECT doc_id, string_split(t, ' ') AS ws FROM d),
      pos AS (SELECT doc_id, unnest(range(1, len(ws)+1)) AS i, ws FROM ws),
      pw AS (SELECT doc_id, CAST(i AS BIGINT) AS i, ws[CAST(i AS INT)] AS w FROM pos)
      SELECT t0.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM pw t0
        $joins
      WHERE t0.w = '${phrase.head.replace("'", "''")}'
      GROUP BY t0.doc_id ORDER BY t0.doc_id"""
  }

  /** ir06 — term-association mining: pointwise mutual information of term
    * pairs co-occurring in a document, restricted to the mid-frequency
    * band `minDf ≤ df ≤ maxDf` (the standard collocation cut: stopwords
    * are uninformative and rare words unstable). PMI = ln(N·c_ab /
    * (c_a·c_b)) over document-level presence counts — the query-expansion
    * / related-terms primitive of every retrieval stack.
    *
    * The band is RELATIVE (percent of N, compared by exact integer
    * cross-multiplication — no float thresholds), so the same defaults are
    * meaningful at sf0.001 and at 100 TB: absolute df cuts silently empty
    * out or saturate as N scales.
    *
    * Determinism: every count is an exact integer; the PMI is ONE ln over
    * one integer-derived ratio (no summation), rounded 6dp; ranking uses
    * the rounded value with (term_a, term_b) tie-break.
    *
    * Plan shape for 100 TB: presence sets reduce map-side to (doc, term)
    * distinct; the df table is vocabulary-scale and joins back by
    * BROADCAST, so only band-surviving terms reach the doc-keyed self-join
    * — the per-doc pair fan-out is bounded by the band width (the maxDf
    * cut kills the stopword quadratic exactly where it would explode);
    * pair counts combine map-side and the top-k is TakeOrderedAndProject. */
  def pmiCooccurQuery(s: SparkSession, dir: String, minDfPct: Int = 5,
      maxDfPct: Int = 95, minPairPct: Int = 2, k: Int = 100): DataFrame = {
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    // distinct() on (doc_id, term) deduplicates WITHIN documents only, so
    // the corpus-scale distinct exchange it planned was pure overhead:
    // array_distinct on the token array is partition-local and the
    // presence stream never shuffles un-aggregated (round-15; idle A/B
    // 2.44 → 1.61/1.50 s at sf0.1). The round-14 persist of the distinct
    // frame is GONE with the exchange — it re-measured SLOWER on every
    // clean window (the cl02 anti-pattern: caching a corpus-scale
    // near-unique frame costs more than recomputing the cheap explode).
    val present = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), explode(array_distinct(
        split(graft.functions.Text.normText(col("text")), " "))).as("term"))
    val df = present.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df") * 100 >= col("n_docs") * minDfPct &&
        col("df") * 100 <= col("n_docs") * maxDfPct)
      .select(col("term"), col("df"))
    val banded = present.join(broadcast(df), "term")
    banded.alias("a")
      .join(banded.alias("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .select(col("a.term").as("term_a"), col("b.term").as("term_b"),
        col("a.df").as("df_a"), col("b.df").as("df_b"))
      .groupBy(col("term_a"), col("term_b"), col("df_a"), col("df_b"))
      .agg(count(lit(1)).as("n_ab"))
      .crossJoin(broadcast(n))
      .filter(col("n_ab") * 100 >= col("n_docs") * minPairPct)
      .withColumn("pmi", round(log(
        (col("n_ab") * col("n_docs")).cast("double") /
          (col("df_a") * col("df_b")).cast("double")), 6))
      .select(col("term_a"), col("term_b"), col("n_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("term_a"), col("term_b"))
      .limit(k)
  }

  /** DuckDB SQL replicating [[pmiCooccurQuery]] exactly (same relative
    * band via the same integer cross-multiplications, same single-ln op
    * sequence — parameterized def so non-default cuts cannot drift from
    * the declared oracle). */
  def pmiCooccurOracleSql(minDfPct: Int = 5, maxDfPct: Int = 95,
      minPairPct: Int = 2, k: Int = 100): String = s"""
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      present AS (SELECT DISTINCT doc_id, unnest(string_split(t, ' ')) AS term FROM d),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM present, n
             GROUP BY term, n_docs
             HAVING count(*) * 100 >= n_docs * $minDfPct
                AND count(*) * 100 <= n_docs * $maxDfPct),
      banded AS (SELECT p.doc_id, p.term, df.df FROM present p JOIN df USING (term)),
      pairs AS (SELECT a.term AS term_a, b.term AS term_b,
                       a.df AS df_a, b.df AS df_b,
                       CAST(count(*) AS BIGINT) AS n_ab
                FROM banded a JOIN banded b
                  ON a.doc_id = b.doc_id AND a.term < b.term
                GROUP BY 1, 2, 3, 4)
      SELECT term_a, term_b, n_ab,
             round(ln(CAST(n_ab * n_docs AS DOUBLE) /
                      CAST(df_a * df_b AS DOUBLE)), 6) AS pmi
      FROM pairs, n
      WHERE n_ab * 100 >= n_docs * $minPairPct
      ORDER BY pmi DESC, term_a, term_b LIMIT $k"""

  val KwicTerm = "spark"
  val KwicContext = 20

  /** ir07 — keyword-in-context (KWIC) snippets: for every document
    * containing `term`, its first occurrence position in the normalized
    * text, the NON-OVERLAPPING substring-occurrence count (replace-length
    * math — the same left-to-right greedy contract both engines' replace
    * implements; a self-overlapping term like "aaa" counts its greedy
    * occurrences, not every offset), and a ±`ctx`-char snippet around the
    * first hit — the "show me the matches" presentation layer over
    * [[bm25TopK]]-style retrieval. `term` is treated as a LITERAL string
    * (it is spliced into the oracle SQL with quote doubling, and reaches
    * instr/replace as a literal, never a pattern).
    *
    * All columns are integer positions and deterministic substrings (the
    * engines share 1-based substring clamping semantics), so the check is
    * exact with no rounding.
    *
    * Plan shape for 100 TB: a zero-exchange columnar pass (position,
    * count, slice are all scalar expressions over the scanned text) plus
    * the output sort — the ta01 class. */
  def kwicQuery(s: SparkSession, dir: String, term: String = KwicTerm,
      ctx: Int = KwicContext): DataFrame =
    Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), Text.normText(col("text")).as("t"))
      .withColumn("pos", instr(col("t"), term).cast("long"))
      .filter(col("pos") > 0)
      .select(col("doc_id"), col("pos"),
        ((length(col("t")) - length(replace(col("t"), lit(term), lit(""))))
          / term.length).cast("long").as("n_occ"),
        substring(col("t"),
          greatest(lit(1), col("pos") - ctx).cast("int"),
          lit(ctx + term.length + ctx)).as("snippet"))
      .orderBy(col("doc_id"))

  /** DuckDB SQL replicating [[kwicQuery]] exactly (same 1-based positions,
    * same clamped slice). */
  def kwicOracleSql(term: String = KwicTerm, ctx: Int = KwicContext): String = {
    val lit = term.replace("'", "''") // SQL string-literal escape
    s"""
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      p AS (SELECT doc_id, t, CAST(strpos(t, '$lit') AS BIGINT) AS pos FROM d)
      SELECT doc_id, pos,
             CAST((length(t) - length(replace(t, '$lit', ''))) // ${term.length}
               AS BIGINT) AS n_occ,
             substr(t, CAST(greatest(1, pos - $ctx) AS INT),
                    ${ctx + term.length + ctx}) AS snippet
      FROM p WHERE pos > 0
      ORDER BY doc_id"""
  }

  /** Dirichlet prior for [[lmDirichletTopK]] — small because the synthetic
    * docs are short (avgdl ~ tens of tokens); exact in double (2^k * 25). */
  val Mu = 100.0

  /** ir08 — query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty 2001): score = sum_t ln((tf_t + mu*(cf_t/C)) / (dl + mu)),
    * where cf_t is the corpus frequency of t and C the total token count —
    * the language-modeling alternative to [[bm25TopK]]'s probabilistic
    * ranking (it never zeroes out a document missing a term, so it is the
    * ranker of choice for short/noisy corpora).
    *
    * Same determinism contract as bm25: every ln() input is built from
    * exact integers (tf, cf, dl, C) in the same association order on both
    * engines, so the only cross-engine wobble is ln's last ulp — absorbed
    * by the 4dp round; ties break on doc_id.
    *
    * Plan shape for 100 TB: identical to bm25's — per-term TFs are
    * columnar count-occurrence expressions (nothing explodes), the corpus
    * statistics (per-term cf, total C) reduce to ONE row via a map-side
    * partial aggregate, and that row broadcasts back over the corpus for
    * scoring. Two narrow scan passes + a TakeOrderedAndProject top-k. */
  def lmDirichletTopK(s: SparkSession, dir: String,
      terms: Seq[String] = QueryTerms, k: Int = TopK): DataFrame = {
    val perDoc = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), Text.normText(col("text")).as("t"))
      .select(col("doc_id"), Text.tokenCount(col("t")).as("dl"),
        Text.doubledSpaces(col("t")).as("dd"))
      .select(Seq(col("doc_id"), col("dl")) ++ terms.map(t =>
        Text.wordOccurrencesInDoubled(col("dd"), t).as(s"tf_$t")): _*)
    val aggCols = Seq(sum(col("dl")).as("c_total")) ++
      terms.map(t => sum(col(s"tf_$t")).as(s"cf_$t"))
    val stats = perDoc.agg(aggCols.head, aggCols.tail: _*)
    def termScore(t: String): Column =
      log((col(s"tf_$t").cast("double") +
        lit(Mu) * (col(s"cf_$t").cast("double") / col("c_total").cast("double"))) /
        (col("dl").cast("double") + lit(Mu)))
    perDoc.crossJoin(broadcast(stats))
      .select(Seq(col("doc_id"), col("dl")) ++ terms.map(t => col(s"tf_$t")) :+
        round(terms.map(termScore).reduce(_ + _), 4).as("lm_score"): _*)
      .orderBy(col("lm_score").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB SQL replicating [[lmDirichletTopK]] exactly (same doubled-space
    * occurrence counting as the bm25 oracle, same integer corpus stats,
    * same ln association order, same 4dp round + doc_id tie-break). */
  def lmDirichletOracleSql(terms: Seq[String] = QueryTerms,
      k: Int = TopK): String = {
    def occ(w: String): String =
      s"CAST((length(dd) - length(regexp_replace(dd, ' \\Q$w\\E ', '', 'g'))) / ${w.length + 2} AS BIGINT)"
    val tfCols = terms.map(t => s"${occ(t)} AS tf_$t").mkString(",\n               ")
    val cfCols = terms.map(t => s"CAST(sum(tf_$t) AS BIGINT) AS cf_$t")
      .mkString(",\n               ")
    val scoreTerms = terms.map { t =>
      s"ln((CAST(tf_$t AS DOUBLE) + $Mu * (CAST(cf_$t AS DOUBLE) / CAST(c_total AS DOUBLE))) / " +
        s"(CAST(dl AS DOUBLE) + $Mu))"
    }.mkString(" + ")
    val tfOut = terms.map(t => s"tf_$t").mkString(", ")
    s"""
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      d2 AS (SELECT doc_id,
               CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(length(t) - length(regexp_replace(t, ' ', '', 'g')) + 1 AS BIGINT)
               END AS dl,
               replace(' ' || t || ' ', ' ', '  ') AS dd
             FROM d),
      perdoc AS (SELECT doc_id, dl,
               $tfCols
             FROM d2),
      stats AS (SELECT CAST(sum(dl) AS BIGINT) AS c_total,
               $cfCols
             FROM perdoc)
      SELECT doc_id, dl, $tfOut, round($scoreTerms, 4) AS lm_score
      FROM perdoc CROSS JOIN stats
      ORDER BY lm_score DESC, doc_id LIMIT $k"""
  }

  /** Reciprocal-rank-fusion constant (Cormack/Clarke/Buettcher 2009's
    * k=60 — dampens the top-rank dominance of either system). */
  val RrfK = 60.0
  /** Fused-list size for [[rrfFusionTopK]]. */
  val RrfOut = 25

  /** ir10 — reciprocal rank fusion of the two retrieval systems this
    * engine ships: [[bm25TopK]] (probabilistic) and [[lmDirichletTopK]]
    * (language-modeling), both over the same fixed query. Each system
    * contributes 1/(k + rank) for documents in its top-[[TopK]] list (0
    * when absent); the fused ranking is the standard way to combine
    * retrieval signals without score calibration.
    *
    * Determinism: ranks are integer row numbers over each system's already
    * 4dp-rounded, doc_id-tie-broken ordering; the fused score is a sum of
    * two IEEE divisions of exact integers in fixed order, identical bit
    * patterns on both engines; ties break on doc_id.
    *
    * Plan shape for 100 TB: both base rankings end in a
    * TakeOrderedAndProject top-k, so each input here is k rows. The rank
    * row_number windows and the full-outer join run on 2×k rows — driver
    * scale by construction (the deliberate single-partition window is over
    * a top-k result, never the corpus). Corpus cost = the two base scans,
    * which share plan shape (no index, no explode). */
  def rrfFusionTopK(s: SparkSession, dir: String, k: Int = TopK,
      out: Int = RrfOut): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bm = bm25TopK(s, dir, k = k).select(col("doc_id"),
      row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
        .cast("long").as("bm25_rank"))
    val lm = lmDirichletTopK(s, dir, k = k).select(col("doc_id"),
      row_number().over(Window.orderBy(col("lm_score").desc, col("doc_id")))
        .cast("long").as("lm_rank"))
    def part(r: Column): Column =
      coalesce(lit(1.0) / (lit(RrfK) + r.cast("double")), lit(0.0))
    bm.join(lm, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("lm_rank"),
        round(part(col("bm25_rank")) + part(col("lm_rank")), 6)
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(out)
  }

  /** DuckDB SQL replicating [[rrfFusionTopK]] exactly — the two base
    * rankings are embedded as subqueries of the bm25/LM oracles (same
    * 4dp rounds, same tie-breaks), so the fusion oracle stays in lockstep
    * with the systems it fuses. */
  def rrfFusionOracleSql(out: Int = RrfOut): String = s"""
      WITH bm AS (SELECT doc_id,
                    row_number() OVER (ORDER BY bm25 DESC, doc_id)
                      AS bm25_rank
                  FROM ($bm25OracleSql) bmb),
      lm AS (SELECT doc_id,
               row_number() OVER (ORDER BY lm_score DESC, doc_id) AS lm_rank
             FROM (${lmDirichletOracleSql()}) lmb)
      SELECT COALESCE(bm.doc_id, lm.doc_id) AS doc_id,
             bm25_rank, lm_rank,
             round(COALESCE(1.0 / ($RrfK + CAST(bm25_rank AS DOUBLE)), 0.0) +
                   COALESCE(1.0 / ($RrfK + CAST(lm_rank AS DOUBLE)), 0.0), 6)
               AS rrf_score
      FROM bm FULL OUTER JOIN lm ON bm.doc_id = lm.doc_id
      ORDER BY rrf_score DESC, doc_id LIMIT $out"""

  /** Feedback-set size for [[queryExpansionTerms]] (top of the bm25
    * ranking treated as pseudo-relevant). */
  val PrfDocs = 10
  /** Expansion terms emitted by [[queryExpansionTerms]]. */
  val PrfTerms = 15

  /** ir11 — pseudo-relevance-feedback query expansion (Robertson/Sparck
    * Jones): treat the bm25 top-[[PrfDocs]] as relevant, score every corpus
    * term by offer weight = r * RSJ, where r is the term's document
    * frequency INSIDE the feedback set and RSJ is the relevance-smoothed
    * idf ln(((r+0.5)/(R-r+0.5)) / ((df-r+0.5)/(N-R-df+r+0.5))); emit the
    * top-[[PrfTerms]] terms excluding the original query. The classic
    * second-pass retrieval move (RM3/Rocchio family) — and at corpus scale
    * the way a curation pipeline discovers "what else is this topic
    * called".
    *
    * Determinism: r, R, df, N are exact integers; the ln argument is built
    * in the same association order on both engines; 4dp round on the offer
    * weight; ties break on term.
    *
    * Plan shape for 100 TB: the feedback set is [[PrfDocs]] ids —
    * broadcast. Corpus term stats are the ir02 explode + map-side-combined
    * (term, doc) aggregate (the ONE vocabulary-scale shuffle); r rides the
    * same pass as a conditional count against the broadcast id set, so
    * feedback stats add ZERO extra exchanges. TakeOrderedAndProject
    * top-k on the term table. */
  def queryExpansionTerms(s: SparkSession, dir: String,
      terms: Seq[String] = QueryTerms, r0: Int = PrfDocs,
      out: Int = PrfTerms): DataFrame = {
    val fb = bm25TopK(s, dir, k = r0).select(col("doc_id"))
    val n = Tables.parallel(Tables.documents(s, dir))
      .agg(count(lit(1)).as("n_docs"))
    val perTerm = tokens(s, dir)
      .join(broadcast(fb.withColumn("in_fb", lit(1L))), Seq("doc_id"),
        "left_outer")
      .groupBy(col("term"), col("doc_id"))
      .agg(max(coalesce(col("in_fb"), lit(0L))).as("in_fb"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("in_fb")).as("r"))
    val rsjNum = (col("r").cast("double") + 0.5) /
      (lit(r0.toDouble) - col("r").cast("double") + 0.5)
    val rsjDen = (col("df").cast("double") - col("r").cast("double") + 0.5) /
      (col("n_docs").cast("double") - lit(r0.toDouble) -
        col("df").cast("double") + col("r").cast("double") + 0.5)
    perTerm.crossJoin(broadcast(n))
      .filter(col("r") > 0 && !col("term").isin(terms: _*))
      .select(col("term"), col("df"), col("r"),
        round(col("r").cast("double") * log(rsjNum / rsjDen), 4)
          .as("offer_weight"))
      .orderBy(col("offer_weight").desc, col("term"))
      .limit(out)
  }

  /** DuckDB SQL replicating [[queryExpansionTerms]] exactly — the feedback
    * set is the bm25 oracle's top-[[PrfDocs]] as a subquery, so expansion
    * stays in lockstep with the ranking it feeds back. */
  def queryExpansionOracleSql(terms: Seq[String] = QueryTerms,
      r0: Int = PrfDocs, out: Int = PrfTerms): String = {
    val exclude = terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""
      WITH fb AS (SELECT doc_id FROM ($bm25OracleSql) b
                  ORDER BY bm25 DESC, doc_id LIMIT $r0),
      d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
            FROM documents),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
      toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM d),
      td AS (SELECT term, doc_id,
                    max(CASE WHEN doc_id IN (SELECT doc_id FROM fb)
                             THEN 1 ELSE 0 END) AS in_fb
             FROM toks GROUP BY term, doc_id),
      pt AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
                    CAST(sum(in_fb) AS BIGINT) AS r
             FROM td GROUP BY term)
      SELECT term, df, r,
             round(CAST(r AS DOUBLE) * ln(
               ((CAST(r AS DOUBLE) + 0.5) /
                (CAST($r0 AS DOUBLE) - CAST(r AS DOUBLE) + 0.5)) /
               ((CAST(df AS DOUBLE) - CAST(r AS DOUBLE) + 0.5) /
                (CAST(n_docs AS DOUBLE) - CAST($r0 AS DOUBLE) -
                 CAST(df AS DOUBLE) + CAST(r AS DOUBLE) + 0.5))), 4)
               AS offer_weight
      FROM pt CROSS JOIN n
      WHERE r > 0 AND term NOT IN ($exclude)
      ORDER BY offer_weight DESC, term LIMIT $out"""
  }

  /** NDCG cutoffs reported by [[ndcgEvalQuery]]. */
  val NdcgCutoffs: Seq[Int] = Seq(1, 3, 5, 10)
  /** Positional discounts 1/log2(i+1) for ranks 1..max cutoff, computed
    * ONCE here and injected as literal doubles into BOTH the Spark plan
    * and the oracle SQL (round-trip decimal form), so the transcendental
    * never runs on either engine — bit-identical discounts by
    * construction. */
  val NdcgDiscounts: Seq[Double] =
    (1 to NdcgCutoffs.max).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** ir12 — graded NDCG@n of the LM-Dirichlet ranking judged against
    * bm25-derived relevance grades (gold rank 1–3 → grade 3, 4–10 → 2,
    * rest of the top-[[TopK]] → 1, unretrieved → 0): for each cutoff in
    * [[NdcgCutoffs]], DCG = Σ_{i≤n} (2^grade_i − 1)·disc(i) over the
    * system ranking, IDCG the same sum over the grade multiset sorted
    * descending, NDCG their ratio. The standard graded retrieval-eval
    * metric — ir09 grades ANN recall against exact kNN the same way; this
    * grades one audited ranking against another, the harness a pipeline
    * uses to A/B retrieval variants before swapping them into curation.
    *
    * Determinism: grades and gains (2^g − 1 ∈ {0,1,3,7}) are exact;
    * discounts are shared literal doubles (see [[NdcgDiscounts]]); each
    * term is ONE multiply; both folds run in ascending position order
    * (the gr01 ordered-fold recipe, `list_sum(list(... ORDER BY ...))` on
    * the oracle side); 6dp round on output only.
    *
    * Plan shape for 100 TB: both base rankings end in
    * TakeOrderedAndProject top-k, so everything downstream — grade join,
    * cutoff cross join, folds — runs on ≤ 4·k rows (driver scale by
    * construction). Corpus cost = the two base scans, unchanged from
    * ir03/ir08. */
  def ndcgEvalQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxCut = NdcgCutoffs.max
    val gold = bm25TopK(s, dir).select(col("doc_id"),
      row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
        .as("grank"))
      .select(col("doc_id"),
        when(col("grank") <= 3, 3).when(col("grank") <= 10, 2).otherwise(1)
          .as("grade"))
    val sys = lmDirichletTopK(s, dir).select(col("doc_id"),
      row_number().over(Window.orderBy(col("lm_score").desc, col("doc_id")))
        .as("srank"))
    val disc = array(NdcgDiscounts.map(lit): _*)
    val cuts = s.range(1, maxCut + 1L).select(col("id").as("n"))
      .filter(col("n").isin(NdcgCutoffs.map(_.toLong): _*))
    def orderedFold(pos: Column, term: Column): Column =
      aggregate(
        transform(array_sort(collect_list(struct(pos.as("p"), term.as("t")))),
          x => x.getField("t")),
        lit(0.0d), (acc, x) => acc + x)
    val sterms = sys.join(gold, Seq("doc_id"), "left")
      .filter(col("srank") <= maxCut)
      .select(col("srank"),
        ((pow(lit(2.0), coalesce(col("grade"), lit(0)).cast("double")) -
          lit(1.0)) * element_at(disc, col("srank"))).as("term"))
    val dcg = cuts.join(broadcast(sterms), col("srank") <= col("n"))
      .groupBy(col("n")).agg(orderedFold(col("srank"), col("term")).as("dcg"))
    val iterms = gold
      .select(row_number().over(
        Window.orderBy(col("grade").desc, col("doc_id"))).as("ipos"),
        col("grade"))
      .filter(col("ipos") <= maxCut)
      .select(col("ipos"),
        ((pow(lit(2.0), col("grade").cast("double")) - lit(1.0)) *
          element_at(disc, col("ipos"))).as("term"))
    val idcg = cuts.join(broadcast(iterms), col("ipos") <= col("n"))
      .groupBy(col("n")).agg(orderedFold(col("ipos"), col("term")).as("idcg"))
    dcg.join(idcg, Seq("n"))
      .select(col("n"), round(col("dcg"), 6).as("dcg"),
        round(col("idcg"), 6).as("idcg"),
        round(col("dcg") / col("idcg"), 6).as("ndcg"))
      .orderBy(col("n"))
  }

  /** DuckDB SQL replicating [[ndcgEvalQuery]] exactly — the two base
    * rankings embed as subqueries of the bm25/LM oracles (the ir10
    * pattern), the discounts arrive as the SAME literal doubles the Spark
    * plan carries, and both folds order by position. */
  def ndcgEvalOracleSql(): String = {
    val maxCut = NdcgCutoffs.max
    val discRows = NdcgDiscounts.zipWithIndex
      .map { case (d, i) => s"(${i + 1}, $d)" }.mkString(", ")
    val cutRows = NdcgCutoffs.map(n => s"($n)").mkString(", ")
    s"""
      WITH gold AS (SELECT doc_id,
                      row_number() OVER (ORDER BY bm25 DESC, doc_id) AS grank
                    FROM ($bm25OracleSql) bmb),
      grades AS (SELECT doc_id,
                   CASE WHEN grank <= 3 THEN 3 WHEN grank <= 10 THEN 2
                        ELSE 1 END AS grade
                 FROM gold),
      sys AS (SELECT doc_id,
                row_number() OVER (ORDER BY lm_score DESC, doc_id) AS srank
              FROM (${lmDirichletOracleSql()}) lmb),
      disc AS (SELECT * FROM (VALUES $discRows) AS t(pos, d)),
      cuts AS (SELECT CAST(n AS BIGINT) AS n
               FROM (VALUES $cutRows) AS c(n)),
      sterms AS (SELECT s.srank,
                   (pow(2.0, CAST(coalesce(g.grade, 0) AS DOUBLE)) - 1.0) * t.d
                     AS term
                 FROM sys s LEFT JOIN grades g USING (doc_id)
                   JOIN disc t ON t.pos = s.srank
                 WHERE s.srank <= $maxCut),
      dcg AS (SELECT n, list_sum(list(term ORDER BY srank)) AS dcg
              FROM cuts JOIN sterms ON srank <= n GROUP BY n),
      ideal AS (SELECT row_number() OVER (ORDER BY grade DESC, doc_id)
                         AS ipos, grade
                FROM grades),
      iterms AS (SELECT ipos,
                   (pow(2.0, CAST(grade AS DOUBLE)) - 1.0) * t.d AS term
                 FROM ideal JOIN disc t ON t.pos = ipos
                 WHERE ipos <= $maxCut),
      idcg AS (SELECT n, list_sum(list(term ORDER BY ipos)) AS idcg
               FROM cuts JOIN iterms ON ipos <= n GROUP BY n)
      SELECT n, round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
             round(dcg / idcg, 6) AS ndcg
      FROM dcg JOIN idcg USING (n) ORDER BY n"""
  }

  /** Title-field weight for [[bm25fTopK]] (body weight is 1). Integer so
    * the weighted tf/length stay exact. */
  val TitleWeight = 2L

  /** ir13 — BM25F fielded retrieval: documents carry no explicit title, so
    * the field split is deterministic structure — title = the first
    * sentence (prefix through the first `[.!?]+` run of the normalized
    * text), body = the remainder. Per term, the weighted tf is
    * [[TitleWeight]]·tf_title + tf_body and the weighted length is
    * [[TitleWeight]]·len_title + len_body (the simple-BM25F/field-weight
    * formulation); df and the scoring then run exactly as ir01's BM25 on
    * the weighted quantities. A match in the opening sentence outranks the
    * same match buried mid-document — the structure-aware ranking ir01
    * cannot express.
    *
    * Determinism: weighted tf/length are exact integers (integer weight),
    * df/N exact counts, avgdl an exact-integer-sum ratio; the score is the
    * ir01 association order — ln()'s last ulp absorbed by the 4dp round;
    * ties break on doc_id.
    *
    * Plan shape for 100 TB: identical to ir01 — field extraction and
    * per-field TFs are per-row columnar expressions on the scan (nothing
    * explodes), stats reduce to ONE broadcast row, TakeOrderedAndProject
    * top-k. */
  def bm25fTopK(s: SparkSession, dir: String,
      terms: Seq[String] = QueryTerms, k: Int = TopK): DataFrame = {
    val W = TitleWeight
    val fields = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), Text.normText(col("text")).as("t"))
      .withColumn("title", regexp_extract(col("t"), "^[^.!?]*[.!?]*", 0))
      .withColumn("body", trim(expr("substr(t, length(title) + 1)")))
    val perDoc = fields
      .select(Seq(col("doc_id"),
        (lit(W) * Text.tokenCount(col("title")) + Text.tokenCount(col("body")))
          .as("dlw"),
        Text.doubledSpaces(col("title")).as("ddt"),
        Text.doubledSpaces(col("body")).as("ddb")): _*)
      .select(Seq(col("doc_id"), col("dlw")) ++ terms.map(t =>
        (lit(W) * Text.wordOccurrencesInDoubled(col("ddt"), t) +
          Text.wordOccurrencesInDoubled(col("ddb"), t)).as(s"tfw_$t")): _*)
    val aggCols = Seq(count(lit(1)).as("n_docs"), avg(col("dlw")).as("avgdl")) ++
      terms.map(t => sum(when(col(s"tfw_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(aggCols.head, aggCols.tail: _*)
    def termScore(t: String): Column = {
      val tf = col(s"tfw_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      val idf = log((col("n_docs").cast("double") - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * (K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dlw").cast("double") / col("avgdl")))
    }
    perDoc.crossJoin(broadcast(stats))
      .select(Seq(col("doc_id")) ++ terms.map(t => col(s"tfw_$t")) :+
        round(terms.map(termScore).reduce(_ + _), 4).as("bm25f"): _*)
      .orderBy(col("bm25f").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB SQL replicating [[bm25fTopK]] exactly (same regex field split,
    * same doubled-space occurrence counting per field, same exact-integer
    * weighted quantities, same ln association order and 4dp round). */
  def bm25fOracleSql(terms: Seq[String] = QueryTerms, k: Int = TopK): String = {
    val W = TitleWeight
    def occ(dd: String, w: String): String =
      s"CAST((length($dd) - length(regexp_replace($dd, ' \\Q$w\\E ', '', 'g'))) / ${w.length + 2} AS BIGINT)"
    def tokCount(x: String): String =
      s"CASE WHEN length($x) = 0 THEN CAST(0 AS BIGINT) " +
        s"ELSE CAST(length($x) - length(replace($x, ' ', '')) + 1 AS BIGINT) END"
    val tfCols = terms.map(t =>
      s"$W * ${occ("ddt", t)} + ${occ("ddb", t)} AS tfw_$t")
      .mkString(",\n               ")
    val dfCols = terms.map(t =>
      s"CAST(sum(CASE WHEN tfw_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      .mkString(",\n               ")
    val scoreTerms = terms.map { t =>
      val idf = s"ln((CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5) + 1.0)"
      s"$idf * (CAST(tfw_$t AS DOUBLE) * ${K1 + 1.0}) / " +
        s"(CAST(tfw_$t AS DOUBLE) + $K1 * ((1.0 - $B) + $B * CAST(dlw AS DOUBLE) / avgdl))"
    }.mkString(" + ")
    val tfOut = terms.map(t => s"tfw_$t").mkString(", ")
    s"""
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      fld AS (SELECT doc_id, regexp_extract(t, '^[^.!?]*[.!?]*') AS title,
                trim(substr(t, length(regexp_extract(t, '^[^.!?]*[.!?]*')) + 1))
                  AS body
              FROM d),
      f2 AS (SELECT doc_id,
               CAST($W * ${tokCount("title")} + ${tokCount("body")} AS BIGINT) AS dlw,
               replace(' ' || title || ' ', ' ', '  ') AS ddt,
               replace(' ' || body || ' ', ' ', '  ') AS ddb
             FROM fld),
      perdoc AS (SELECT doc_id, dlw,
               $tfCols
             FROM f2),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dlw) AS avgdl,
               $dfCols
             FROM perdoc)
      SELECT doc_id, $tfOut, round($scoreTerms, 4) AS bm25f
      FROM perdoc CROSS JOIN stats
      ORDER BY bm25f DESC, doc_id LIMIT $k"""
  }

  /** Snippet window length (tokens) for [[snippetQuery]]. */
  val SnippetWindow = 15
  /** Result size for [[snippetQuery]]. */
  val SnippetDocs = 10

  /** ir14 — result snippet extraction: for each of the bm25 top-
    * [[SnippetDocs]] documents, the [[SnippetWindow]]-token window with
    * the most query-term hits (earliest window on ties) plus its hit
    * count. The "why did this match" display primitive next to ir07's
    * KWIC — KWIC shows every occurrence of ONE term, the snippet picks
    * the single densest multi-term region.
    *
    * Determinism: hit counts are integer folds over token windows; argmax
    * is first-index (array_position/list_position, both 1-based,
    * first-match); the snippet is a pure slice of the normalized tokens.
    *
    * Plan shape for 100 TB: the top-k ids broadcast onto one pruned
    * corpus pass; window scoring is per-row HOF arithmetic on the
    * [[SnippetDocs]] surviving rows only (the join precedes
    * tokenization), so the O(len·window) scan cost is paid by k docs,
    * not the corpus. */
  def snippetQuery(s: SparkSession, dir: String,
      terms: Seq[String] = QueryTerms): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = SnippetWindow
    val ranked = bm25TopK(s, dir, k = SnippetDocs).select(col("doc_id"),
      row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
        .cast("long").as("rank"))
    val termList = terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    Tables.documents(s, dir).join(broadcast(ranked), "doc_id")
      .withColumn("toks", split(Text.normText(col("text")), " "))
      .withColumn("hits", expr(
        s"transform(toks, t -> CASE WHEN t IN ($termList) THEN 1 ELSE 0 END)"))
      .withColumn("cnts", expr(
        s"transform(sequence(1, greatest(size(toks) - ${w - 1}, 1)), " +
          s"i -> aggregate(slice(hits, i, $w), 0, (a, x) -> a + x))"))
      .withColumn("best", array_max(col("cnts")))
      .withColumn("pos", array_position(col("cnts"), col("best")))
      .select(col("doc_id"), col("rank"), col("best").cast("long").as("n_hits"),
        array_join(slice(col("toks"), col("pos").cast("int"), lit(w)), " ")
          .as("snippet"))
      .orderBy(col("rank"))
  }

  /** DuckDB SQL replicating [[snippetQuery]] exactly (same bm25 top-k,
    * same token windows, same integer window sums, same first-index
    * argmax and slice). */
  def snippetOracleSql(terms: Seq[String] = QueryTerms): String = {
    val w = SnippetWindow
    val termList = terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""
      WITH top AS (SELECT doc_id,
                     row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
                   FROM (SELECT * FROM ($bm25OracleSql) bb
                         ORDER BY bm25 DESC, doc_id LIMIT $SnippetDocs) tb),
      t2 AS (SELECT d.doc_id, top.rank,
               string_split(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')), ' ')
                 AS toks
             FROM documents d JOIN top ON top.doc_id = d.doc_id),
      h AS (SELECT doc_id, rank, toks,
              list_transform(toks, t -> CASE WHEN t IN ($termList)
                THEN 1 ELSE 0 END) AS hits
            FROM t2),
      c AS (SELECT doc_id, rank, toks,
              list_transform(range(1, greatest(len(toks) - ${w - 1}, 1) + 1),
                i -> list_sum(list_slice(hits, CAST(i AS INT),
                       CAST(i + ${w - 1} AS INT)))) AS cnts
            FROM h)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank,
             CAST(list_max(cnts) AS BIGINT) AS n_hits,
             array_to_string(list_slice(toks,
               CAST(list_position(cnts, list_max(cnts)) AS INT),
               CAST(list_position(cnts, list_max(cnts)) + ${w - 1} AS INT)),
               ' ') AS snippet
      FROM c ORDER BY rank"""
  }
}
