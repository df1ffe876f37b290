package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text

/** Text analysis for training-data curation: language ID, quality scoring,
  * token counting, fingerprinting. All pure-columnar (codegen'd built-ins) —
  * an embarrassingly parallel map over the corpus with zero shuffles, which
  * is exactly what you want for a 100 TB cleaning pass. */
object TextAnalysis {

  /** SQL mirror of Text.wordOccurrences over a doubled-spaces column `dd`:
    * double the spaces so adjacent occurrences count, \Q..\E-quoted
    * literal, non-overlapping 'g' replace. Shared by the ta01 oracle and
    * the composed sa13 oracle. */
  def occSqlExpr(w: String): String =
    s"CAST((length(dd) - length(regexp_replace(dd, ' \\Q$w\\E ', '', 'g'))) / ${w.length + 2} AS BIGINT)"

  /** SQL form of [[langScoreCols]]: one `<sum> AS score_<lang>` item per
    * profile, over a doubled-spaces column `dd`. */
  def langScoreSqlExprs: Seq[String] = LangProfiles.map { case (l, ws) =>
    ws.map(occSqlExpr).mkString(" + ") + s" AS score_$l"
  }

  /** SQL form of [[bestLangCol]] over score_<lang> columns: argmax with
    * first-profile tie-break — l wins iff score_l > 0, strictly beats
    * every EARLIER profile, and is >= every LATER profile; the branches
    * are mutually exclusive, so CASE order cannot mask a winner. */
  def predLangCaseSql: String = {
    val langs = LangProfiles.map(_._1)
    langs.zipWithIndex.foldRight("'und'") { case ((l, i), acc) =>
      val earlier = langs.take(i).map(p => s"score_$l > score_$p")
      val later = langs.drop(i + 1).map(p => s"score_$l >= score_$p")
      val cond = (s"score_$l > 0" +: (earlier ++ later)).mkString(" AND ")
      s"CASE WHEN $cond THEN '$l' ELSE $acc END"
    }
  }

  /** DuckDB SQL replicating [[langIdQuery]] exactly — generated from the
    * same [[LangProfiles]] so the heuristic and its oracle cannot drift. */
  def langIdOracleSql: String = {
    val scoreExprs = langScoreSqlExprs.mkString(",\n             ")
    val caseExpr = predLangCaseSql
    s"""
      WITH d AS (SELECT doc_id, lang AS declared_lang,
                        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      d2 AS (SELECT doc_id, declared_lang,
                    replace(' ' || t || ' ', ' ', '  ') AS dd FROM d),
      scored AS (
        SELECT doc_id, declared_lang,
             $scoreExprs
        FROM d2)
      SELECT doc_id, declared_lang, $caseExpr AS pred_lang,
             score_en, score_fr, score_de, score_es
      FROM scored ORDER BY doc_id"""
  }

  /** Stopword profiles for the n-gram/stopword language heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "une"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "la", "y", "los", "una"))

  private def langScore(doubled: Column, words: Seq[String]): Column =
    words.map(w => Text.wordOccurrencesInDoubled(doubled, w)).reduce(_ + _)

  /** Per-profile score columns (named score_<lang>) over the doubled-spaces
    * text — the regex formulation, kept as the executable spec the native
    * census is parity-tested against (ExpressionPropertySpec). */
  def langScoreCols(doubled: Column): Seq[Column] =
    LangProfiles.map { case (l, ws) => langScore(doubled, ws).as(s"score_$l") }

  /** Every profile word flattened in profile order — the census layout of
    * [[langCountsCol]]. */
  val AllProfileWords: Seq[String] = LangProfiles.flatMap(_._2)

  /** ONE-pass native census over NORMALIZED (not doubled) text: the whole
    * 20-word language-ID count in a single tokenize scan instead of 20
    * doubled-regex scans. Hoist it into its own projection (the dd
    * discipline) so consumers evaluate it once. */
  def langCountsCol(norm: Column): Column =
    graft.functions.StopwordCounts.counts(norm, AllProfileWords)

  /** score_<lang> columns read off a materialized [[langCountsCol]] array —
    * plain codegen'd getItem sums, same long type and values as
    * [[langScoreCols]]. */
  def langScoreColsFromCounts(counts: Column): Seq[Column] = {
    val offsets = LangProfiles.scanLeft(0) { case (o, (_, ws)) => o + ws.length }
    LangProfiles.zip(offsets).map { case ((l, ws), o) =>
      ws.indices.map(i => counts.getItem(o + i)).reduce(_ + _).as(s"score_$l")
    }
  }

  /** Argmax over the score_<lang> columns with the first-profile tie-break:
    * mutually-exclusive conditions (strictly beats earlier profiles, >=
    * later ones), 'und' when no profile scores — see langIdOracleSql. */
  def bestLangCol: Column = {
    val langs = LangProfiles.map(_._1)
    langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), acc) =>
      val earlier = langs.take(i).map(p => col(s"score_$l") > col(s"score_$p"))
      val later = langs.drop(i + 1).map(p => col(s"score_$l") >= col(s"score_$p"))
      val cond = ((col(s"score_$l") > 0) +: (earlier ++ later)).reduce(_ && _)
      when(cond, lit(l)).otherwise(acc)
    }
  }

  /** Language ID: per-language stopword hit counts; argmax with a
    * deterministic tie-break (higher score wins, then profile order);
    * no hits at all => 'und' (undetermined, BCP-47 style). */
  def langIdQuery(s: SparkSession, dir: String): DataFrame = {
    val txt = Text.normText(col("text"))
    val scored = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), col("lang").as("declared_lang"),
        langCountsCol(txt).as("swc"))
      .select(Seq(col("doc_id"), col("declared_lang")) ++
        langScoreColsFromCounts(col("swc")): _*)
    scored
      .withColumn("pred_lang", bestLangCol)
      .select(col("doc_id"), col("declared_lang"), col("pred_lang"),
        col("score_en"), col("score_fr"), col("score_de"), col("score_es"))
      .orderBy(col("doc_id"))
  }

  /** Quality metrics: char/token counts, mean token length, stopword ratio.
    * Ratios are exact IEEE divisions of integer counts => oracle-stable.
    * A document that normalizes to empty has 0 tokens; its ratios are null
    * (guarded — bare division would throw DIVIDE_BY_ZERO under ANSI mode). */
  def qualityQuery(s: SparkSession, dir: String): DataFrame = {
    // hoist the shared subexpressions (normalized text, token count, doubled
    // text) into their own projections — Catalyst does not CSE identical
    // regex subtrees, so inlining them would re-run the normalize regex and
    // the token-count replace once per ratio (mirrors the oracle's CTEs)
    val tok = col("n_tokens")
    Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), Text.normText(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        Text.tokenCount(col("t")).as("n_tokens"),
        Text.doubledSpaces(col("t")).as("dd"))
      .select(
        col("doc_id"),
        length(col("t")).cast("long").as("n_chars_norm"),
        tok.as("n_tokens"),
        when(tok > 0, (length(col("t")) - tok + 1).cast("double") / tok)
          .as("avg_token_len"),
        when(tok > 0,
          Text.wordOccurrencesInDoubled(col("dd"), "the").cast("double") / tok)
          .as("the_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens + regex "wordpiece-ish" tokens
    * (alpha runs and digit runs counted separately — the BPE-flavored
    * pre-tokenization split). */
  def tokenStatsQuery(s: SparkSession, dir: String): DataFrame = {
    val t = Text.normText(col("text"))
    Tables.parallel(Tables.documents(s, dir))
      .select(
        col("doc_id"),
        Text.tokenCount(t).as("ws_tokens"),
        size(regexp_extract_all(t, lit("[a-z]+|[0-9]+"), lit(0))).cast("long")
          .as("re_tokens"),
        size(array_distinct(split(t, " "))).cast("long").as("uniq_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: md5 of normalized text (oracle-checkable). */
  def fingerprintQuery(s: SparkSession, dir: String): DataFrame = {
    val t = Text.normText(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(t).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  /** Polynomial rolling hash over the token stream: per-token base hash =
    * first 7 hex chars of md5(token) parsed base-16 (< 2^28 — md5 is
    * identical in every engine, same trick as [[graft.functions.Md5SimHash60]]),
    * Horner accumulation mod 2^56-5 so acc*31 + h < 2^62 never overflows
    * under ANSI mode. Fully portable: the DuckDB oracle re-derives the same
    * fold with list_reduce. */
  def rollingHashQuery(s: SparkSession, dir: String): DataFrame = {
    val t = Text.normText(col("text"))
    val P = 72057594037927931L // 2^56 - 5
    val rolling = aggregate(
      transform(split(t, " "),
        w => conv(substring(md5(w), 1, 7), 16, 10).cast("long")), // < 2^28
      lit(1125899906842597L), // seed
      (acc, h) => pmod(acc * 31L + h, lit(P)))
    Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), rolling.as("rolling_hash"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[rollingHashQuery]] exactly: same md5-based
    * token hash, same seeded Horner fold (seed carried via list_prepend —
    * list_reduce has no initial-accumulator form). */
  def rollingHashOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents)
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(1125899906842597 AS BIGINT),
                 list_transform(string_split(t, ' '),
                   w -> CAST(concat('0x', substr(md5(w), 1, 7)) AS BIGINT))),
               (acc, h) -> (acc * 31 + h) % 72057594037927931) AS rolling_hash
      FROM d ORDER BY doc_id"""

  /** CCNet-style language-model quality score: per-document mean unigram
    * log-probability under the corpus's own unigram distribution (a cheap
    * stand-in for the KenLM perplexity filter real pipelines run). Two-pass:
    * (1) corpus vocab = explode tokens, shuffle-count by word (map-side
    * partial agg); (2) re-explode, join tokens to vocab, mean ln(c/t) per
    * doc. The vocab join is left to AQE — at test SF the vocab auto-
    * broadcasts; at 100 TB web-corpus vocab it degrades gracefully to a
    * sort-merge join on the token shuffle, which is the plan you'd want.
    * The token stream is deliberately recomputed from the scan, not
    * persisted: at scale the exploded tokens are ~20x the corpus. Mean is
    * rounded 4dp (order-dependent double agg, per the oracle policy). */
  /** The ONE scored-tokens derivation ta07 and ta17 share — per document,
    * token count and 4dp-rounded mean corpus-relative unigram
    * log-probability. A single definition (mirrored by
    * [[unigramScoredCte]] on the oracle side) so the two operators'
    * semantics cannot drift. */
  private[operators] def unigramScored(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), explode(split(Text.normText(col("text")), " ")).as("word"))
    val vocab = toks.groupBy(col("word")).agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("t"))
    toks
      .join(vocab, "word")
      .crossJoin(total)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("c").cast("double") / col("t").cast("double"))), 4)
          .as("avg_logprob"))
  }

  /** DuckDB twin of [[unigramScored]] — the shared CTE block both oracles
    * open with. */
  private[operators] val unigramScoredCte: String = """
      d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
            FROM documents),
      toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS word FROM d),
      cnt AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
      tot AS (SELECT count(*) AS t FROM toks),
      scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   round(avg(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))), 4)
                     AS avg_logprob
                 FROM toks JOIN cnt USING (word) CROSS JOIN tot
                 GROUP BY doc_id)"""

  def unigramLogProbQuery(s: SparkSession, dir: String): DataFrame =
    unigramScored(s, dir).orderBy(col("doc_id"))

  /** DuckDB oracle for [[unigramLogProbQuery]]: same tokenization, same
    * corpus-relative unigram probabilities, same 4dp-rounded mean. */
  def unigramLogProbOracleSql: String = s"""
      WITH $unigramScoredCte
      SELECT doc_id, n_tokens, avg_logprob FROM scored ORDER BY doc_id"""

  /** Bigram LM quality score — the conditional-probability refinement of
    * [[unigramLogProbQuery]] (one step closer to the KenLM perplexity
    * filters real pipelines run): per document, the mean
    * ln P(w_i | w_{i-1}) = ln( c(w_{i-1} w_i) / c(w_{i-1} ·) ), with both
    * counts taken over the corpus's own bigram stream (every observed
    * bigram has c >= 1, so no smoothing is needed for finiteness).
    *
    * Plan shape for 100 TB: bigrams are emitted positionally by the native
    * [[graft.functions.TokenNgrams]] expression (no token arrays
    * materialized); two map-side-combined count shuffles build the bigram
    * and context tables; the scoring pass re-joins the bigram stream to
    * both — left to AQE, which broadcasts them at test SF and degrades to
    * sort-merge on the bigram key at web-corpus vocab, the plan you'd want.
    * The exploded bigram stream is recomputed, never persisted (~20x the
    * corpus at scale). Mean is rounded 4dp (order-dependent double agg). */
  def bigramLogProbQuery(s: SparkSession, dir: String): DataFrame = {
    val bigrams = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"),
        explode(graft.functions.TokenNgrams.tokenNgrams(
          Text.normText(col("text")), 2)).as("bg"))
    val bgCounts = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    // context counts derive from the bigram counts (c1(w) = Σ c2(w ·)) by
    // aggregating the |vocab|-scale count table — NOT by a second explode
    // of the corpus, which would be a whole wasted pass at 100 TB
    val ctxCounts = bgCounts
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    bigrams
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(bgCounts, "bg")
      .join(ctxCounts, "w1")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log(col("c2").cast("double") / col("c1").cast("double"))), 4)
          .as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[bigramLogProbQuery]]: same bigram stream, same
    * corpus-conditional probabilities, same 4dp-rounded mean. */
  def bigramLogProbOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      tok AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
      bg AS (SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(w), 1)),
                 i -> array_to_string(w[CAST(i AS INT):CAST(i + 1 AS INT)], ' '))) AS g
             FROM tok),
      c2 AS (SELECT g, count(*) AS c2 FROM bg GROUP BY g),
      c1 AS (SELECT split_part(g, ' ', 1) AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(avg(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))), 4) AS avg_logprob
      FROM bg JOIN c2 USING (g)
      JOIN c1 ON split_part(bg.g, ' ', 1) = c1.w1
      GROUP BY doc_id ORDER BY doc_id"""

  /** BPE first-merge statistics — the corpus pass a tokenizer trainer runs
    * (Sennrich et al. 2016): occurrence counts of adjacent within-word
    * character pairs, top-k by frequency (the most frequent pair is BPE's
    * first merge; iterating this map-reduce IS tokenizer training).
    *
    * Plan shape for 100 TB: pairs are emitted by codegen'd substr over a
    * sequence — one map pass, no arrays of the corpus materialized; the
    * count is a map-side-combined aggregate whose key space is bounded by
    * |alphabet|^2, so the exchange carries a few thousand rows per task
    * regardless of corpus size; top-k is TakeOrderedAndProject. Ties break
    * on the pair string, making the cut deterministic. */
  def bpePairsQuery(s: SparkSession, dir: String, topK: Int = 50): DataFrame = {
    val words = Tables.parallel(Tables.documents(s, dir))
      .select(explode(split(Text.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
    words
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** DuckDB oracle for [[bpePairsQuery]] (top 50, same tie-break). */
  def bpePairsOracleSql: String = """
      WITH d AS (SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      w AS (SELECT unnest(string_split(t, ' ')) AS w FROM d),
      p AS (SELECT unnest(list_transform(range(1, length(w)),
              i -> substr(w, CAST(i AS INT), 2))) AS pair
            FROM w WHERE length(w) >= 2)
      SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY pair
      ORDER BY n DESC, pair LIMIT 50"""

  /** Gopher-style repetition quality scores (the repetition-removal rules of
    * Rae et al. 2021 §A1.1, adapted to word n-grams since this corpus has no
    * line structure): per document,
    *   - `top2_ratio`: fraction of normalized characters covered by the most
    *     frequent word 2-gram (count × gram length / n_chars_norm);
    *   - `dup3_ratio`: fraction of characters covered by ALL occurrences of
    *     word 3-grams that occur more than once in the document.
    * Both ratios are exact IEEE divisions of integer counts => oracle-stable
    * with no rounding. Top-gram tie-break: higher count, then
    * lexicographically smaller gram.
    *
    * Plan shape for 100 TB: n-grams are emitted positionally by the native
    * [[graft.functions.TokenNgrams]] expression; each pass is one
    * explode → groupBy(doc_id, gram) count (map-side combined — duplicate
    * grams of a doc collapse before the exchange) followed by a per-doc
    * reduce that reuses the same doc_id key. Per-doc work only — no
    * cross-document joins anywhere, so the operator scales linearly with
    * corpus size like every other cleaning pass here. */
  def repetitionQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), Text.normText(col("text")).as("t"))
    // ONE corpus pass emits both gram sizes pre-tagged (TokenNgramsMulti —
    // a single boundary scan instead of one tokenize per size plus the
    // transform+concat re-wrap), ONE count shuffle on (doc_id, gn, gram)
    // with map-side combine, then a per-doc reduce:
    //   - top 2-gram: min over a (-cnt, gram) struct = highest count then
    //     lexicographically smallest gram, as a plain aggregate (no window
    //     sort); min ignores the null 3-gram rows
    //   - dup-3-gram chars: conditional sum over the same reduce
    val perDoc = docs
      .select(col("doc_id"),
        explode(graft.functions.TokenNgramsMulti
          .tokenNgramsMulti(col("t"), Seq(2, 3))).as("e"))
      .groupBy(col("doc_id"), col("e.gn").as("gn"), col("e.gram").as("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        min(when(col("gn") === 2,
          struct((-col("cnt")).as("neg_cnt"), col("gram"),
            (col("cnt") * length(col("gram"))).as("chars")))).as("g"),
        sum(when(col("gn") === 3 && col("cnt") > 1,
          col("cnt") * length(col("gram"))).otherwise(0L))
          .cast("long").as("dup3_chars"),
        count(when(col("gn") === 3, lit(1))).as("n_tri"))
    docs
      .select(col("doc_id"), length(col("t")).cast("long").as("n_chars_norm"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_chars_norm"), col("g.gram").as("top_bigram"),
        when(col("n_chars_norm") > 0,
          col("g.chars").cast("double") / col("n_chars_norm")).as("top2_ratio"),
        when(col("n_tri") > 0 && col("n_chars_norm") > 0,
          col("dup3_chars").cast("double") / col("n_chars_norm"))
          .as("dup3_ratio"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[repetitionQuery]] exactly (word 2-/3-grams,
    * same tie-break via min_by over (cnt DESC, gram ASC) ordering). */
  val repetitionOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      tok AS (SELECT doc_id, t, string_split(t, ' ') AS w FROM d),
      g2 AS (SELECT doc_id, span, count(*) AS cnt FROM (
               SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 0, 1)),
                 i -> array_to_string(w[CAST(i AS INT):CAST(i + 1 AS INT)], ' '))) AS span
               FROM tok WHERE len(w) >= 2) x
             WHERE len(string_split(span, ' ')) = 2 GROUP BY doc_id, span),
      top2 AS (SELECT doc_id, span AS top_bigram, cnt * length(span) AS top2_chars
               FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY cnt DESC, span ASC) AS rn FROM g2) y WHERE rn = 1),
      g3 AS (SELECT doc_id, span, count(*) AS cnt FROM (
               SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                 i -> array_to_string(w[CAST(i AS INT):CAST(i + 2 AS INT)], ' '))) AS span
               FROM tok WHERE len(w) >= 3) x
             WHERE len(string_split(span, ' ')) = 3 GROUP BY doc_id, span),
      dup3 AS (SELECT doc_id,
                 CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(span) ELSE 0 END) AS BIGINT)
                   AS dup3_chars
               FROM g3 GROUP BY doc_id)
      SELECT d.doc_id, CAST(length(d.t) AS BIGINT) AS n_chars_norm, top_bigram,
             CASE WHEN length(d.t) > 0
                  THEN CAST(top2_chars AS DOUBLE) / length(d.t) END AS top2_ratio,
             CASE WHEN dup3.doc_id IS NOT NULL AND length(d.t) > 0
                  THEN CAST(coalesce(dup3_chars, 0) AS DOUBLE) / length(d.t)
             END AS dup3_ratio
      FROM d LEFT JOIN top2 ON d.doc_id = top2.doc_id
             LEFT JOIN dup3 ON d.doc_id = dup3.doc_id
      ORDER BY d.doc_id"""

  /** Fixed-size token-window chunking — the "split documents into
    * model-context-sized pieces" step every RAG indexing and long-document
    * training pipeline runs. Chunks of `size` tokens are cut every `stride`
    * tokens (stride < size => overlapping context windows); the final chunk
    * may be short. Output one row per (doc, chunk): doc_id, chunk_idx,
    * n_chunk_tokens, chunk_text.
    *
    * Plan shape for 100 TB: the whole operator is a per-row columnar
    * expression (token split, window slice, reassemble) followed by
    * posexplode — ZERO shuffles; it is a flatMap over the scan and
    * parallelizes with the input like the other cleaning passes. The
    * ORDER BY exists only for the correctness harness. */
  def chunkQuery(s: SparkSession, dir: String, width: Int = 32,
      stride: Int = 24): DataFrame = {
    require(stride >= 1 && width >= stride,
      s"need 1 <= stride <= width, got width=$width stride=$stride")
    val toks = split(Text.normText(col("text")), " ")
    // chunk starts at 0, stride, 2*stride, ... while start < n_tokens
    // (n_tokens-1)/stride is a per-document count (int range); the cast
    // back to int after the double division is exact at that magnitude
    val chunks = transform(
      sequence(lit(0), ((size(toks) - 1) / stride).cast("int")),
      i => slice(toks, i * stride + 1, lit(width)))
    Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("c")).cast("long").as("n_chunk_tokens"),
        array_join(col("c"), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** DuckDB SQL replicating [[chunkQuery]] exactly (32-token chunks every
    * 24 tokens; DuckDB list slicing clamps the end like Spark's slice). */
  val chunkOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      tok AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
      idx AS (SELECT doc_id, w,
                     unnest(range(0, (len(w) - 1) // 24 + 1)) AS i
              FROM tok)
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             CAST(len(w[CAST(i*24 + 1 AS INT):CAST(i*24 + 32 AS INT)]) AS BIGINT)
               AS n_chunk_tokens,
             array_to_string(w[CAST(i*24 + 1 AS INT):CAST(i*24 + 32 AS INT)], ' ')
               AS chunk_text
      FROM idx ORDER BY doc_id, chunk_idx"""

  /** Vocabulary encoding — the "tokenize the corpus for training" step:
    * build the vocabulary (id = frequency rank, ties broken
    * lexicographically, 0-based like every tokenizer), then encode each
    * document as its token-id sequence (head capped at `cap` ids for a
    * bounded output schema).
    *
    * Plan shape for 100 TB: vocab build is the unigram count shuffle (map-
    * side combined) + a DISTRIBUTED global frequency rank — the vocab is
    * range-partitioned in rank order, each chunk gets local row_numbers,
    * and chunk offsets (one tiny row per partition) are prefix-summed with
    * a window over the CHUNK table only. A bare `row_number().over(orderBy)`
    * would pull the whole vocab (web-scale: billions of distinct tokens)
    * into ONE task — the same global-cumsum trap [[Curation.packWindowsQuery]]
    * avoids. The assigned ids depend only on the total (count desc, word)
    * order, not on where the range boundaries fall; the vocab is persisted
    * so both consumers of the range exchange see one boundary sample.
    * Encoding then re-explodes the corpus ONCE, joins the vocab (AQE
    * broadcast when it fits, sort-merge otherwise) and reassembles per doc
    * with a positional sort — the exact shape of production tokenizer jobs. */
  def vocabEncodeQuery(s: SparkSession, dir: String, cap: Int = 16): DataFrame = {
    val toks = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"),
        posexplode(split(Text.normText(col("text")), " ")).as(Seq("pos", "word")))
    val chunked = toks.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .repartitionByRange(col("c").desc, col("word"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("c").desc, col("word"))
    val wPids = org.apache.spark.sql.expressions.Window
      .orderBy(col("pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = chunked.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .select(col("pid"), coalesce(sum(col("n")).over(wPids), lit(0L)).as("off"))
    val vocab = chunked
      .join(broadcast(offsets), "pid")
      .withColumn("token_id",
        col("off") + row_number().over(wLocal).cast("long") - 1L)
      .select(col("word"), col("token_id"))
    toks
      .join(vocab, "word")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        concat_ws(",", transform(
          slice(array_sort(collect_list(struct(col("pos"), col("token_id")))), 1, cap),
          e => e.getField("token_id").cast("string"))).as("ids_head"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[vocabEncodeQuery]] exactly (same rank rule,
    * same positional reassembly, same 16-id head). */
  def vocabEncodeOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      toks AS (SELECT doc_id,
                 generate_subscripts(string_split(t, ' '), 1) AS pos,
                 unnest(string_split(t, ' ')) AS word
               FROM d),
      vocab AS (SELECT word,
                  CAST(row_number() OVER (ORDER BY count(*) DESC, word) AS BIGINT) - 1
                    AS token_id
                FROM toks GROUP BY word)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             array_to_string(list_transform(
               list_sort(list([k.pos, k.token_id]))[1:16], x -> x[2]), ',') AS ids_head
      FROM (SELECT t.doc_id, t.pos, v.token_id FROM toks t JOIN vocab v USING (word)) k
      GROUP BY doc_id ORDER BY doc_id"""

  /** Cross-source corpus similarity matrix — the mixture-design diagnostic
    * run before weighting sources ([[graft.operators.Curation]]'s sa02/sa04
    * decide HOW MUCH of each source; this measures how much sources overlap
    * at all): for every source pair, (a) Jaccard over the distinct bigram
    * sets (unigram vocab saturates on any sizable corpus — bigrams
    * discriminate) and (b) cosine over the unigram term-frequency vectors.
    *
    * Plan shape for 100 TB: ONE corpus scan — each document emits its words
    * tagged 'w' and its bigrams tagged 'g' into a single exploded stream
    * that is immediately count-aggregated by (source, tag, value), map-side
    * combined, so the one corpus-wide shuffle carries vocabulary-scale
    * partial counts, not tokens. Everything downstream reads that persisted
    * vocabulary-scale table exactly three times: ONE self-join keyed on
    * (tag, value) — the tag in the key keeps words meeting words and grams
    * meeting grams — feeds ONE pair aggregation computing both the bigram
    * intersection count and the tf dot product; ONE per-source stats pass
    * computes set sizes and norms together and broadcasts (#sources rows)
    * onto the #sources^2/2 pair rows. A join (streamed) rather than a
    * per-key pair-array HOF is deliberate: a gram present in s sources
    * contributes s^2 pair rows either way, but the join streams them while
    * an array materializes them in one row buffer — with many sources
    * that's the difference between a shuffle and an OOM. All counts are
    * exact integers; the two divisions round 6 dp at the very end
    * (engine-portable). */
  def sourceOverlapQuery(s: SparkSession, dir: String): DataFrame = {
    val tagged = taggedSourceCounts(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val pairs = tagged
      .select(col("k"), col("v"), col("source").as("src_a"), col("c").as("ca"))
      .join(tagged.select(col("k"), col("v"), col("source").as("src_b"),
        col("c").as("cb")), Seq("k", "v"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(when(col("k") === "g", 1)).as("inter"),
        sum(when(col("k") === "w", col("ca") * col("cb"))).as("dot"))
      // the split-join form inner-joined each pair table separately, so a
      // pair sharing only words (or only grams) dropped entirely — keep
      // that contract (the oracle's inner joins encode it)
      .filter(col("inter") > 0 && col("dot").isNotNull)

    val stats = tagged.groupBy(col("source"))
      .agg(count(when(col("k") === "g", 1)).as("nset"),
        sum(when(col("k") === "w", col("c") * col("c"))).as("n2"))

    pairs
      .join(broadcast(stats.select(col("source").as("src_a"),
        col("nset").as("na"), col("n2").as("n2a"))), "src_a")
      .join(broadcast(stats.select(col("source").as("src_b"),
        col("nset").as("nb"), col("n2").as("n2b"))), "src_b")
      .select(col("src_a"), col("src_b"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6)
          .as("bigram_jaccard"),
        round(col("dot").cast("double") /
          (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))), 6)
          .as("tf_cosine"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** The one-corpus-pass stage of [[sourceOverlapQuery]]: every document
    * emits words (tag 'w') and bigrams (tag 'g') into one exploded stream,
    * reduced by a single map-side-combined count over (source, tag, value).
    * Split out so PlanAuditSpec can pin "one scan, one exchange" directly. */
  private[operators] def taggedSourceCounts(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(Tables.documents(s, dir))
    val t = Text.normText(col("text"))
    docs.select(col("source"),
      explode(concat(
        transform(split(t, " "),
          w => struct(lit("w").as("k"), w.as("v"))),
        transform(graft.functions.TokenNgrams.tokenNgrams(t, 2),
          g => struct(lit("g").as("k"), g.as("v"))))).as("e"))
      .groupBy(col("source"), col("e.k").as("k"), col("e.v").as("v"))
      .agg(count(lit(1)).as("c"))
  }

  /** DuckDB SQL replicating [[sourceOverlapQuery]]: same bigram stream as
    * the ta12 oracle, same distinct/intersect/union Jaccard, same exact-
    * integer dot and norms with one 6dp-rounded division each.
    *
    * Inner-join note, both engines: a source pair with an empty bigram
    * intersection would drop from the Jaccard join — the test corpus has
    * every pair overlapping (asserted in ScalaTest), and the semantics of
    * emitting only overlapping pairs match. */
  def sourceOverlapOracleSql: String = """
      WITH d AS (SELECT source, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      tok AS (SELECT source, string_split(t, ' ') AS w FROM d),
      bg AS (SELECT DISTINCT source,
               unnest(list_transform(range(1, greatest(len(w), 1)),
                 i -> array_to_string(w[CAST(i AS INT):CAST(i + 1 AS INT)], ' '))) AS g
             FROM tok),
      bsz AS (SELECT source, count(*) AS nset FROM bg GROUP BY source),
      bint AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
               FROM bg a JOIN bg b ON a.g = b.g AND a.source < b.source
               GROUP BY 1, 2),
      tf AS (SELECT source, unnest(w) AS word FROM tok),
      tfc AS (SELECT source, word, count(*) AS c FROM tf GROUP BY 1, 2),
      nrm AS (SELECT source, sum(c * c) AS n2 FROM tfc GROUP BY source),
      dt AS (SELECT a.source AS src_a, b.source AS src_b, sum(a.c * b.c) AS dot
             FROM tfc a JOIN tfc b ON a.word = b.word AND a.source < b.source
             GROUP BY 1, 2)
      SELECT i.src_a, i.src_b,
             round(CAST(i.inter AS DOUBLE) /
               CAST(sa.nset + sb.nset - i.inter AS DOUBLE), 6) AS bigram_jaccard,
             round(CAST(d2.dot AS DOUBLE) /
               (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS tf_cosine
      FROM bint i
      JOIN bsz sa ON i.src_a = sa.source
      JOIN bsz sb ON i.src_b = sb.source
      JOIN dt d2 ON i.src_a = d2.src_a AND i.src_b = d2.src_b
      JOIN nrm na ON i.src_a = na.source
      JOIN nrm nb ON i.src_b = nb.source
      ORDER BY i.src_a, i.src_b"""

  // ---------------------------------------------------------------- ta15

  /** PII patterns shared by detector and redactor (and mirrored verbatim in
    * the oracle — RE2 and java.util.regex agree on this subset: character
    * classes, bounded repetition, no lookaround). */
  private val EmailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  private val PhoneRe = "555-[0-9]{4}"
  private val Ipv4Re  = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val CardRe  = "4[0-9]{15}"

  /** The synthetic corpus carries no natural PII, so the fixture layer
    * deterministically plants some — emails / NANP-style phones / IPv4s /
    * 16-digit card-shaped numbers appended per doc_id residue class (same
    * md5-free arithmetic in the oracle, so both engines scrub the identical
    * string). The card digits are pseudo-random, so ~1 in 10 passes Luhn —
    * validation has real positives AND real negatives to separate. */
  private def piiEnriched(did: Column, text: Column): Column = concat(
    text,
    when(did % 3 === 0,
      concat(lit(" contact user"), did.cast("string"), lit("@example.com")))
      .otherwise(lit("")),
    when(did % 4 === 0,
      concat(lit(" call 555-"), lpad((did % 10000).cast("string"), 4, "0")))
      .otherwise(lit("")),
    when(did % 5 === 0,
      concat(lit(" from "), (did % 223 + 1).cast("string"), lit("."),
        ((did * 3) % 256).cast("string"), lit("."),
        ((did * 7) % 256).cast("string"), lit("."),
        ((did * 11) % 254 + 1).cast("string"))).otherwise(lit("")),
    // did is bounded mod 1e9 BEFORE the Knuth multiply: the raw product
    // overflows Long past doc_id ~3.4e9, which ANSI mode (Spark 4 default)
    // turns into a query-killing ARITHMETIC_OVERFLOW at corpus scale —
    // same bound in the oracle, so both engines plant identical digits
    when(did % 6 === 0,
      concat(lit(" card 4"),
        lpad(((did % 1000000000L) * 2654435761L % 1000000000000000L)
          .cast("string"), 15, "0")))
      .otherwise(lit("")))

  /** PII detection + redaction — the scrubbing pass every training-data
    * pipeline runs before anything else ships: count emails, NANP-style
    * phone numbers, IPv4 addresses and card-shaped numbers per document
    * (cards additionally Luhn-validated via Spark's codegen'd `luhn_check`,
    * so a random 16-digit string is NOT reported as a live card), and emit
    * the md5 of the fully redacted text so the scrub itself — not just the
    * counts — is oracle-checked byte-for-byte.
    *
    * Plan shape for 100 TB: pure columnar map over the corpus — regex
    * extraction, Luhn filter, four chained regexp_replace, md5 — with ZERO
    * exchanges before the presentation orderBy; the same
    * embarrassingly-parallel shape as ta01/ta02 (pinned in PlanAuditSpec).
    * Redaction order (email, phone, ip, card) is part of the contract and
    * identical in the oracle. */
  def piiQuery(s: SparkSession, dir: String): DataFrame = {
    val t = piiEnriched(col("doc_id"), col("text"))
    // ONE native scan (PiiScan) replaces the nine regex-engine passes
    // (4 × regexp_extract_all + 4 chained regexp_replace + the Luhn
    // filter's re-extraction): hand-rolled matchers reproduce the exact
    // find()/replace semantics of these four patterns (parity pinned in
    // ExpressionPropertySpec); hoisted into its own projection so the
    // multi-field read evaluates it once. The oracle keeps the regex
    // formulation, so the engine must hash-match it byte-for-byte.
    Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"), graft.functions.PiiScan.scan(col("t")).as("p"))
      .select(col("doc_id"),
        col("p.n_emails").as("n_emails"),
        col("p.n_phones").as("n_phones"),
        col("p.n_ips").as("n_ips"),
        size(col("p.cards")).cast("long").as("n_cards"),
        size(filter(col("p.cards"), c => call_function("luhn_check", c)))
          .cast("long").as("n_cards_valid"),
        md5(col("p.redacted")).as("redacted_md5"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ips") + col("n_cards") > 0)
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[piiQuery]]: same fixture arithmetic, same four
    * patterns in the same redaction order, and Luhn re-implemented from its
    * definition (right-to-left alternating doubling, subtract 9 above 9,
    * total divisible by 10) since DuckDB has no built-in. */
  def piiOracleSql: String = {
    val luhn = """list_sum(list_transform(range(1, 17), i ->
           CASE WHEN i % 2 = 1
                THEN 2*(ascii(c[CAST(i AS INT):CAST(i AS INT)])-48)
                     - CASE WHEN ascii(c[CAST(i AS INT):CAST(i AS INT)])-48 >= 5 THEN 9 ELSE 0 END
                ELSE ascii(c[CAST(i AS INT):CAST(i AS INT)])-48 END)) % 10 = 0"""
    s"""
      WITH d AS (SELECT doc_id, text ||
        CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
        CASE WHEN doc_id % 4 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        CASE WHEN doc_id % 5 = 0 THEN ' from ' || (doc_id % 223 + 1) || '.' || ((doc_id*3) % 256) || '.' ||
             ((doc_id*7) % 256) || '.' || ((doc_id*11) % 254 + 1) ELSE '' END ||
        CASE WHEN doc_id % 6 = 0 THEN ' card 4' || lpad(CAST((doc_id % 1000000000) * 2654435761 % 1000000000000000 AS VARCHAR), 15, '0') ELSE '' END
        AS t FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
        CAST(len(regexp_extract_all(t, '$Ipv4Re')) AS BIGINT) AS n_ips,
        CAST(len(regexp_extract_all(t, '$CardRe')) AS BIGINT) AS n_cards,
        CAST(len(list_filter(regexp_extract_all(t, '$CardRe'), c ->
          $luhn)) AS BIGINT) AS n_cards_valid,
        md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          t, '$EmailRe', '[EMAIL]', 'g'), '$PhoneRe', '[PHONE]', 'g'),
          '$Ipv4Re', '[IP]', 'g'), '$CardRe', '[CARD]', 'g')) AS redacted_md5,
        (len(regexp_extract_all(t, '$EmailRe')) + len(regexp_extract_all(t, '$PhoneRe')) +
         len(regexp_extract_all(t, '$Ipv4Re')) + len(regexp_extract_all(t, '$CardRe'))) > 0 AS has_pii
      FROM d ORDER BY doc_id"""
  }

  /** Per-source lexical-diversity profile (the vocabulary-health panel of a
    * corpus report): token volume, vocabulary size (types), type-token
    * ratio, hapax legomena (types occurring once WITHIN the source) and the
    * hapax share of the vocabulary — a collapsing TTR/hapax share is the
    * classic symptom of template/boilerplate-dominated or synthetically
    * repetitive sources. All counts are exact integers; the two ratios are
    * single IEEE divisions — bit-identical cross-engine, no rounding.
    *
    * Plan shape for 100 TB: explode tokens -> ONE map-side-combined shuffle
    * keyed by (source, word) -> per-source reduction of the (source, word)
    * counts (a second, vocabulary-scale shuffle). The token stream itself
    * never crosses the wire un-reduced, and nothing is collected: both
    * exchanges carry count rows, not text. */
  def lexicalStatsQuery(s: SparkSession, dir: String): DataFrame = {
    val wordCounts = Tables.parallel(Tables.documents(s, dir))
      .select(col("source"),
        explode(split(Text.normText(col("text")), " ")).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("c"))
    wordCounts
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("n_hapax").cast("double") / col("n_types").cast("double"))
          .as("hapax_share"))
      .orderBy(col("source"))
  }

  /** DuckDB SQL replicating [[lexicalStatsQuery]] exactly. */
  val lexicalStatsOracleSql: String = """
      WITH d AS (SELECT source, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      toks AS (SELECT source, unnest(string_split(t, ' ')) AS word FROM d),
      wc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c
             FROM toks GROUP BY source, word)
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS ttr,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
               CAST(count(*) AS DOUBLE) AS hapax_share
      FROM wc GROUP BY source ORDER BY source"""

  /** CCNet-style perplexity bucketing: each document's LM quality score
    * (the [[unigramLogProbQuery]] mean unigram log-probability, this
    * pipeline's KenLM stand-in) is ranked WITHIN ITS LANGUAGE and split into
    * equal thirds — head / middle / tail, CCNet's published partition
    * (Wenzek et al. 2020), which downstream recipes use to keep head+middle
    * and drop (or re-weight) the tail. Ranking is per-language because
    * absolute LM scores are not comparable across languages.
    *
    * Determinism: the score is rounded 4dp (order-dependent double agg, the
    * [[unigramLogProbQuery]] policy) and the ntile order carries a doc_id
    * tiebreak, so the bucket assignment is a total order both engines
    * compute identically.
    *
    * Plan shape for 100 TB: the scoring pass is [[unigramLogProbQuery]]'s
    * (two count shuffles + an AQE-planned vocab join); the bucketing adds
    * one language-keyed window over (doc_id, score) rows — ~30 language
    * partitions of corpus-count rows, no text. A true 100 TB run would swap
    * ntile for percentile thresholds from a sample to avoid the giant
    * per-language sort; the per-language window IS the semantic spec. */
  def pplBucketsQuery(s: SparkSession, dir: String): DataFrame = {
    val scored = unigramScored(s, dir).select(col("doc_id"), col("avg_logprob"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("avg_logprob").desc, col("doc_id"))
    Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      .join(scored, "doc_id")
      .withColumn("tile", ntile(3).over(w).cast("long"))
      .select(col("doc_id"), col("lang"), col("avg_logprob"),
        when(col("tile") === 1L, "head").when(col("tile") === 2L, "middle")
          .otherwise("tail").as("ppl_bucket"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[pplBucketsQuery]] exactly (same 4dp-rounded
    * score, same per-language ntile with doc_id tiebreak). */
  val pplBucketsOracleSql: String = s"""
      WITH $unigramScoredCte,
      tiled AS (SELECT doc_id, lang, avg_logprob,
                  ntile(3) OVER (PARTITION BY lang
                    ORDER BY avg_logprob DESC, doc_id) AS tile
                FROM documents JOIN scored USING (doc_id))
      SELECT doc_id, lang, avg_logprob,
             CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM tiled ORDER BY doc_id"""

  /** Zipf-law fit per source (the corpus-naturalness diagnostic: natural
    * language shows rank-frequency slope ≈ −1; machine-generated or
    * template text bends the curve): least-squares line through
    * (ln rank, ln count) over each source's top-`topN` words,
    * alpha = −slope. A collapsing or inflating alpha is the distribution-
    * level symptom the per-document filters (ta02/ta09) cannot see.
    *
    * Determinism: ranks are exact (count desc, word tiebreak); the four
    * regression sums are order-dependent float aggs → each rounded 6dp (the
    * ta07 policy), then slope/intercept are a fixed IEEE op sequence over
    * the rounded sums, emitted at 4dp.
    *
    * Plan shape for 100 TB: ONE vocabulary-scale count shuffle keyed
    * (source, word); the per-source rank window is cut to `topN` rows per
    * map task by InferWindowGroupLimit BEFORE the source-keyed exchange
    * (pinned in PlanAuditSpec); the regression reduces |sources| x topN
    * rows to |sources| rows. The token stream itself never crosses the
    * wire un-reduced. */
  def zipfFitQuery(s: SparkSession, dir: String, topN: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("c").desc, col("word"))
    Tables.parallel(Tables.documents(s, dir))
      .select(col("source"),
        explode(split(Text.normText(col("text")), " ")).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("c"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topN)
      .select(col("source"),
        log(col("rnk").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("x")), 6).as("sx"), round(sum(col("y")), 6).as("sy"),
        round(sum(col("x") * col("y")), 6).as("sxy"),
        round(sum(col("x") * col("x")), 6).as("sxx"))
      .select(col("source"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * -1.0, 4).as("alpha"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("n"), 4).as("intercept"))
      .orderBy(col("source"))
  }

  /** DuckDB SQL replicating [[zipfFitQuery]] exactly (topN = 100; same
    * 6dp-rounded sums, same slope/intercept op sequence). */
  val zipfFitOracleSql: String = """
      WITH d AS (SELECT source, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      toks AS (SELECT source, unnest(string_split(t, ' ')) AS word FROM d),
      wc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c
             FROM toks GROUP BY source, word),
      rk AS (SELECT source, c,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY c DESC, word) AS BIGINT) AS rnk
             FROM wc),
      xy AS (SELECT source, ln(CAST(rnk AS DOUBLE)) AS x,
                    ln(CAST(c AS DOUBLE)) AS y
             FROM rk WHERE rnk <= 100),
      sums AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                 round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
                 round(sum(x * y), 6) AS sxy, round(sum(x * x), 6) AS sxx
               FROM xy GROUP BY source)
      SELECT source, n,
             round((n * sxy - sx * sy) / (n * sxx - sx * sx) * -1.0, 4)
               AS alpha,
             round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
               AS intercept
      FROM sums ORDER BY source"""

  /** ta19 — per-document character-level Shannon entropy: H = -Σ_c p_c·ln(p_c)
    * over the normalized text's character distribution — the classic
    * gibberish/compressibility signal (binary spew and base64 blobs score
    * near-uniform-high, keyboard mashing and repeated-char runs score low;
    * natural language sits in a tight band), used as a cheap quality-filter
    * feature next to ta02's ratio features.
    *
    * Determinism: character counts are exact integers; the entropy folds
    * term-by-term over the SORTED distinct characters (the same
    * left-to-right sequence as the oracle's list_transform over
    * list_sort), each p an int/int IEEE division; ln's last ulp is
    * absorbed by the 6dp round.
    *
    * Plan shape for 100 TB: a ZERO-exchange columnar pass (the ta01
    * class) — the census runs as the native codegen'd
    * [[graft.functions.CharEntropy]] expression (ONE primitive pass per
    * row; the interpreted HOF spec below is O(distinct·len) lambda calls —
    * ~30x slower at sf0.01 — and kept only as the executable
    * cross-validation spec, the CosineSim pattern); nothing explodes into
    * the shuffle and the only exchange is the output sort. */
  def charEntropyQuery(s: SparkSession, dir: String): DataFrame = {
    val t = graft.functions.Text.normText(col("text"))
    Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"),
        when(length(t) > 0, length(t).cast("long")).otherwise(0L).as("n_chars"),
        when(length(t) > 0,
          graft.functions.CharDistinctCount.charDistinctCount(t)).otherwise(0L)
          .as("n_distinct"),
        when(length(t) > 0,
          round(-graft.functions.CharEntropy.charEntropyNeg(t), 6))
          .otherwise(0.0d).as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** The interpreted HOF census — the executable spec for
    * [[graft.functions.CharEntropy]]/[[graft.functions.CharDistinctCount]],
    * cross-validated bit-for-bit in Round8bOpsSpec (never shipped in a
    * query: O(distinct·len) interpreted lambdas per row). Returns
    * (doc_id, n_chars, n_distinct, entropy) like [[charEntropyQuery]]. */
  private[operators] def charEntropyHof(s: SparkSession, dir: String): DataFrame = {
    val t = graft.functions.Text.normText(col("text"))
    val chars = transform(sequence(lit(1), length(t)), i => t.substr(i, lit(1)))
    val cd = array_sort(array_distinct(chars))
    val entropy = aggregate(cd, lit(0.0d), (acc, c) => {
      val p = size(filter(chars, x => x === c)) / size(chars)
      acc + p * log(p)
    })
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(length(t) > 0, length(t).cast("long")).otherwise(0L).as("n_chars"),
        when(length(t) > 0, size(cd).cast("long")).otherwise(0L)
          .as("n_distinct"),
        when(length(t) > 0, round(-entropy, 6)).otherwise(0.0d).as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[charEntropyQuery]] exactly (same sorted
    * distinct-char fold, same int/int divisions, same 6dp round). */
  val charEntropyOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      c AS (SELECT doc_id, t, string_split(t, '') AS chars,
                   list_sort(list_distinct(string_split(t, ''))) AS cd
            FROM d)
      SELECT doc_id,
             CASE WHEN length(t) > 0 THEN CAST(length(t) AS BIGINT)
                  ELSE 0 END AS n_chars,
             CASE WHEN length(t) > 0 THEN CAST(len(cd) AS BIGINT)
                  ELSE 0 END AS n_distinct,
             CASE WHEN length(t) > 0 THEN round(-list_sum(list_transform(cd,
               c2 -> (len(list_filter(chars, x -> x = c2)) / len(chars)) *
                     ln(len(list_filter(chars, x -> x = c2)) / len(chars)))), 6)
                  ELSE 0.0 END AS entropy
      FROM c ORDER BY doc_id"""

  /** ta20 — ROUGE-style n-gram overlap of every document against its
    * source's head document (min doc_id per source, the "reference"): for
    * gram orders 1 and 2, the candidate gram count, reference gram count,
    * CLIPPED match count (per gram, min of the two multiplicities — the
    * ROUGE counting rule), and precision / recall / F1. The per-pair eval
    * primitive behind summarization scoring and reference-overlap audits —
    * dd02's Jaccard treats grams as a SET; ROUGE's clipped counts respect
    * multiplicity, which is what penalizes degenerate repetition.
    *
    * Determinism: all counts are exact integers; P and R are single IEEE
    * divisions; F1 = (2*P*R)/(P+R) in the same association order on both
    * engines (identical bit patterns from identical integer inputs);
    * 6dp round on output only.
    *
    * Plan shape for 100 TB: gram counting is ONE explode + map-side
    * combined aggregate (the ir02 inverted-index shape). The reference
    * side is one head document per source — bounded by feed count — so
    * its gram table broadcasts; the clip join never shuffles the corpus
    * on gram. Final assembly joins doc-level totals (one row per doc per
    * order) against the tiny per-source reference totals. */
  def rougeQuery(s: SparkSession, dir: String): DataFrame = {
    // round-15 idle A/Bs settled the round-14 open question: THIS shape
    // measures 2.82–2.94 s at sf0.1 vs 3.29 s for the pre-round-14
    // two-corpus-exchange shape (the r14 driver's "regression" was a
    // contention phantom — its window ran under ~1 foreign core).
    // Persisting these token arrays was ALSO tried (they feed 4 subtrees)
    // and measured 3.91 s — the corpus-array cache costs more than the
    // re-scans it saves; do not re-add.
    val docs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"),
        split(Text.normText(col("text")), " ").as("toks"))
    // guarded: Spark's sequence(1, 0) counts DOWN, so short docs must map
    // to an empty bigram list explicitly
    def grams(d: DataFrame): DataFrame = {
      val uni = d.select(col("doc_id"), col("source"), lit(1L).as("g"),
        explode(col("toks")).as("gram"))
      val bi = d.select(col("doc_id"), col("source"), lit(2L).as("g"),
        explode(when(size(col("toks")) > 1,
          expr("transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
          .otherwise(array().cast("array<string>"))).as("gram"))
      uni.unionByName(bi)
    }
    val heads = docs.groupBy(col("source")).agg(min(col("doc_id")).as("ref_id"))
    // ROUND-14 shape: the old plan grouped the ENTIRE corpus gram stream
    // by (doc, g, gram) and then re-grouped it for the per-doc totals —
    // two corpus-gram-scale exchanges carrying gram STRINGS. Neither is
    // needed: the per-doc candidate total is sum-of-counts = the positional
    // gram COUNT, a pure size() projection off the token arrays (no
    // exchange at all), and clipped-overlap counting only ever needs the
    // grams that HIT the bounded per-source reference set — so the
    // reference grams are counted first (head docs only, a tiny exchange)
    // and the corpus stream is broadcast-filtered to matches BEFORE any
    // aggregation state is built. The only gram-scale exchange left is the
    // matched-gram count, map-side combined.
    // doc_id functionally determines source, so the head-side restriction
    // needs only the id key (a source equality here would be a trivially
    // true self-compare: heads shares the docs lineage)
    val refIds = heads.select(col("ref_id"))
    val refc = grams(docs.join(broadcast(refIds),
        docs("doc_id") === refIds("ref_id"), "left_semi"))
      .groupBy(col("source"), col("g"), col("gram"))
      .agg(count(lit(1)).as("rc"))
    // per-doc totals straight off the token arrays: Σc over a doc's grams
    // IS its positional gram count — size(toks) unigrams, size-1 bigrams
    // (no bigram row for 1-token docs, matching the guarded explode above)
    val candtot = docs
      .select(col("doc_id"), col("source"),
        explode(when(size(col("toks")) > 1,
          array(struct(lit(1L).as("g"), size(col("toks")).cast("long").as("n_cand")),
            struct(lit(2L).as("g"), (size(col("toks")) - 1).cast("long").as("n_cand"))))
          .otherwise(array(
            struct(lit(1L).as("g"), size(col("toks")).cast("long").as("n_cand")))))
          .as("x"))
      .select(col("doc_id"), col("source"), col("x.g").as("g"),
        col("x.n_cand").as("n_cand"))
      .join(broadcast(heads), Seq("source"))
      .filter(col("doc_id") =!= col("ref_id"))
      .select(col("doc_id"), col("ref_id"), col("source"), col("g"),
        col("n_cand"))
    val reftot = refc.groupBy(col("source"), col("g"))
      .agg(sum(col("rc")).as("n_ref"))
    val clip = grams(docs)
      .join(broadcast(heads), Seq("source"))
      .filter(col("doc_id") =!= col("ref_id"))
      .join(broadcast(refc), Seq("source", "g", "gram"))
      .groupBy(col("doc_id"), col("g"), col("gram"))
      .agg(count(lit(1)).as("c"), first(col("rc")).as("rc"))
      .groupBy(col("doc_id"), col("g"))
      .agg(sum(least(col("c"), col("rc"))).as("n_clip0"))
    val joined = candtot
      .join(broadcast(reftot), Seq("source", "g"))
      .join(clip, Seq("doc_id", "g"), "left_outer")
      .withColumn("n_clip", coalesce(col("n_clip0"), lit(0L)))
    val p = col("n_clip").cast("double") / col("n_cand").cast("double")
    val r = col("n_clip").cast("double") / col("n_ref").cast("double")
    joined.select(col("doc_id"), col("ref_id"), col("g").as("gram_order"),
        col("n_cand"), col("n_ref"), col("n_clip"),
        round(p, 6).as("rouge_p"), round(r, 6).as("rouge_r"),
        round(when(col("n_clip") > 0, lit(2.0) * p * r / (p + r))
          .otherwise(0.0), 6).as("rouge_f"))
      .orderBy(col("doc_id"), col("gram_order"))
  }

  /** DuckDB SQL replicating [[rougeQuery]] exactly (same normalization and
    * gram streams, same clipped-min counting, same division order). */
  val rougeOracleSql: String = """
      WITH d AS (SELECT doc_id, source,
                        trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      tk AS (SELECT doc_id, source, string_split(t, ' ') AS toks FROM d),
      g1 AS (SELECT doc_id, source, CAST(1 AS BIGINT) AS g,
                    unnest(toks) AS gram FROM tk),
      g2 AS (SELECT doc_id, source, CAST(2 AS BIGINT) AS g,
                    unnest(list_transform(range(1, len(toks)),
                                          i -> toks[i] || ' ' || toks[i + 1]))
                      AS gram
             FROM tk),
      gr AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2),
      cnt AS (SELECT doc_id, source, g, gram, CAST(count(*) AS BIGINT) AS c
              FROM gr GROUP BY doc_id, source, g, gram),
      heads AS (SELECT source, min(doc_id) AS ref_id FROM d GROUP BY source),
      refc AS (SELECT c.source, c.g, c.gram, c.c AS rc
               FROM cnt c JOIN heads h
                 ON c.source = h.source AND c.doc_id = h.ref_id),
      cand AS (SELECT c.doc_id, h.ref_id, c.source, c.g, c.gram, c.c
               FROM cnt c JOIN heads h ON c.source = h.source
               WHERE c.doc_id <> h.ref_id),
      candtot AS (SELECT doc_id, ref_id, source, g,
                         CAST(sum(c) AS BIGINT) AS n_cand
                  FROM cand GROUP BY doc_id, ref_id, source, g),
      reftot AS (SELECT source, g, CAST(sum(rc) AS BIGINT) AS n_ref
                 FROM refc GROUP BY source, g),
      clip AS (SELECT cand.doc_id, cand.g,
                      CAST(sum(least(cand.c, refc.rc)) AS BIGINT) AS n_clip0
               FROM cand JOIN refc ON cand.source = refc.source
                 AND cand.g = refc.g AND cand.gram = refc.gram
               GROUP BY cand.doc_id, cand.g),
      j AS (SELECT t.doc_id, t.ref_id, t.g, t.n_cand, r.n_ref,
                   COALESCE(cl.n_clip0, CAST(0 AS BIGINT)) AS n_clip
            FROM candtot t
            JOIN reftot r ON t.source = r.source AND t.g = r.g
            LEFT JOIN clip cl ON t.doc_id = cl.doc_id AND t.g = cl.g),
      x AS (SELECT *,
                   CAST(n_clip AS DOUBLE) / CAST(n_cand AS DOUBLE) AS p,
                   CAST(n_clip AS DOUBLE) / CAST(n_ref AS DOUBLE) AS rr
            FROM j)
      SELECT doc_id, ref_id, g AS gram_order, n_cand, n_ref, n_clip,
             round(p, 6) AS rouge_p, round(rr, 6) AS rouge_r,
             round(CASE WHEN n_clip > 0 THEN 2.0 * p * rr / (p + rr)
                        ELSE 0.0 END, 6) AS rouge_f
      FROM x ORDER BY doc_id, gram_order"""

  /** ta21 — Flesch reading-ease per document: 206.835 − 1.015·(W/S) −
    * 84.6·(Syl/W) over exact integer word / sentence / syllable censuses —
    * the classic readability gate a curation cascade runs next to ta02's
    * ratio features (legalese and run-on spam score deep negative, simple
    * prose scores 60–100). Syllables use the standard vowel-group heuristic:
    * per word, the number of maximal `[aeiouy]+` runs, floored at 1 (every
    * word carries at least one spoken syllable); sentences are maximal
    * `[.!?]+` runs, floored at 1 for non-empty text.
    *
    * Determinism: all three censuses are exact integers (the syllable fold
    * is an integer sum — order-free); the score is ONE fixed IEEE sequence
    * (two divisions, two multiplies, two subtractions, identical
    * association on both engines), rounded 4dp.
    *
    * Plan shape for 100 TB: a ZERO-exchange columnar pass (the ta01/ta19
    * class) — censuses are per-row expressions over the normalized text,
    * nothing explodes into a shuffle, and the only exchange is the output
    * sort. */
  def readabilityQuery(s: SparkSession, dir: String): DataFrame = {
    // the three censuses in ONE native scan (FleschCensus) instead of a
    // regex-engine call per token — hoisted into its own projection (the
    // ta01 `swc` discipline) so the multi-field read evaluates it once;
    // the regex formulation survives verbatim in the oracle and as the
    // ExpressionPropertySpec parity obligation
    val nWords = col("c.n_words")
    val nSents = greatest(lit(1L), col("c.n_sent_runs"))
    val nSyll = col("c.n_syllables")
    Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), graft.functions.Text.normText(col("text")).as("t"))
      .select(col("doc_id"), length(col("t")).cast("long").as("len"),
        graft.functions.FleschCensus.census(col("t")).as("c"))
      .select(col("doc_id"),
        when(col("len") > 0, nWords).otherwise(0L).as("n_words"),
        when(col("len") > 0, nSents).otherwise(0L).as("n_sentences"),
        when(col("len") > 0, nSyll).otherwise(0L).as("n_syllables"),
        when(col("len") > 0, round(
          lit(206.835) -
            lit(1.015) * (nWords.cast("double") / nSents.cast("double")) -
            lit(84.6) * (nSyll.cast("double") / nWords.cast("double")), 4))
          .as("flesch"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[readabilityQuery]] exactly (same vowel-group
    * and sentence-run regexes, same min-1 floors, same IEEE sequence and
    * 4dp round). */
  val readabilityOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      c AS (SELECT doc_id, t,
                   CAST(len(string_split(t, ' ')) AS BIGINT) AS nw,
                   CAST(greatest(1, len(regexp_extract_all(t, '[.!?]+'))) AS BIGINT) AS ns,
                   CAST(list_sum(list_transform(string_split(t, ' '),
                     w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))) AS BIGINT) AS sy
            FROM d)
      SELECT doc_id,
             CASE WHEN length(t) > 0 THEN nw ELSE 0 END AS n_words,
             CASE WHEN length(t) > 0 THEN ns ELSE 0 END AS n_sentences,
             CASE WHEN length(t) > 0 THEN sy ELSE 0 END AS n_syllables,
             CASE WHEN length(t) > 0 THEN round(
               206.835 - 1.015 * (CAST(nw AS DOUBLE) / CAST(ns AS DOUBLE))
                       - 84.6 * (CAST(sy AS DOUBLE) / CAST(nw AS DOUBLE)), 4)
             END AS flesch
      FROM c ORDER BY doc_id"""

  /** ta22 — per-document n-gram novelty in ingestion order: the fraction
    * of a doc's DISTINCT word trigrams whose first corpus occurrence (min
    * doc_id) is this document. The "what does this doc add" curation
    * signal — boilerplate and templated spam score near 0 because their
    * trigrams arrived earlier, fresh prose scores near 1; curation
    * cascades use it to cap template families without a full dedup pass
    * (and it is the doc-grain dual of dd17's corpus-level boilerplate
    * census).
    *
    * Determinism: first-occurrence is an integer min; censuses are exact
    * distinct counts; the ratio is ONE division, 6dp round. Docs with
    * fewer than 3 tokens (or null text) have no trigrams: 0 counts, null
    * novelty.
    *
    * Plan shape for 100 TB: ONE gram-keyed corpus exchange serves both
    * the first-occurrence min (window over gram) and, after the doc-keyed
    * regroup, the per-doc censuses; gram-less docs are restored by a
    * doc_id-only left join whose scan prunes to a single column. No
    * quadratic anywhere — cost is the vocabulary-scale shuffle ir02/ta13
    * already pay. */
  def noveltyQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), split(Text.normText(col("text")), " ").as("toks"))
    val grams = docs.select(col("doc_id"),
      explode(when(size(col("toks")) > 2,
        expr("transform(sequence(1, size(toks) - 2), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), " +
          "' ', element_at(toks, i + 2)))"))
        .otherwise(array().cast("array<string>"))).as("gram"))
      .distinct()
    val firsts = grams
      .withColumn("first_id", min(col("doc_id")).over(
        Window.partitionBy(col("gram"))))
    val counted = firsts.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_id") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(counted, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_grams").isNotNull,
          round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6))
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[noveltyQuery]] exactly (same distinct
    * trigram sets, same min-doc_id first-occurrence, same ratio and 6dp
    * round, same null for gram-less docs). */
  val noveltyOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM d),
      g AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                i -> concat(toks[CAST(i AS INT)], ' ', toks[CAST(i + 1 AS INT)],
                            ' ', toks[CAST(i + 2 AS INT)]))) AS gram
            FROM tk),
      f AS (SELECT doc_id, gram,
              min(doc_id) OVER (PARTITION BY gram) AS first_id
            FROM g),
      o AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
              CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END) AS BIGINT)
                AS n_novel
            FROM f GROUP BY doc_id)
      SELECT d.doc_id,
             coalesce(o.n_grams, CAST(0 AS BIGINT)) AS n_grams,
             coalesce(o.n_novel, CAST(0 AS BIGINT)) AS n_novel,
             CASE WHEN o.n_grams IS NOT NULL THEN
               round(CAST(o.n_novel AS DOUBLE) / CAST(o.n_grams AS DOUBLE), 6)
             END AS novelty
      FROM d LEFT JOIN o USING (doc_id) ORDER BY doc_id"""

  /** Merge rounds performed by [[bpeMergesQuery]]. */
  val BpeMerges = 3

  /** ta23 — BPE tokenizer induction, [[BpeMerges]] merge rounds (Sennrich
    * et al. 2016): from the frequency-weighted word vocabulary spelled as
    * character symbols, each round counts adjacent symbol pairs weighted
    * by word frequency, picks the most frequent pair (tie → lexicographic)
    * and merges its occurrences left-to-right in every word. Emits the
    * merge table — (step, pair, merged symbol, support) — the artifact a
    * tokenizer TRAINS: ta13 counts the raw pair statistics of round one;
    * this actually iterates the merge, which is tokenizer training.
    *
    * Determinism: supports are exact integer sums; ties break on the pair
    * string; the merge apply is a literal (non-regex) left-to-right
    * replace over doubled-space symbol strings — the ir01 doubled-space
    * trick, so adjacent occurrences ("a a a a" under merge "a a") never
    * share a delimiter and both engines produce the identical greedy
    * merge. Symbols never contain spaces, so multi-char patterns stay
    * unambiguous across rounds.
    *
    * Plan shape for 100 TB: the corpus is touched ONCE (the word-count
    * vocabulary aggregate — the exchange ta03 already pays) and persisted;
    * every round then runs at VOCABULARY scale — a pair-keyed map-side-
    * combined count, a 1-row TakeOrdered best pair broadcast back onto
    * the vocab, and a per-row string rewrite. Iteration cost is bounded
    * by |vocab|, not the corpus — the property that makes map-reduce BPE
    * training deployable. */
  def bpeMergesQuery(s: SparkSession, dir: String): DataFrame =
    bpeRounds(s, dir)._1
      .reduce(_ unionByName _)
      .select(col("step"), col("pair"),
        expr("replace(pair, ' ', '')").as("merged"), col("support"))
      .orderBy(col("step"))

  /** The shared BPE training loop: per-round best-pair frames (the merge
    * table rows) plus the FINAL symbol vocabulary after all [[BpeMerges]]
    * rounds — one definition feeding both the ta23 merge-table query and
    * pl05's tokenizer application (whose encoding must be exactly the
    * trained state, not a re-derivation that could drift). */
  private[operators] def bpeRounds(s: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) = {
    val vocab = Tables.parallel(Tables.documents(s, dir))
      .select(explode(split(Text.normText(col("text")), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("sym"),
        col("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = vocab
    val steps = scala.collection.mutable.ListBuffer.empty[DataFrame]
    for (step <- 1 to BpeMerges) {
      val best = cur
        .withColumn("arr", split(col("sym"), " "))
        .filter(size(col("arr")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(arr) - 1), " +
            "i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("support"))
        .orderBy(col("support").desc, col("pair")).limit(1)
        .withColumn("step", lit(step.toLong))
      steps += best
      cur = cur.join(broadcast(best.select(col("pair").as("bp"))))
        .withColumn("d",
          regexp_replace(concat(lit(" "), col("sym"), lit(" ")), " ", "  "))
        .withColumn("m", expr(
          "replace(d, concat(' ', replace(bp, ' ', '  '), ' '), " +
            "concat(' ', replace(bp, ' ', ''), ' '))"))
        .select(trim(regexp_replace(col("m"), " +", " ")).as("sym"),
          col("freq"))
      // persist every intermediate round (round-14): round k+1's pair
      // census AND the k+1 rewrite both re-execute cur_k — unpersisted,
      // each round re-ran every previous round's join+rewrite chain, so a
      // BpeMerges-round loop paid O(rounds²) vocabulary passes (pl05's
      // final-vocab consumer re-paid the whole chain once more). All
      // frames are vocabulary-scale; the session cache-clear between
      // queries releases them.
      if (step < BpeMerges)
        cur = cur.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    (steps.toSeq, cur)
  }

  /** DuckDB SQL replicating [[bpeMergesQuery]] exactly — the merge loop
    * unrolled into generated CTE rounds from the same round count (the
    * gr04 pattern): identical pair statistics, identical tie-breaks,
    * identical doubled-space literal replace. */
  /** The BPE training loop as oracle CTEs (d, v, s0, p/b/s per round) —
    * shared by the ta23 and pl05 oracles exactly as [[bpeRounds]] is
    * shared by their queries. Interpolate after `WITH`. */
  private def bpeCtesSql: String = {
    val rounds = (1 to BpeMerges).map { i =>
      s"""
      p$i AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS support FROM (
               SELECT freq, unnest(list_transform(range(1, len(arr)),
                 j -> concat(arr[CAST(j AS INT)], ' ', arr[CAST(j + 1 AS INT)])))
                 AS pair
               FROM (SELECT string_split(sym, ' ') AS arr, freq FROM s${i - 1}) z
               WHERE len(arr) >= 2) q GROUP BY pair),
      b$i AS (SELECT pair, support FROM p$i
              ORDER BY support DESC, pair LIMIT 1),
      s$i AS (SELECT trim(regexp_replace(
                replace(replace(' ' || sym || ' ', ' ', '  '),
                        ' ' || replace(b.pair, ' ', '  ') || ' ',
                        ' ' || replace(b.pair, ' ', '') || ' '),
                ' +', ' ', 'g')) AS sym, freq
              FROM s${i - 1}, b$i b)"""
    }.mkString(",")
    s"""d AS (SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      v AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest(string_split(t, ' ')) AS w FROM d) z
            GROUP BY w),
      s0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym, freq
             FROM v),
      $rounds"""
  }

  def bpeMergesOracleSql: String = {
    val out = (1 to BpeMerges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, pair, replace(pair, ' ', '') AS merged, support FROM b$i")
      .mkString("\n      UNION ALL ")
    s"""
      WITH $bpeCtesSql
      $out
      ORDER BY step"""
  }

  /** pl05 — tokenizer application (the second half of tokenizer
    * training): encode the corpus with the vocabulary ta23 just learned
    * and report, per source, the word/character/symbol censuses and the
    * compression the [[BpeMerges]] merges actually bought
    * (symbols/character and symbols/word). This is the acceptance test a
    * tokenizer-training pipeline runs before shipping a vocab — merges
    * that looked frequent in training must shorten the real corpus — and
    * it consumes the TRAINED state ([[bpeRounds]]'s final vocabulary), not
    * a re-derivation.
    *
    * Determinism: all censuses are exact integers (a word's symbol count
    * is the size of its trained symbol split); ratios are single IEEE
    * divisions rounded 6dp.
    *
    * Plan shape for 100 TB: training is ta23's vocab-scale loop (corpus
    * touched once, persisted); application is ONE word-keyed equi-join of
    * the corpus word stream against the |vocab|-row symbol-count table,
    * then a source-keyed aggregate. No per-document re-merging — the
    * vocabulary IS the tokenizer. */
  def tokenizerApplyQuery(s: SparkSession, dir: String): DataFrame = {
    val wordSyms = bpeRounds(s, dir)._2
      .select(expr("replace(sym, ' ', '')").as("w"),
        size(split(col("sym"), " ")).cast("long").as("n_sym"))
    Tables.parallel(Tables.documents(s, dir))
      .select(col("source"),
        explode(split(Text.normText(col("text")), " ")).as("w"))
      .join(wordSyms, "w")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum(col("n_sym")).as("n_symbols"))
      .select(col("source"), col("n_words"), col("n_chars"), col("n_symbols"),
        when(col("n_chars") > 0,
          round(col("n_symbols").cast("double") / col("n_chars").cast("double"), 6))
          .as("syms_per_char"),
        round(col("n_symbols").cast("double") / col("n_words").cast("double"), 6)
          .as("syms_per_word"))
      .orderBy(col("source"))
  }

  /** DuckDB SQL replicating [[tokenizerApplyQuery]] exactly — the trained
    * vocabulary comes from the SAME [[bpeCtesSql]] rounds the ta23 oracle
    * runs, so query and oracle apply the identical tokenizer. */
  def tokenizerApplyOracleSql: String = s"""
      WITH $bpeCtesSql,
      ws AS (SELECT replace(sym, ' ', '') AS w,
               CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sym
             FROM s$BpeMerges),
      wd AS (SELECT source, unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
             FROM documents),
      ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(length(w)) AS BIGINT) AS n_chars,
               CAST(sum(n_sym) AS BIGINT) AS n_symbols
             FROM wd JOIN ws USING (w) GROUP BY source)
      SELECT source, n_words, n_chars, n_symbols,
             CASE WHEN n_chars > 0 THEN
               round(CAST(n_symbols AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
             END AS syms_per_char,
             round(CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
               AS syms_per_word
      FROM ag ORDER BY source"""
}
