package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text

/** Probabilistic data structures with EXACT cross-engine oracles — the
  * trick is deterministic hashing (md5-derived, the [[Curation.prefix32]]
  * family): unlike q31's HLL++/KLL (engine-specific by nature, rows-only
  * check), a KMV sketch or a Bloom filter built from md5 bits is the SAME
  * structure in any engine, so the DuckDB oracle re-derives the sketch
  * bit-for-bit AND the estimate/verdict columns hash-match. These are the
  * production approximations a 100 TB pipeline actually deploys — distinct
  * counting without the count-distinct expand, membership prefiltering
  * without the full span join — checked exactly, including their errors.
  */
object Sketch {

  /** sk01 — K-Minimum-Values distinct-count sketch per source (the
    * mergeable distinct sketch behind theta sketches): hash every distinct
    * token to 60 uniform bits (md5 prefix), keep each source's K smallest;
    * the estimator is (K−1)/h(K) with h(K) the K-th smallest hash
    * normalized to [0,1). Emitted beside the EXACT distinct count so the
    * sketch's error is itself oracle-checked. Sources with fewer than K
    * distinct tokens report exactly (the standard small-set fallback).
    *
    * Determinism: hashes are md5-exact in both engines; the estimate is a
    * fixed two-division IEEE sequence over (K−1, kth hash, 2^60) — no
    * summation anywhere, so no rounding is needed.
    *
    * Plan shape for 100 TB: one (source, word)-keyed distinct shuffle
    * (map-side partial), then the per-source bottom-K is a window that
    * InferWindowGroupLimit cuts to K rows per map task BEFORE the source
    * exchange — the exact-count branch beside it is the plain distinct
    * count. A production deployment keeps ONLY the sketch branch (that is
    * the point); the exact branch here is the self-check. */
  def kmvDistinctQuery(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val kk = k.toLong
    val distinctTokens = Tables.parallel(Tables.documents(s, dir))
      .select(col("source"),
        explode(split(Text.normText(col("text")), " ")).as("word"))
      .distinct()
    val hashed = distinctTokens.withColumn("h",
      conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("word"))
    val bottomK = hashed
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kk)
      .groupBy(col("source"))
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("n_in"))
    distinctTokens.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
      .join(bottomK, Seq("source"), "left")
      .select(col("source"), col("n_exact"),
        when(col("n_in") === kk, col("kth_hash")).as("kth_hash"),
        when(col("n_in") === kk,
          lit((k - 1).toDouble) /
            (col("kth_hash").cast("double") / lit(1152921504606846976.0d)))
          .otherwise(col("n_exact").cast("double")).as("est_distinct"))
      .orderBy(col("source"))
  }

  /** DuckDB SQL replicating [[kmvDistinctQuery]] exactly (K = `k`; same
    * 60-bit md5 prefix, same (K−1)/h(K) op sequence). */
  def kmvDistinctOracleSql(k: Int = 16): String = s"""
      WITH d AS (SELECT source, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      dt AS (SELECT DISTINCT source, unnest(string_split(t, ' ')) AS word FROM d),
      hashed AS (SELECT source, word,
                   CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS h
                 FROM dt),
      bk AS (SELECT source, CAST(max(h) AS BIGINT) AS kth_hash,
                    CAST(count(*) AS BIGINT) AS n_in
             FROM (SELECT source, h,
                     row_number() OVER (PARTITION BY source ORDER BY h, word) AS rnk
                   FROM hashed) z
             WHERE rnk <= $k GROUP BY source),
      ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact
             FROM dt GROUP BY source)
      SELECT ex.source, n_exact,
             CASE WHEN n_in = $k THEN kth_hash END AS kth_hash,
             CASE WHEN n_in = $k
                  THEN ${(k - 1).toDouble} /
                       (CAST(kth_hash AS DOUBLE) / 1152921504606846976.0)
                  ELSE CAST(n_exact AS DOUBLE) END AS est_distinct
      FROM ex LEFT JOIN bk USING (source)
      ORDER BY source"""

  val BloomBits = 65536L
  val BloomHashes = 4

  /** dd16 — Bloom-prefilter decontamination (the approximate-membership
    * form of dd08 a 100 TB pipeline actually runs first): the benchmark
    * spans build a Bloom filter (`BloomBits` bits, `BloomHashes` md5-derived
    * hash functions); every corpus document is probed through it, BESIDE
    * the exact span join, so the output carries the Bloom verdict, the
    * exact verdict AND the false-positive flag — the filter's error rate is
    * itself oracle-checked. Bloom semantics guarantee no false negatives
    * (asserted in SketchSpec): a Bloom-clean document needs no exact check,
    * which is what makes the prefilter worth running — at scale the exact
    * join only receives the Bloom-positive minority.
    *
    * Determinism: bit positions are md5(j + ":" + span) prefixes mod m —
    * the identical bit set in any engine; every output column is integer/
    * boolean logic over them.
    *
    * Plan shape for 100 TB: the bit SET (distinct positions, ≤ m rows,
    * here ≤ 64Ki) broadcasts; the probe is the span explode joined to it
    * map-side, reduced per (doc, span) by an all-k-bits count and per doc
    * by an any-span flag — the corpus never shuffles un-reduced, and the
    * exact branch reuses dd08's broadcast span join unchanged. */
  def bloomDecontaminateQuery(s: SparkSession, dir: String,
      benchSource: String = "src0", n: Int = 8): DataFrame = {
    // (round-15 A/Bs, both alternatives rejected — keep this shape:
    //  1. fusing the exact branch into the Bloom-probe chain (one corpus
    //     span pass instead of two) measured 1.71–1.81 s vs 1.41–1.77 s
    //     for this shape on matched clean windows — no resolvable win at
    //     bench SF, where the two branches are independent subtrees the
    //     scheduler overlaps; kept the simpler two-branch form;
    //  2. replacing the (doc_id, span) distinct() with array_distinct on
    //     the gram array measured 2.33–2.53 s — clearly WORSE: per-row
    //     set-building over ~50-char span strings costs more than the
    //     map-side-combined dedup exchange it removes, the opposite of
    //     ir06's single-token arrays where the same move won 1.5×.)
    def spansOf(df: DataFrame): DataFrame = df.select(col("doc_id"),
      explode(graft.functions.TokenNgrams.tokenNgrams(
        Text.normText(col("text")), n)).as("span"))
    def positions(spanCol: org.apache.spark.sql.Column) = array(
      (0 until BloomHashes).map(j =>
        pmod(conv(substring(md5(concat(lit(s"$j:"), spanCol)), 1, 8), 16, 10)
          .cast("long"), lit(BloomBits))): _*)
    val docs = Tables.parallel(Tables.documents(s, dir))
    val benchSpans = spansOf(docs.filter(col("source") === benchSource))
      .select(col("span")).distinct()
    val bits = benchSpans
      .select(explode(positions(col("span"))).as("pos")).distinct()
    val corpusSpans = spansOf(docs.filter(col("source") =!= benchSource))
      .select(col("doc_id"), col("span")).distinct()
    // Bloom probe: a span hits iff ALL k of its positions are set
    val spanVerdict = corpusSpans
      .select(col("doc_id"), col("span"),
        explode(positions(col("span"))).as("pos"))
      .join(broadcast(bits.withColumn("set", lit(1))), Seq("pos"), "left")
      .groupBy(col("doc_id"), col("span"))
      .agg((sum(when(col("set").isNotNull, 1L).otherwise(0L)) === BloomHashes.toInt)
        .as("bloom_span_hit"))
    // exact branch: dd08's broadcast distinct-span join
    val exact = corpusSpans
      .join(broadcast(benchSpans.withColumn("bhit", lit(1))), Seq("span"), "left")
      .groupBy(col("doc_id"))
      .agg((sum(when(col("bhit").isNotNull, 1L).otherwise(0L)) > 0L).as("exact_hit"))
    spanVerdict
      .groupBy(col("doc_id"))
      .agg(max(col("bloom_span_hit")).as("bloom_hit"))
      .join(exact, "doc_id")
      .select(col("doc_id"), col("bloom_hit"), col("exact_hit"),
        (col("bloom_hit") && !col("exact_hit")).as("false_positive"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[bloomDecontaminateQuery]] exactly (same md5
    * bit positions, same all-k probe, same exact branch). */
  def bloomDecontaminateOracleSql(benchSource: String = "src0",
      n: Int = 8): String = s"""
      WITH d AS (SELECT doc_id, source,
                        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      tok AS (SELECT doc_id, source, string_split(t, ' ') AS w FROM d),
      spans AS (SELECT doc_id, source,
                  unnest(list_transform(range(1, greatest(len(w) - ${n - 2}, 1)),
                    i -> array_to_string(w[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' '))) AS span
                FROM tok),
      bench AS (SELECT DISTINCT span FROM spans WHERE source = '$benchSource'),
      bits AS (SELECT DISTINCT
                 CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', span)), 1, 8)) AS BIGINT)
                   % $BloomBits AS pos
               FROM bench CROSS JOIN range(0, $BloomHashes) r(j)),
      cs AS (SELECT DISTINCT doc_id, span FROM spans WHERE source <> '$benchSource'),
      probe AS (SELECT doc_id, span,
                  CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', span)), 1, 8)) AS BIGINT)
                    % $BloomBits AS pos
                FROM cs CROSS JOIN range(0, $BloomHashes) r(j)),
      sv AS (SELECT doc_id, span,
               CAST(sum(CASE WHEN pos IN (SELECT pos FROM bits)
                             THEN 1 ELSE 0 END) AS BIGINT) = $BloomHashes
                 AS bloom_span_hit
             FROM probe GROUP BY doc_id, span),
      bl AS (SELECT doc_id, max(bloom_span_hit) AS bloom_hit
             FROM sv GROUP BY doc_id),
      ex AS (SELECT doc_id,
               CAST(sum(CASE WHEN span IN (SELECT span FROM bench)
                             THEN 1 ELSE 0 END) AS BIGINT) > 0 AS exact_hit
             FROM cs GROUP BY doc_id)
      SELECT doc_id, bloom_hit, exact_hit,
             bloom_hit AND NOT exact_hit AS false_positive
      FROM bl JOIN ex USING (doc_id)
      ORDER BY doc_id"""

  val CmsDepth = 4
  val CmsWidth = 64L

  /** sk02 — Count-Min sketch frequency estimation: token occurrences
    * stream into a `CmsDepth` × `CmsWidth` counter matrix (row j buckets a
    * word by md5("j:word")); a word's estimate is the MINIMUM of its
    * `CmsDepth` counters — always ≥ the true count (one-sided error, the
    * property that makes CMS the heavy-hitter filter of choice). Emitted
    * for the true top-`k` tokens BESIDE their exact counts, so the
    * sketch's overcount is itself oracle-checked, row by row.
    *
    * Determinism: bucket ids are md5-prefix arithmetic (identical in any
    * engine); every output column is an exact integer — no rounding
    * anywhere.
    *
    * Plan shape for 100 TB: the sketch builds in ONE corpus pass — each
    * occurrence emits `CmsDepth` (row, bucket) keys that partial-aggregate
    * map-side to ≤ depth×width rows PER TASK, so the exchange carries a
    * few hundred rows per task regardless of corpus size (this is the
    * point of a CMS). The exact branch (count + top-k) is the self-check;
    * a production deployment keeps only the sketch pass. The probe joins
    * the k words against the counter matrix by BROADCAST. */
  def cmsHeavyQuery(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val occ = Tables.parallel(Tables.documents(s, dir))
      .select(explode(split(Text.normText(col("text")), " ")).as("word"))
    def bucketOf(j: Column, word: Column): Column =
      pmod(conv(substring(md5(concat(j.cast("string"), lit(":"), word)),
        1, 15), 16, 10).cast("long"), lit(CmsWidth))
    val counters = occ
      .select(explode(array((0 until CmsDepth).map(lit(_)): _*)).as("j"),
        col("word"))
      .select(col("j"), bucketOf(col("j"), col("word")).as("bucket"))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val top = occ.groupBy(col("word")).agg(count(lit(1)).as("true_n"))
      .orderBy(col("true_n").desc, col("word")).limit(k)
    top
      .select(col("word"), col("true_n"),
        explode(array((0 until CmsDepth).map(lit(_)): _*)).as("j"))
      .withColumn("bucket", bucketOf(col("j"), col("word")))
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(col("word"), col("true_n"))
      .agg(min(col("cnt")).as("est_n"))
      .withColumn("overcount", col("est_n") - col("true_n"))
      .orderBy(col("true_n").desc, col("word"))
  }

  /** DuckDB SQL replicating [[cmsHeavyQuery]] exactly (same depth/width,
    * same md5-prefix buckets, integer end to end). */
  def cmsHeavyOracleSql(k: Int = 20): String = s"""
      WITH d AS (SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      occ AS (SELECT unnest(string_split(t, ' ')) AS word FROM d),
      keyed AS (SELECT j, word,
                  CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', word)), 1, 15)) AS BIGINT)
                    % $CmsWidth AS bucket
                FROM occ CROSS JOIN range(0, $CmsDepth) r(j)),
      counters AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
                   FROM keyed GROUP BY j, bucket),
      top AS (SELECT word, CAST(count(*) AS BIGINT) AS true_n
              FROM occ GROUP BY word
              ORDER BY true_n DESC, word LIMIT $k),
      probe AS (SELECT t.word, t.true_n,
                  CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', t.word)), 1, 15)) AS BIGINT)
                    % $CmsWidth AS bucket, j
                FROM top t CROSS JOIN range(0, $CmsDepth) r(j))
      SELECT p.word, p.true_n, min(c.cnt) AS est_n,
             min(c.cnt) - p.true_n AS overcount
      FROM probe p JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
      GROUP BY p.word, p.true_n
      ORDER BY p.true_n DESC, p.word"""

  val MhK = 32

  /** sk03 — MinHash estimate vs ground truth: for every VERIFIED near-dup
    * pair (the dd03 pair set), the `MhK`-permutation MinHash Jaccard
    * estimate (fraction of agreeing signature components) emitted BESIDE
    * the exact shingle Jaccard — the third sketch whose error is itself
    * oracle-checked (sk01 distinct-count, sk02 frequency, sk03 similarity).
    *
    * Signatures here use an md5-derived BASE hash per gram (folded into
    * the 2^31−1 Mersenne field) with the k components derived by the same
    * affine family [[graft.functions.MinHashSig]] uses — ONE md5 pass per
    * gram instead of k (32× less hash work; the round-8 stress run spent
    * 74 s here, almost all of it md5), while staying fully engine-portable:
    * DuckDB re-derives the identical base and the identical affine
    * components. Unlike dd03's production signatures (engine-native
    * xxhash64 base, ScalaTest-checkable only), this sketch is
    * oracle-checked end to end. Estimate and truth are exact integer
    * ratios: no rounding anywhere.
    *
    * Plan shape for 100 TB: the pair set is collision-bounded (the dd03
    * contract) and BROADCASTs into two joins against the shingle
    * projection; signatures are computed columnarly (one md5 pass, then
    * `MhK` primitive affine transforms, zero exchange) and only for docs
    * on the probe side of each join. */
  def minhashEstimateQuery(s: SparkSession, dir: String,
      k: Int = MhK): DataFrame = {
    val pairs = Dedup.boundedPairs(s, dir)
    val P = 2147483647L // 2^31 - 1
    val baseHashes = transform(col("sh"), g =>
      conv(substring(md5(g), 1, 15), 16, 10).cast("long") % P)
    val sigCols = (0 until k).map(j =>
      array_min(transform(col("hb"), x =>
        (x * (2 * j + 1) + 40503L * j) % P)).as(s"mh$j"))
    // signatures are computed ONLY for docs that participate in a verified
    // pair (broadcast semi-join on the bounded pair ids), not the corpus
    val pairDocs = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val sh = Tables.parallel(Tables.documents(s, dir))
      .join(broadcast(pairDocs), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        graft.functions.CharShingles.charShingles(col("text"), Dedup.ShingleSize).as("sh"))
      .withColumn("n", size(col("sh")))
      .withColumn("hb", baseHashes)
      .select(Seq(col("doc_id"), col("sh"), col("n")) ++ sigCols: _*)
    val a = sh.select(Seq(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      col("n").as("n_a")) ++ (0 until k).map(j => col(s"mh$j").as(s"a$j")): _*)
    val b = sh.select(Seq(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      col("n").as("n_b")) ++ (0 until k).map(j => col(s"mh$j").as(s"b$j")): _*)
    val matches = (0 until k).map(j =>
      when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L)).reduce(_ + _)
    a.join(broadcast(pairs), "doc_a").join(b, "doc_b")
      .withColumn("true_jaccard",
        graft.functions.Text.jaccardWithSizes(col("sh_a"), col("sh_b"),
          col("n_a"), col("n_b")))
      .withColumn("mh_matches", matches)
      .withColumn("est_jaccard",
        col("mh_matches").cast("double") / lit(k.toDouble))
      .select(col("doc_a"), col("doc_b"), col("true_jaccard"),
        col("mh_matches"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB SQL replicating [[minhashEstimateQuery]] exactly (same md5
    * base per gram, same Mersenne fold, same affine components, same
    * exact ratios) over the shared verified-pair subquery (`pairsSql` —
    * the SparkEntry dd05/dd06 pair text). */
  def minhashEstimateOracleSql(pairsSql: String, k: Int = MhK): String = {
    val sigSelects = (0 until k).map { j =>
      s"""list_min(list_transform(hb, x ->
           (x * ${2 * j + 1} + ${40503L * j}) % 2147483647)) AS mh$j"""
    }.mkString(",\n               ")
    val matchSum = (0 until k).map(j =>
      s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""
      WITH pairs AS MATERIALIZED ($pairsSql),
      sh AS (SELECT doc_id,
               list_distinct(list_transform(range(1, greatest(length(text)-3, 2)),
                             i -> substr(text, CAST(i AS INT), 5))) AS sh
             FROM documents
             WHERE doc_id IN (SELECT doc_a FROM pairs
                              UNION SELECT doc_b FROM pairs)),
      hb AS (SELECT doc_id, sh,
               list_transform(sh, g ->
                 CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) % 2147483647) AS hb
             FROM sh),
      sig AS MATERIALIZED (SELECT doc_id, sh, len(sh) AS n,
               $sigSelects
              FROM hb)
      SELECT p.doc_a, p.doc_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               (a.n + b.n - len(list_intersect(a.sh, b.sh))) AS true_jaccard,
             CAST($matchSum AS BIGINT) AS mh_matches,
             CAST($matchSum AS DOUBLE) / $k.0 AS est_jaccard
      FROM pairs p JOIN sig a ON a.doc_id = p.doc_a
                   JOIN sig b ON b.doc_id = p.doc_b
      ORDER BY p.doc_a, p.doc_b"""
  }

  val QuantileSampleRate = 0.1

  /** sk04 — sampled quantile estimation, error-checked: per event type,
    * p50/p90/p99 of `value` from a DETERMINISTIC 10% uniform sample
    * (md5(event_id) threshold — the sa03 recipe, so the sample is the
    * same rows in any engine) emitted BESIDE the exact quantiles — the
    * quantile member of the error-checked sketch family (sk01 distinct,
    * dd16 membership, sk02 frequency, sk03 similarity).
    *
    * Quantiles are rank-discrete with INTEGER rank arithmetic
    * (ceil(p·n) as (num·n + num) div den — float ceil(0.9·n) rounds the
    * wrong way at representable boundaries) and (value, event_id) tie
    * order: bit-deterministic, no rounding anywhere; the estimate columns
    * are passthrough values from sampled rows.
    *
    * Plan shape for 100 TB: the point of the sketch is the branch you
    * keep — the exact branch sorts every row within its type key (the
    * self-check); the production branch sorts only the sample, whose
    * rate is tuned so each key's sample fits an executor. Both branches
    * are ONE type-keyed window over (value, id) rows — the payload never
    * rides the exchange. */
  def sampleQuantilesQuery(s: SparkSession, dir: String,
      rate: Double = QuantileSampleRate): DataFrame = {
    val cut = Curation.hashCut(rate)
    def ranked(df: DataFrame, prefix: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      df.withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy(col("event_type"))
        .agg(
          max(col("n")).as(s"${prefix}n"),
          max(when(col("rnk") === expr(s"(n * 1 + 1) div 2"), col("value")))
            .as(s"${prefix}p50"),
          max(when(col("rnk") === expr(s"(n * 9 + 9) div 10"), col("value")))
            .as(s"${prefix}p90"),
          max(when(col("rnk") === expr(s"(n * 99 + 99) div 100"), col("value")))
            .as(s"${prefix}p99"))
    }
    val base = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), col("value"))
    val exact = ranked(base, "")
    val est = ranked(base.filter(
      Curation.md5Prefix32(col("event_id")).cast("long") < cut), "s_")
    exact.join(est, "event_type")
      .select(col("event_type"), col("n"), col("s_n"),
        col("p50"), col("s_p50").as("p50_est"),
        col("p90"), col("s_p90").as("p90_est"),
        col("p99"), col("s_p99").as("p99_est"))
      .orderBy(col("event_type"))
  }

  /** DuckDB SQL replicating [[sampleQuantilesQuery]] exactly (same md5
    * sample, same integer rank arithmetic, same tie order). */
  def sampleQuantilesOracleSql(rate: Double = QuantileSampleRate): String = {
    val cut = Curation.hashCut(rate)
    def rankedSql(src: String): String = s"""
      SELECT event_type,
             CAST(max(n) AS BIGINT) AS n,
             max(CASE WHEN rnk = (n * 1 + 1) // 2 THEN value END) AS p50,
             max(CASE WHEN rnk = (n * 9 + 9) // 10 THEN value END) AS p90,
             max(CASE WHEN rnk = (n * 99 + 99) // 100 THEN value END) AS p99
      FROM (SELECT event_type, value,
              CAST(row_number() OVER (PARTITION BY event_type
                ORDER BY value, event_id) AS BIGINT) AS rnk,
              CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
            FROM $src) z
      GROUP BY event_type"""
    s"""
      WITH ev AS (SELECT event_type, event_id, value FROM events),
      sampled AS (SELECT * FROM ev
                  WHERE CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        < $cut),
      exact AS (${rankedSql("ev")}),
      est AS (${rankedSql("sampled")})
      SELECT e.event_type, e.n, s.n AS s_n,
             e.p50, s.p50 AS p50_est,
             e.p90, s.p90 AS p90_est,
             e.p99, s.p99 AS p99_est
      FROM exact e JOIN est s USING (event_type)
      ORDER BY e.event_type"""
  }

  /** Sketch width for [[amsF2Query]] — 16 counters (±12% expected error on
    * F2; the error-check column reports the realized error). */
  val AmsCounters: Int = 16

  /** sk05 — AMS second-moment (F2) sketch (Alon-Matias-Szegedy 1996),
    * error-checked: F2 = Σ_t tf_t² over the corpus token frequencies is
    * the self-join size of the token stream — the statistic a planner
    * needs to cost a term-keyed join and the skew measure behind "is this
    * vocabulary head-heavy". The sketch keeps `AmsCounters` counters
    * c_i = Σ_t sign_i(t)·tf_t (four-universal signs here md5-derived per
    * (i, term) — deterministic AND engine-portable, the sk01/sk03 recipe)
    * and estimates F2 = mean(c_i²). The EXACT branch runs beside it and
    * the relative error is a reported column — the same contract as
    * sk01/sk02/sk04 (an approximation you can't error-check is a number,
    * not an operator).
    *
    * Determinism: tf, signs, counters and their squares are ALL exact
    * integers; the only division is the final /16 and the error ratio —
    * fixed IEEE ops both engines share (round 6dp on the ratio).
    *
    * Plan shape for 100 TB: ONE term-keyed map-side-combined exchange
    * builds the tf table; the 17 aggregates (exact + 16 counters) ride a
    * single 1-row reduce over it. The sketch's whole point at scale: the
    * counters merge associatively across any partitioning (each partial
    * is 16 longs), so the same query runs as a streaming accumulator —
    * this batch form IS the mergeable-state shape. */
  def amsF2Query(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.parallel(Tables.documents(s, dir))
      .select(explode(split(graft.functions.Text.normText(col("text")), " "))
        .as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
    def sign(i: Int): Column =
      when(conv(substring(md5(concat(lit(s"$i:"), col("term"))), 1, 1),
        16, 10).cast("int") % 2 === 0, lit(1L)).otherwise(lit(-1L))
    val aggs = sum(col("tf") * col("tf")).as("f2_exact") +:
      (0 until AmsCounters).map(i => sum(sign(i) * col("tf")).as(s"c$i"))
    val sq = (0 until AmsCounters).map(i => col(s"c$i") * col(s"c$i"))
      .reduce(_ + _)
    tf.agg(aggs.head, aggs.tail: _*)
      .select(col("f2_exact"),
        (sq.cast("double") / AmsCounters.toDouble).as("f2_est"))
      .select(col("f2_exact"), col("f2_est"),
        round(abs(col("f2_est") - col("f2_exact").cast("double")) /
          col("f2_exact").cast("double"), 6).as("rel_err"))
  }

  /** DuckDB SQL replicating [[amsF2Query]] exactly (same md5-parity signs
    * generated from the same counter spec, same all-integer arithmetic,
    * same two final divisions). */
  def amsF2OracleSql(counters: Int = AmsCounters): String = {
    val cs = (0 until counters).map { i =>
      s"""CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(concat('$i:', term)), 1, 1)) AS BIGINT) % 2 = 0
                   THEN tf ELSE -tf END) AS BIGINT) AS c$i"""
    }.mkString(",\n               ")
    val sq = (0 until counters).map(i => s"c$i*c$i").mkString(" + ")
    s"""
      WITH d AS (SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      toks AS (SELECT unnest(string_split(t, ' ')) AS term FROM d),
      tf AS (SELECT term, CAST(count(*) AS BIGINT) AS tf
             FROM toks WHERE length(term) > 0 GROUP BY term),
      agg AS (SELECT CAST(sum(tf*tf) AS BIGINT) AS f2_exact,
               $cs
              FROM tf),
      est AS (SELECT f2_exact,
                CAST($sq AS DOUBLE) / $counters.0 AS f2_est
              FROM agg)
      SELECT f2_exact, f2_est,
             round(abs(f2_est - CAST(f2_exact AS DOUBLE)) /
                   CAST(f2_exact AS DOUBLE), 6) AS rel_err
      FROM est"""
  }

  /** sk06 — KMV set operations per source pair (the theta-sketch use case:
    * set expressions over sketches instead of data): for every pair of
    * sources, the UNION distinct-vocabulary estimate from the MERGED
    * bottom-K sketch — merging two KMV sketches is taking the K smallest
    * of their union, which is EXACTLY the union's own sketch, the
    * mergeability that makes KMV deployable as a 100 TB partial aggregate —
    * and the INTERSECTION estimate by inclusion–exclusion
    * (est_a + est_b − est_union), each beside its exact count so the
    * estimator's error is itself oracle-checked. This answers "how much
    * vocabulary do two crawls share?" from K·|sources| numbers instead of
    * a pairwise token join — sk01 measures one source, this measures the
    * pairwise overlap structure.
    *
    * Determinism: hashes are md5-exact; the kth-hash choice is integer
    * ranking with a word tie-break; estimates are the sk01 two-division
    * sequence; inclusion–exclusion is one fixed a + b − u sequence; 4dp
    * round on output only. Small-set fallback: a merged sketch holding
    * fewer than K distinct elements IS the whole union (the merged
    * bottom-Ks always contain the union's true bottom-K), so it reports
    * exactly.
    *
    * Plan shape for 100 TB: the sketch branch touches the corpus ONCE —
    * the (source, word) distinct pass + per-source bottom-K (the sk01
    * WindowGroupLimit cut); everything pairwise then runs on sketch rows
    * (K·|sources|, broadcast-scale by construction). The exact branch —
    * the self-check a production run drops — is the word-keyed self-join
    * (Σ df² with df ≤ |sources|). */
  def kmvSetOpsQuery(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val norm = 1152921504606846976.0d // 2^60
    val dt = Tables.parallel(Tables.documents(s, dir))
      .select(col("source"),
        explode(split(Text.normText(col("text")), " ")).as("word"))
      .distinct()
    val hashed = dt.withColumn("h",
      conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("word"))
    val bk = hashed.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k).select(col("source"), col("word"), col("h"))
    val st = bk.groupBy(col("source"))
      .agg(max(col("h")).as("kth"), count(lit(1)).as("n_in"))
    val ex = dt.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    val ps = ex.join(st, Seq("source"), "left")
      .select(col("source"), col("n_exact"),
        when(col("n_in") === k,
          lit((k - 1).toDouble) / (col("kth").cast("double") / lit(norm)))
          .otherwise(col("n_exact").cast("double")).as("est"))
    val grid = ps.select(col("source").as("src_a"), col("n_exact").as("n_a"),
        col("est").as("est_a"))
      .join(ps.select(col("source").as("src_b"), col("n_exact").as("n_b"),
        col("est").as("est_b")), col("src_a") < col("src_b"))
    // merged sketch rows: both sources' bottom-Ks, deduped by word — a
    // broadcast-scale nested-loop against the K·|sources|-row sketch table
    val mrows = grid.select(col("src_a"), col("src_b"))
      .join(broadcast(bk),
        bk("source") === col("src_a") || bk("source") === col("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("word"))
      .agg(min(col("h")).as("h"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src_a"), col("src_b")).orderBy(col("h"), col("word"))
    val us = mrows.withColumn("rnk", row_number().over(wp))
      .filter(col("rnk") <= k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(max(col("h")).as("kthU"), count(lit(1)).as("nU"))
    val it = dt.alias("x")
      .join(dt.alias("y"),
        col("x.word") === col("y.word") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("n_int"))
    grid.join(us, Seq("src_a", "src_b"))
      .join(it, Seq("src_a", "src_b"), "left")
      .withColumn("n_int", coalesce(col("n_int"), lit(0L)))
      .withColumn("est_u",
        when(col("nU") === k,
          lit((k - 1).toDouble) / (col("kthU").cast("double") / lit(norm)))
          .otherwise(col("nU").cast("double")))
      .select(col("src_a"), col("src_b"),
        (col("n_a") + col("n_b") - col("n_int")).as("n_exact_union"),
        round(col("est_u"), 4).as("est_union"),
        col("n_int").as("n_exact_inter"),
        round(col("est_a") + col("est_b") - col("est_u"), 4).as("est_inter"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** DuckDB SQL replicating [[kmvSetOpsQuery]] exactly (same md5 60-bit
    * hashes, same merged bottom-K, same estimator sequences, same 4dp
    * rounds). */
  def kmvSetOpsOracleSql(k: Int = 16): String = s"""
      WITH d AS (SELECT source, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      dt AS (SELECT DISTINCT source, unnest(string_split(t, ' ')) AS word FROM d),
      hashed AS (SELECT source, word,
                   CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS h
                 FROM dt),
      bk AS (SELECT source, word, h
             FROM (SELECT source, word, h,
                     row_number() OVER (PARTITION BY source ORDER BY h, word) AS rnk
                   FROM hashed) z WHERE rnk <= $k),
      st AS (SELECT source, CAST(max(h) AS BIGINT) AS kth,
                    CAST(count(*) AS BIGINT) AS n_in
             FROM bk GROUP BY source),
      ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact
             FROM dt GROUP BY source),
      ps AS (SELECT source, n_exact,
               CASE WHEN n_in = $k
                    THEN ${(k - 1).toDouble} /
                         (CAST(kth AS DOUBLE) / 1152921504606846976.0)
                    ELSE CAST(n_exact AS DOUBLE) END AS est
             FROM ex LEFT JOIN st USING (source)),
      grid AS (SELECT a.source AS src_a, b.source AS src_b,
                      a.n_exact AS n_a, b.n_exact AS n_b,
                      a.est AS est_a, b.est AS est_b
               FROM ps a JOIN ps b ON a.source < b.source),
      mrows AS (SELECT g.src_a, g.src_b, k2.word, min(k2.h) AS h
                FROM grid g JOIN bk k2
                  ON k2.source = g.src_a OR k2.source = g.src_b
                GROUP BY g.src_a, g.src_b, k2.word),
      us AS (SELECT src_a, src_b, CAST(max(h) AS BIGINT) AS kthU,
                    CAST(count(*) AS BIGINT) AS nU
             FROM (SELECT src_a, src_b, word, h,
                     row_number() OVER (PARTITION BY src_a, src_b
                       ORDER BY h, word) AS rnk
                   FROM mrows) z WHERE rnk <= $k GROUP BY src_a, src_b),
      it AS (SELECT x.source AS src_a, y.source AS src_b,
                    CAST(count(*) AS BIGINT) AS n_int
             FROM dt x JOIN dt y
               ON x.word = y.word AND x.source < y.source
             GROUP BY x.source, y.source),
      u AS (SELECT g.src_a, g.src_b, g.n_a, g.n_b, g.est_a, g.est_b,
                   coalesce(it.n_int, CAST(0 AS BIGINT)) AS n_int,
                   CASE WHEN us.nU = $k
                        THEN ${(k - 1).toDouble} /
                             (CAST(us.kthU AS DOUBLE) / 1152921504606846976.0)
                        ELSE CAST(us.nU AS DOUBLE) END AS est_u
            FROM grid g JOIN us USING (src_a, src_b)
              LEFT JOIN it USING (src_a, src_b))
      SELECT src_a, src_b,
             CAST(n_a + n_b - n_int AS BIGINT) AS n_exact_union,
             round(est_u, 4) AS est_union,
             n_int AS n_exact_inter,
             round(est_a + est_b - est_u, 4) AS est_inter
      FROM u ORDER BY src_a, src_b"""
}
