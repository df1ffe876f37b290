package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Checkpoints, Tables}
import graft.functions.Text

/** Deduplication operators for a large-scale training-data pipeline.
  *
  * Three tiers, all shuffle-on-key (never O(n^2) over the corpus):
  *   - exact: hash-groupBy on a content fingerprint — one shuffle;
  *   - MinHash+LSH: shingle → signature → band-bucket equi-join — candidate
  *     generation cost scales with true collisions, not with corpus^2;
  *   - SimHash: 64-bit fingerprint + 16-bit band equi-join (pigeonhole
  *     guarantees recall for hamming <= 3).
  * At 100 TB the only all-pairs work ever done is inside LSH buckets.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  val ShingleSize  = 5
  val SigK         = 128
  val Bands        = 32   // 32 bands x 4 rows: P(candidate | j=0.8) ~ 1 - 5e-8
  val JaccardThreshold = 0.8

  /** LSH buckets larger than this are "hot": the all-pairs self-join inside
    * one bucket is quadratic ON A SINGLE REDUCER, so a corpus with heavy
    * boilerplate (thousands of near-identical docs — the realistic 100 TB
    * case) would stall one task on ~n^2/2 pairs. Above the cap we switch
    * that bucket to STAR candidates (every member vs. the bucket's min
    * doc_id) plus a second linear pass that pairs IDENTICAL fingerprints
    * within the bucket (member vs. fingerprint-group min) — so the
    * identical-doc case, which is what actually produces hot buckets, is
    * recovered exactly up to star shape. APPROXIMATION CONTRACT: pairs
    * between two non-min members with *different* fingerprints inside a
    * hot bucket are the only ones not emitted from that bucket (they may
    * still surface via a colder band); the star still (a) connects the whole
    * group into one component for [[dupClusters]] and (b) marks every
    * non-min member as a duplicate for [[dedupApply]].
    *
    * This value is the CEILING. The effective cap is DUPLICATION-ADAPTIVE
    * (round-10 scale lesson, SCALE.md 100×: a fixed cap is only correct
    * while expected duplication ≪ cap — at 100× near-copy flood the
    * mid-band buckets inflated ~100× yet stayed under 1024, and their
    * within-bucket all-pairs verification spilled >75 GB to an ENOSPC
    * kill). Exact copies never reach the buckets (canonicalize-first
    * collapses them), so the only observable signal of NEAR-copy
    * duplication is the bucket-population census itself — the effective
    * cap is derived from it per run: the largest cap ≤ this ceiling whose
    * cumulative within-bucket all-pairs candidate mass stays inside the
    * corpus-proportional [[hotPairBudget]] (see [[splitHotBuckets]]).
    * Buckets ≤ [[HotBucketCapFloor]] are never starred — their per-bucket
    * work is constant-bounded, so their total is corpus-linear. The test
    * corpora sit far under the budget (sf0.1: 263k candidate mass from
    * buckets over the floor vs a ≥1M budget; sf0.01: no bucket over the
    * floor at all — measured, pinned by DedupSpec), so every
    * oracle/bench-checked pair set still runs the exact path; the
    * adaptivity exists for production duplication, where it engages
    * WITHOUT the operator knowing its copy rate. An explicit cap argument
    * (e.g. [[minhashLshPairsCapped]]) bypasses the adaptive derivation
    * entirely — a forced-exact or forced-star run stays one argument
    * away. */
  val HotBucketCap = 1024

  /** Buckets at or under this population always run all-pairs: a bucket of
    * ≤64 members contributes ≤ 2016 candidate pairs — per-bucket constant,
    * corpus-linear in total — so starring them would trade exactness for
    * nothing. The adaptive cap never drops below this floor. */
  val HotBucketCapFloor = 64

  /** Within-bucket all-pairs candidate budget for the adaptive cap, as a
    * function of (deduplicated) corpus size: ~20 candidate pairs per
    * document, floored at 1M for small corpora. Proportional to the
    * corpus — i.e. to the cluster a production run sizes for that
    * corpus — NOT a global constant, so a 1000-executor run is allowed
    * 1000× the verification work of a laptop run; what it bounds is the
    * per-document blow-up that duplication causes (a 100× copy-flood
    * demands ~100× pairs per doc and is pushed to the star fallback). */
  def hotPairBudget(nDocs: Long): Long = math.max(1000000L, 20L * nDocs)

  /** Broadcast budget for the signature prefilter join: above this estimated
    * size the broadcast hint hard-fails (Spark's 8 GB limit) or OOMs the
    * driver, so the operator switches to distinct()+shuffle automatically. */
  val MaxSigBroadcastBytes: Long = 512L * 1024 * 1024

  /** The duplication-adaptive effective cap: the largest cap in
    * (floor, ceil] whose cumulative within-bucket all-pairs candidate
    * mass — Σ n_buckets(c)·c·(c−1)/2 over bucket sizes c ≤ cap, sizes
    * ascending — stays within `budgetPairs`; `floor` if even the smallest
    * over-floor size class blows the budget, `ceil` if everything fits.
    * The reduction is one aggregate over the (already computed) census
    * restricted to sizes in (floor, ceil] — at most ceil − floor rows BY
    * CONSTRUCTION, a counted driver fold like [[DriverCcMaxPairs]]'s. */
  private def adaptiveCap(census: DataFrame, floor: Int, ceil: Int,
      budgetPairs: Long): Int = {
    if (ceil <= floor) return ceil
    val hist = census
      .filter(col("count") > floor && col("count") <= ceil)
      .groupBy(col("count")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var remaining = budgetPairs
    var cap = floor
    var i = 0
    while (i < hist.length) {
      val (c, n) = hist(i)
      val pairs = n * (c * (c - 1) / 2)
      if (pairs > remaining) return cap
      remaining -= pairs
      cap = c.toInt
      i += 1
    }
    ceil
  }

  /** Skew guard for an LSH band self-join: splits band rows into
    * (cold rows, hot-bucket rows) by bucket population. The population count
    * is one narrow-column hash aggregate over the (already persisted) band
    * table; its result is tiny (one row per HOT bucket only), so checking it
    * on the driver costs one cheap job and lets us skip the guard joins
    * entirely in the overwhelmingly common no-skew case. The persisted hot
    * set (if any) is returned so the caller can release it.
    *
    * `cap` is the ceiling; when `adaptiveBudgetPairs` is set (the DEFAULT
    * operator entries pass [[hotPairBudget]]; explicit-cap entries pass
    * None, preserving forced behavior exactly) the effective cap is
    * [[adaptiveCap]] of the census under that budget — the round-10 fix
    * making the guard engage at production duplication without the
    * operator knowing its copy rate. Returns the effective cap so callers
    * can log it. */
  private def splitHotBuckets(
      bands: DataFrame, keys: Seq[String], cap: Int,
      adaptiveBudgetPairs: Option[Long] = None)
      : (DataFrame, DataFrame, Long, Option[DataFrame], Int) = {
    val census = bands.groupBy(keys.map(col): _*).count()
    val capEff = adaptiveBudgetPairs match {
      case Some(budget) =>
        val floor = math.min(HotBucketCapFloor, cap)
        val a = adaptiveCap(census, floor, cap, budget)
        if (a < cap)
          log.warn(s"splitHotBuckets: bucket census exceeds the all-pairs " +
            s"budget ($budget candidate pairs); adaptive cap $a (ceiling $cap) " +
            "— the corpus carries heavy near-copy duplication")
        a
      case None => cap
    }
    val hot = census
      .filter(col("count") > capEff)
      .select(keys.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nHot = hot.count()
    if (nHot == 0L) {
      hot.unpersist(blocking = false)
      (bands, null, 0L, None, capEff)
    } else {
      // hot is one row per overloaded bucket — broadcastable unless the skew
      // is itself pathological, in which case fall back to a shuffle join.
      val hotSide = if (nHot <= 100000L) broadcast(hot) else hot
      val cold  = bands.join(hotSide, keys, "left_anti")
      val inHot = bands.join(hotSide, keys, "left_semi")
      (cold, inHot, nHot, Some(hot), capEff)
    }
  }

  /** DuckDB SQL replicating [[simhashPairs]] exactly — the portable 60-bit
    * md5 fingerprint re-derived in pure SQL, then BRUTE-FORCE hamming <= 3
    * over all pairs. Serving as ground truth, it also proves the banded
    * equi-join path loses no pairs (hamming <= 3 pigeonholes into one of
    * the four 15-bit bands, so recall is exact by construction). */
  def simhashOracleSql: String = {
    // fingerprint bit b: majority vote over tokens of bit b of
    // h = first 15 hex chars of md5(token), parsed base-16 (ties -> 0)
    val bitTerms = (0 until 60).map { b =>
      s"CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 " +
        s"THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" +\n               ")
    s"""
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM d),
      th AS (SELECT doc_id, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
             FROM tok),
      fp AS (SELECT doc_id,
               $bitTerms AS fp
             FROM th GROUP BY doc_id)
      SELECT doc_a, doc_b, hamming FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id) p
      WHERE hamming <= 3 ORDER BY doc_a, doc_b"""
  }

  /** Exact duplicate groups by md5 of normalized text (A1-style hash agg). */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(Text.normText(col("text"))).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** Brute-force exact n-gram Jaccard near-dup pairs. Quadratic — correct
    * semantics oracle for the LSH path; never the plan you run at scale. */
  def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), graft.functions.CharShingles.charShingles(col("text"), ShingleSize).as("sh"))
      .withColumn("n", size(col("sh")))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        Text.jaccardWithSizes(col("sh_a"), col("sh_b"), col("n_a"), col("n_b")))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash-estimate prefilter cutoff: 5.7 sigma below the 0.8 threshold
    * at signature length 128 — cannot drop a true pair, kills the ~0.2
    * Jaccard background that dominates LSH bucket collisions. */
  val SigPrefilter = 0.6

  /** MinHash + LSH near-dup pairs, verified by exact Jaccard.
    *
    * Pipeline: canonicalize-first (identical raw texts collapse to one
    * representative, so exact copies never enter candidate generation) →
    * one-pass text→signature over DISTINCT texts → 32 band hashes →
    * explode → equi-self-join on (band, bandhash) → distinct candidates →
    * signature agreement prefilter → exact Jaccard verification → expand
    * through the membership table (within-group pairs are exactly 1.0).
    * With these parameters recall at the 0.8 threshold is 1 - 5e-8, so the
    * output equals [[ngramJaccardPairs]] — which is exactly how the oracle
    * checks it — while the plan is equi-joins instead of a cross join.
    *
    * Output-cardinality contract: the PAIR LISTING is inherently quadratic
    * in duplicate-group size (a 1M-copy boilerplate group owns ~5·10¹¹
    * true pairs). Canonicalize-first makes the COMPUTE output-sensitive,
    * but a consumer that only needs group structure should use the
    * membership-shaped operators ([[dupClusters]], [[dedupApply]],
    * [[canonicalSelect]]) whose output is linear in the corpus.
    *
    * Exactness caveat: buckets above [[HotBucketCap]] members emit star +
    * identical-signature candidates instead of all pairs (see the
    * [[HotBucketCap]] contract); the test corpus produces no such bucket,
    * so the oracle comparison runs the exact path. */
  def minhashLshPairs(s: SparkSession, dir: String): DataFrame =
    materializedVerifiedPairs(s, dir)._1
      .orderBy(col("doc_a"), col("doc_b"))

  /** [[minhashLshPairs]] with an explicit hot-bucket cap — the entry the
    * scale rehearsal (tools/Stress) uses to force the star fallback on a
    * corpus whose duplication actually overflows buckets, and the one a
    * production caller tunes when its boilerplate density differs from the
    * default contract. */
  def minhashLshPairsCapped(s: SparkSession, dir: String, hotBucketCap: Int): DataFrame =
    minhashLshPairsTracked(s, dir, hotBucketCap, adaptive = false)._1

  /** [[minhashLshPairs]] plus the list of frames it persisted, so a caller
    * that materializes a derivative (see [[dupClusters]], [[dedupApply]])
    * can release the intermediate cache blocks instead of accumulating them
    * for the life of the session. Callers that return the pair frame lazily
    * (the plain query path) leave the persists in place — they are released
    * by the session's cache-clear between queries. */
  private[operators] def minhashLshPairsTracked(
      s: SparkSession, dir: String, hotBucketCap: Int = HotBucketCap,
      adaptive: Boolean = true,
      capObserver: Int => Unit = _ => ())
      : (DataFrame, Seq[DataFrame]) = {
    val caches = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def cached(df: DataFrame): DataFrame = {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      caches += df
      df
    }

    // CANONICALIZE FIRST (er01's proven pattern): identical raw texts
    // collapse to one representative before ANY shingling, so exact copies
    // never enter candidate generation — the 10× stress corpus (10 copies
    // of everything) LSH-buckets at DISTINCT-text cost. The group-by's
    // map-side combine collapses same-partition copies before the one
    // fp-keyed corpus shuffle (the same exchange dd01 pays); texts within
    // a group are bytewise equal, so max(text) is deterministic. The key
    // is md5 of the RAW text (not dd01's normalized fingerprint): shingles
    // are computed over raw text, so only raw equality guarantees equal
    // shingle sets — i.e. an exactly-1.0 Jaccard the expansion below can
    // emit without re-verifying.
    // (null-text docs get a null fingerprint and drop out of `mem` at the
    // inner join below — output-equivalent to the pre-canonicalize plan,
    // where a null text produced a null signature, no bands, and no pairs)
    val fpDocs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), col("text"), md5(col("text")).as("fp"))
    val groups = cached(fpDocs
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep"), max(col("text")).as("text")))
    val mem = cached(fpDocs.select(col("doc_id"), col("fp"))
      .join(groups.select(col("fp"), col("rep")), "fp")
      .select(col("rep"), col("doc_id")))

    // Signatures are computed in ONE pass over the representative texts (no
    // shingle arrays materialized) and persisted — at cluster scale this is
    // the "write signatures to a staging table" step.
    val docs = cached(groups
      .select(col("rep").as("doc_id"),
        graft.functions.MinHashFromText.minhashFromText(col("text"), ShingleSize, SigK).as("sig")))

    val bands = cached(docs
      .select(col("doc_id"),
        explode(Text.lshBands(col("sig"), SigK, Bands)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh")))

    // deduplicated corpus size: sizes the adaptive hot-bucket budget AND
    // decides the prefilter join strategy below (docs is persisted; one
    // cheap job that also materializes the signature cache up front)
    val nDocs = docs.count()

    // hot-bucket skew guard: all-pairs only inside buckets below the cap;
    // oversized buckets emit linear star candidates instead. The DEFAULT
    // entry derives the effective cap from the bucket census under the
    // corpus-proportional pair budget (see HotBucketCap); an explicit cap
    // (minhashLshPairsCapped) is honored verbatim.
    val (cold, inHot, nHot, hotFrame, capEff) =
      splitHotBuckets(bands, Seq("band", "bh"), hotBucketCap,
        if (adaptive) Some(hotPairBudget(nDocs)) else None)
    capObserver(capEff)
    hotFrame.foreach(caches += _)
    if (nHot > 0)
      log.warn(s"minhashLshPairs: $nHot LSH bucket(s) exceed $capEff members; " +
        "emitting star + identical-signature candidates for those buckets " +
        "instead of all-pairs — non-min/non-min pairs with differing " +
        "signatures in hot buckets are dropped (see HotBucketCap contract)")

    // broadcast-vs-shuffle choice for the signature prefilter join: the sig
    // table is doc_id + SigK longs per doc. Above the budget the broadcast
    // hint would hard-fail (8 GB limit) — switch to distinct()-then-shuffle
    // so the join carries the deduplicated pair set instead.
    val sigBytes = nDocs * (8L * SigK + 64L)
    val broadcastSigs = sigBytes <= MaxSigBroadcastBytes
    if (!broadcastSigs)
      log.warn(s"minhashLshPairs: signature table ~${sigBytes >> 20} MiB exceeds " +
        s"broadcast budget (${MaxSigBroadcastBytes >> 20} MiB); using shuffle join " +
        "over distinct candidates")

    // candidate pairs straight off the band collisions — deliberately NOT
    // distinct'd on the broadcast path: deduplicating 100s of thousands of
    // raw collisions costs a full shuffle, while the signature prefilter
    // below is a cheap broadcast-join + 128-long compare that cuts them to
    // a handful first (a pair colliding in several bands just re-runs the
    // cheap compare)
    val coldPairs = cold.alias("x")
      .join(cold.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val candidates =
      if (nHot == 0L) coldPairs
      else {
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bh"))
        val starPairs = inHot
          .withColumn("min_id", min(col("doc_id")).over(wb))
          .filter(col("doc_id") > col("min_id"))
          .select(col("min_id").as("doc_a"), col("doc_id").as("doc_b"))
        // identical-signature recovery: the docs that actually produce hot
        // buckets are (near-)identical; star them per signature group so
        // every identical pair reaches the exact-verification stage. Groups
        // keyed by hash(sig): a hash collision only adds a candidate, which
        // exact verification then rejects — still linear per bucket. The
        // hash is computed ON THE JOIN PROJECTION so the window exchange
        // carries an 8-byte key, never the SigK-long signature array (at
        // 100× duplication the hot set is ~all band rows — full signatures
        // through this exchange would be tens of GB).
        val wfp = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bh"), col("sigh"))
        val fpStar = inHot
          .join(docs.select(col("doc_id"), hash(col("sig")).as("sigh")), "doc_id")
          .withColumn("fp_min", min(col("doc_id")).over(wfp))
          .filter(col("doc_id") > col("fp_min"))
          .select(col("fp_min").as("doc_a"), col("doc_id").as("doc_b"))
        coldPairs.unionByName(starPairs).unionByName(fpStar)
      }

    // cheap prefilter on signature agreement, then exact verification with
    // shingles computed only for the handful of surviving docs
    val candidateSet = if (broadcastSigs) candidates else candidates.distinct()
    val sigA = docs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val sigB = docs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val withSigs =
      if (broadcastSigs)
        candidateSet.join(broadcast(sigA), "doc_a").join(broadcast(sigB), "doc_b")
      else
        candidateSet.join(sigA, "doc_a").join(sigB, "doc_b")
    val prefiltered = cached(withSigs
      .filter(graft.functions.SigOverlap.sigOverlap(col("sig_a"), col("sig_b")) >= SigPrefilter)
      .select(col("doc_a"), col("doc_b"))
      .distinct())

    // shingles are computed ONLY for docs that survived the prefilter —
    // verification cost scales with survivors, not with the corpus
    val neededIds = prefiltered
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val sh = cached(Tables.documents(s, dir)
      .join(broadcast(neededIds), "doc_id")
      .select(col("doc_id"), graft.functions.CharShingles.charShingles(col("text"), ShingleSize).as("sh"))
      .withColumn("n", size(col("sh"))))
    val repPairs = prefiltered
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b")), "doc_b")
      .withColumn("jaccard",
        Text.jaccardWithSizes(col("sh_a"), col("sh_b"), col("n_a"), col("n_b")))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

    // expand representative pairs through the membership table (the er01
    // pattern): bytewise-equal texts have identical shingle sets, so a
    // cross-group pair inherits its representatives' exact Jaccard and a
    // within-group pair is exactly 1.0 ≥ threshold — both output-sensitive
    // (every emitted row is a true near-dup relation the contract demands).
    val cross = repPairs
      .join(mem.select(col("rep").as("doc_a"), col("doc_id").as("da")), "doc_a")
      .join(mem.select(col("rep").as("doc_b"), col("doc_id").as("db")), "doc_b")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("jaccard"))
    val within = mem.alias("x")
      .join(mem.alias("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(1.0d).as("jaccard"))
    val pairs = within.unionByName(cross)
      .orderBy(col("doc_a"), col("doc_b"))
    (pairs, caches.toSeq)
  }

  /** DuckDB SQL replicating [[repeatedSpans]] exactly (token 8-grams). */
  val repeatedSpansOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      tok AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
      spans AS (SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(w) - 6, 1)),
                    i -> array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' '))) AS span
                FROM tok),
      sd AS (SELECT span, count(DISTINCT doc_id) AS nd FROM spans GROUP BY span),
      perdoc AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                        CAST(sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
                 FROM spans s JOIN sd c USING (span) GROUP BY s.doc_id)
      SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
             coalesce(n_dup_spans, 0) AS n_dup_spans,
             CASE WHEN coalesce(n_spans, 0) > 0
                  THEN CAST(n_dup_spans AS DOUBLE) / n_spans END AS dup_ratio
      FROM d LEFT JOIN perdoc ON d.doc_id = perdoc.doc_id
      ORDER BY d.doc_id"""

  /** Repeated-span statistics (C4-style span dedup, the "remove any
    * three-sentence span occurring more than once" pass of large corpus
    * cleaning — here over token n-grams since the corpus is unpunctuated):
    * for every document, how many of its consecutive `n`-token spans also
    * occur in at least one OTHER document.
    *
    * Plan shape for 100 TB: spans are emitted positionally by one native
    * expression pass, the only shuffles are the span-key aggregation
    * (map-side combined) and the span-key join back — never any doc-pair
    * work. "Occurs in more than one doc" is computed as
    * min(doc_id) != max(doc_id) per span — EXACTLY equivalent to
    * countDistinct(doc_id) > 1 but with plain min/max partial aggregation
    * instead of a distinct-aggregate expand (no per-span doc_id
    * deduplication state; the oracle keeps the countDistinct formulation to
    * prove the equivalence). Output: doc_id, n_spans, n_dup_spans,
    * dup_ratio (null for docs shorter than n tokens). */
  def repeatedSpans(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val spans = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"),
        explode(graft.functions.TokenNgrams.tokenNgrams(
          Text.normText(col("text")), n)).as("span"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spanDocs = spans.groupBy(col("span"))
      .agg((min(col("doc_id")) =!= max(col("doc_id"))).as("multi_doc"))
    val perDoc = spans.join(spanDocs, "span")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("multi_doc"), 1L).otherwise(0L)).as("n_dup_spans"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(col("n_spans") > 0,
          col("n_dup_spans").cast("double") / col("n_spans")).as("dup_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination (the "remove eval-set contamination" pass
    * every serious training-data pipeline runs before training): docs from
    * `benchSource` are the held-out benchmark; every OTHER document is
    * scored by how many of its token `n`-grams also appear anywhere in the
    * benchmark, and flagged when the overlap is nonzero.
    *
    * Plan shape for 100 TB: benchmark sets are eval suites — bounded and
    * tiny relative to the corpus — so their distinct span set is broadcast
    * and the corpus side is ONE map-side pass (explode spans → broadcast
    * left join marker → per-doc partial agg). No shuffle of the exploded
    * corpus spans at all; the only wide exchange is the per-doc_id count
    * aggregation. If a benchmark ever outgrew the broadcast limit the join
    * degrades to shuffle-on-span, same answer. Output: doc_id, n_spans,
    * n_contam_spans, contaminated. */
  def decontaminate(s: SparkSession, dir: String, benchSource: String = "src0",
      n: Int = 8): DataFrame =
    decontamVerdicts(s, dir, benchSource, n).orderBy(col("doc_id"))

  /** Session memo of the decontamination manifest (round-14, the
    * [[Curation.curationVerdicts]] move): dd08 reports it and pl01/pl02
    * stage it — three consumers, each previously re-paying the full
    * span-explode + broadcast-mark + per-doc census chain. Keyed by every
    * parameter that shapes the relation; deterministic, so a memo hit is
    * oracle-invisible. Built by Bench's xm06 entry; released by
    * [[clearDecontamCache]]. */
  private val decontamCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, String, Int), DataFrame]

  /** Builds (or rebuilds) the decontamination memo — Bench's xm06. */
  def warmDecontamMemo(s: SparkSession, dir: String): Unit = {
    decontamVerdicts(s, dir, "src0", 8); ()
  }

  def clearDecontamCache(): Unit = {
    decontamCache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    decontamCache.clear()
  }

  private def evictOtherDecontamDirs(app: String, dir: String): Unit =
    decontamCache.keys.filter(k => k._1 == app && k._2 != dir).foreach { k =>
      decontamCache.remove(k).foreach { df =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () }
      }
    }

  private[operators] def decontamVerdicts(s: SparkSession, dir: String,
      benchSource: String, n: Int): DataFrame =
    decontamCache.getOrElseUpdate(
      (s.sparkContext.applicationId, dir, benchSource, n), {
        evictOtherDecontamDirs(s.sparkContext.applicationId, dir)
        Checkpoints.truncate(computeDecontam(s, dir, benchSource, n))
      })

  private[operators] def computeDecontam(s: SparkSession, dir: String,
      benchSource: String, n: Int): DataFrame = {
    def spansOf(df: DataFrame): DataFrame = df.select(col("doc_id"),
      explode(graft.functions.TokenNgrams.tokenNgrams(
        Text.normText(col("text")), n)).as("span"))
    val docs = Tables.parallel(Tables.documents(s, dir))
    val bench = spansOf(docs.filter(col("source") === benchSource))
      .select(col("span")).distinct().withColumn("bhit", lit(1))
    val corpus = docs.filter(col("source") =!= benchSource)
    val perDoc = spansOf(corpus)
      .join(broadcast(bench), Seq("span"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("bhit").isNotNull, 1L).otherwise(0L)).as("n_contam_spans"))
    corpus.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_contam_spans"), lit(0L)).as("n_contam_spans"),
        (coalesce(col("n_contam_spans"), lit(0L)) > 0).as("contaminated"))
  }

  /** DuckDB SQL replicating [[decontaminate]] exactly (token 8-grams) — a
    * def interpolating the SAME benchmark-source literal the Scala default
    * uses, so a non-default `benchSource` cannot silently diverge from the
    * declared oracle. */
  def decontaminateOracleSql(benchSource: String = "src0"): String = s"""
      WITH d AS (SELECT doc_id, source,
                        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      tok AS (SELECT doc_id, source, string_split(t, ' ') AS w FROM d),
      spans AS (SELECT doc_id, source,
                  unnest(list_transform(range(1, greatest(len(w) - 6, 1)),
                    i -> array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' '))) AS span
                FROM tok),
      bench AS (SELECT DISTINCT span FROM spans WHERE source = '$benchSource'),
      perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                        CAST(sum(CASE WHEN span IN (SELECT span FROM bench)
                                      THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_spans
                 FROM spans WHERE source <> '$benchSource' GROUP BY doc_id)
      SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
             coalesce(n_contam_spans, 0) AS n_contam_spans,
             coalesce(n_contam_spans, 0) > 0 AS contaminated
      FROM d LEFT JOIN perdoc USING (doc_id)
      WHERE d.source <> '$benchSource' ORDER BY d.doc_id"""

  /** Incremental ingestion dedup (the steady-state form of [[exactDedup]]:
    * every real pipeline deduplicates each NEW batch against the corpus it
    * has already accepted, not the world from scratch). Here the "existing
    * corpus" is sources src0..src9 and the "new batch" src10..src19; each
    * new document is marked duplicate-of-existing (fingerprint already in
    * the store), duplicate-within-batch (an earlier new doc has the same
    * fingerprint), or kept.
    *
    * Plan shape for 100 TB: fingerprints are md5 column ops; the store
    * probe is a distinct + equi-join on the hash (AQE broadcasts the batch
    * side when small — the common case: a daily batch vs a petabyte store
    * shuffles ONLY the batch); within-batch dedup is one min-per-key
    * window. Nothing rescans the accepted corpus's text.
    *
    * When the batch is too big to broadcast, Catalyst's runtime Bloom
    * filter (InjectRuntimeFilter) prunes the store scan before the shuffle
    * — PROVIDED the fingerprint is a materialized scan column, which a real
    * fingerprint store is. A join key computed inline (md5 over the text,
    * as this self-contained query does on both sides) is not eligible:
    * RuntimeFilterSpec pins both facts. */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"),
        substring(col("source"), 4, 10).cast("long").as("src_idx"),
        md5(Text.normText(col("text"))).as("fp"))
    val store = docs.filter(col("src_idx") < 10).select(col("fp")).distinct()
      .withColumn("in_store", lit(true))
    val batch = docs.filter(col("src_idx") >= 10)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    batch
      .join(store, Seq("fp"), "left")
      .withColumn("first_in_batch", min(col("doc_id")).over(w))
      .select(col("doc_id"),
        coalesce(col("in_store"), lit(false)).as("dup_of_existing"),
        (col("doc_id") =!= col("first_in_batch")).as("dup_within_batch"))
      .withColumn("keep", !col("dup_of_existing") && !col("dup_within_batch"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[incrementalDedup]] exactly. */
  val incrementalDedupOracleSql: String = """
      WITH d AS (SELECT doc_id, CAST(substr(source, 4) AS BIGINT) AS src_idx,
                        md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
                 FROM documents),
      store AS (SELECT DISTINCT fp FROM d WHERE src_idx < 10),
      batch AS (SELECT doc_id, fp,
                       min(doc_id) OVER (PARTITION BY fp) AS first_in_batch
                FROM d WHERE src_idx >= 10)
      SELECT b.doc_id,
             s.fp IS NOT NULL AS dup_of_existing,
             b.doc_id <> b.first_in_batch AS dup_within_batch,
             (s.fp IS NULL AND b.doc_id = b.first_in_batch) AS keep
      FROM batch b LEFT JOIN store s USING (fp)
      ORDER BY b.doc_id"""

  /** Transitive duplicate clusters from the LSH pair set — exact connected
    * components over the verified near-dup graph (execution is a
    * size-guarded hybrid, see [[clusterLabels]]). Output: (doc_id,
    * cluster_id=min id of the component) for every doc that appears in at
    * least one pair. */
  def dupClusters(s: SparkSession, dir: String): DataFrame =
    clusterLabels(s, dir)
      .orderBy(col("doc_id"))

  /** Pair-count bound under which connected components run as a driver
    * union-find instead of the distributed loop. The pair set is
    * collision-bounded (the LSH banding + verification admit TRUE
    * near-dup relations only — see SCALE.md's 10× rehearsal, where 50k
    * docs with 9 planted near-dups each produced 250k pairs), so at this
    * bound the collected edges are ≤ ~64 MB of longs: bounded by
    * construction, not by corpus size. A 100 TB corpus whose verified
    * pair set still exceeds this (billions of true duplicate relations)
    * takes the distributed min-label path below. */
  val DriverCcMaxPairs: Long = 4L * 1000 * 1000

  /** The unsorted (doc_id, cluster_id) component labels — shared by
    * [[dupClusters]] (which reports them) and the cluster-consuming
    * operators ([[canonicalSelect]], [[softDedup]]), which would otherwise
    * pay a pointless global range-exchange before their own shuffles.
    *
    * Hybrid execution: exact connected components either way, chosen by
    * the VERIFIED pair count. Under [[DriverCcMaxPairs]] the edge list
    * collects to a driver union-find (path-halving; O(E α)) — one job
    * instead of ~3 jobs × diameter rounds, and the labels return as a
    * LocalTableScan that downstream joins broadcast. Above it, the
    * distributed min-label propagation runs (each round one shuffle join;
    * rounds ~ component diameter). This is the standard production shape:
    * the pair GRAPH is orders smaller than the corpus, so the driver path
    * almost always wins, while the distributed path keeps the operator
    * total even when it doesn't.
    *
    * Session-memoized like the pair set it derives from (six consumers —
    * dd05/dd14/dd15, pl03/pl04, sa09 — would otherwise each re-run the
    * component fold): driver labels are a LocalTableScan (plan-embedded,
    * no cache blocks), distributed labels are already localCheckpoint'ed
    * by [[distributedLabels]]. Deterministic, so a memo hit is
    * oracle-invisible; released by [[clearPairCache]]. */
  private[operators] def clusterLabels(s: SparkSession, dir: String): DataFrame =
    labelCache.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      val (pairs, nPairs) = materializedVerifiedPairs(s, dir)
      val edges = pairs.select(col("doc_a"), col("doc_b"))
      if (nPairs <= DriverCcMaxPairs) localLabels(s, edges)
      else distributedLabels(edges)
    })

  /** Session-level memo of the VERIFIED near-dup pair set per
    * (applicationId, corpus dir) — the [[Classifier.knnNeighbors]] pattern
    * applied to the LSH chain (round-11 rehearsal finding: gr01–gr04,
    * sk03, dd05/dd06/dd14/dd15 and pl03/pl04 each re-derived the FULL
    * shingle→signature→band→verify chain — sk03 at 100× re-paid dd03's
    * 240 s, pl04's remaining 322 s was mostly the same re-pay). The pair
    * set is the k-independent unit every graph-shaped consumer starts
    * from, and it is collision-bounded (pairs-scale, not corpus-scale),
    * so holding ONE localCheckpoint'ed copy per corpus is the cheap side
    * of the trade at any scale. Deterministic, so a memo hit is
    * oracle-invisible.
    *
    * Cache discipline: inserting a NEW corpus key for the same application
    * evicts (unpersists) that application's entries for OTHER dirs — a
    * long-lived session sweeping many corpora pins at most one corpus's
    * pair blocks (the knnCache eviction contract). [[clearPairCache]]
    * drops everything. localCheckpoint caveat (applies to every memo in
    * this file and [[Classifier.knnNeighbors]]): blocks are
    * non-recoverable on executor loss and unsafe under dynamic
    * allocation — production sessions with dynamic allocation should
    * checkpoint to reliable storage instead. */
  private val pairCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (DataFrame, Long)]
  private val labelCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), DataFrame]

  /** Builds (or rebuilds) the session pair + cluster-label memos — the
    * entry Bench times as xm01 so the LSH+verify+components build cost
    * has a stable home instead of landing on whichever pair consumer
    * runs first (the round-12 dd03 phantom-regression finding). */
  def warmPairMemo(s: SparkSession, dir: String): Unit = {
    materializedVerifiedPairs(s, dir)
    clusterLabels(s, dir)
  }

  /** Drops every memoized pair/label frame (and unpersists their
    * checkpoint blocks, when the above-bound path left any) — the
    * [[Classifier.clearModelCache]] twin. */
  def clearPairCache(): Unit = {
    pairCache.values.foreach { case (df, _) =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    labelCache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    pairCache.clear(); labelCache.clear()
  }

  /** Evict other-dir entries for `app` (see the cache-discipline note
    * above): keeps a corpus sweep from pinning every corpus's blocks.
    *
    * INVALIDATION CONTRACT (deliberate trade, both directions were
    * weighed): eviction unpersists the old dir's checkpoint blocks, so a
    * LAZY frame obtained from the memo before a different-dir call is no
    * longer executable afterwards (checkpointing truncated its lineage —
    * there is nothing to recompute from). The alternative — leaving the
    * blocks alive — is precisely the unbounded multi-corpus pinning the
    * round-11 advice flagged. Consumers must materialize what they need
    * from one corpus before switching to another; every in-repo consumer
    * executes within its own query construction, and the driver-bound
    * path (LocalTableScan) is immune (rows are plan-embedded). */
  private def evictOtherDirs(app: String, dir: String): Unit = {
    pairCache.keys.filter(k => k._1 == app && k._2 != dir).foreach { k =>
      pairCache.remove(k).foreach { case (df, _) =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () }
      }
      labelCache.remove(k).foreach { df =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () }
      }
    }
  }

  /** The verified near-dup pair set, MATERIALIZED (chain run once, LSH
    * lineage caches released) — the shared memoized entry of every
    * graph-shaped consumer ([[clusterLabels]], [[Graph.dupHubRankQuery]],
    * [[boundedPairs]], [[dedupApply]], [[dupSourceMatrix]]): one place
    * owns the materialize/count/release-lineage discipline, so a new
    * consumer cannot drift on cache hygiene.
    *
    * Frame form is size-routed like the CC hybrid: under
    * [[DriverCcMaxPairs]] the pairs collect ONCE to a LocalTableScan —
    * plan-embedded rows with EXACT stats, so every consumer join
    * broadcasts for free and no SQL-cache entry exists for a
    * clearCache() to strip (the persist-for-stats alternative lost its
    * InMemoryRelation wrapper to any cache clear and silently degraded
    * joins to sort-merge). Above the bound the localCheckpoint'ed
    * distributed frame is returned — block-scan plans, shuffle joins,
    * which is the correct shape for a billion-pair graph anyway. Callers
    * must NOT unpersist the returned frame ([[clearPairCache]] owns
    * release). */
  private[operators] def materializedVerifiedPairs(s: SparkSession,
      dir: String): (DataFrame, Long) = {
    val app = s.sparkContext.applicationId
    pairCache.getOrElseUpdate((app, dir), {
      evictOtherDirs(app, dir)
      val (rawPairs, lshCaches) = minhashLshPairsTracked(s, dir)
      // eager localCheckpoint: materializes the blocks AND truncates the
      // plan, so the count and the (possible) collect below never re-run
      // the chain. jaccard rides along so dd03's own report is a memo
      // consumer too; graph consumers project it away (columnar, free).
      val cp = Checkpoints.truncate(rawPairs
        .select(col("doc_a"), col("doc_b"), col("jaccard")))
      val nPairs = cp.count()
      lshCaches.foreach(_.unpersist(blocking = false))
      if (nPairs <= DriverCcMaxPairs) {
        import s.implicits._
        val local = cp.as[(Long, Long, Double)].collect().toSeq
        cp.unpersist(blocking = false) // rows are plan-embedded now
        (s.createDataFrame(local).toDF("doc_a", "doc_b", "jaccard"), nPairs)
      } else (cp, nPairs)
    })
  }

  /** The verified pair set without its jaccard column — the entry of the
    * LAZY pair consumers (sk03, gr02, gr03, gr04). Form (LocalTableScan
    * vs checkpoint blocks) is whatever [[materializedVerifiedPairs]]
    * routed to. */
  private[operators] def boundedPairs(s: SparkSession, dir: String): DataFrame =
    materializedVerifiedPairs(s, dir)._1.select(col("doc_a"), col("doc_b"))

  /** Driver union-find over the bounded pair set (see [[clusterLabels]]):
    * path-halving find + link-to-min union, then every vertex labeled with
    * the minimum doc_id of its component — the same output contract as the
    * distributed path, verified equal in DedupSpec. */
  private[operators] def localLabels(s: SparkSession, pairs: DataFrame): DataFrame = {
    import s.implicits._
    val es = pairs.select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // link larger root under smaller: roots stay component minima, so no
      // second "resolve min" pass is needed
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val rows = parent.keysIterator.map(v => (v, find(v))).toSeq
    s.createDataFrame(rows).toDF("doc_id", "cluster_id")
  }

  /** Distributed min-label propagation (the > [[DriverCcMaxPairs]] path). */
  private[operators] def distributedLabels(pairs: DataFrame): DataFrame = {
    // localCheckpoint, not persist: `edges` is joined EVERY iteration, so
    // its PLAN STRING rides inside every iteration's plan — and the pair
    // set's plan is the whole LSH chain. persist() caches the data but
    // keeps the plan, and between the cadence-5 label checkpoints the
    // nested-join plan grows ~2× per round TIMES the LSH plan: the 100×
    // copymark rehearsal (round 11) measured 387M-char plan strings and
    // pl04 at 1054 s, nearly all of it driver-side plan formatting.
    // localCheckpoint (eager) materializes the same blocks AND truncates
    // the plan to a scan of them; the blocks free with the RDD via the
    // ContextCleaner once the final labels are themselves checkpointed.
    val edges = Checkpoints.truncate(pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))))

    var labels = edges.select(col("doc_a").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      // each node adopts min(own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels, edges("doc_a") === labels("id"))
        .groupBy(col("doc_b").as("id"))
        .agg(min(col("cluster")).as("ncluster"))
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("ncluster"), col("cluster"))).as("cluster"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      changed = next.join(labels.withColumnRenamed("cluster", "old"), "id")
        .filter(col("cluster") =!= col("old")).count()
      labels.unpersist(blocking = false) // superseded iteration's cache
      labels = next
      iter += 1
      // truncate lineage periodically: each round's plan nests the previous
      // round's join, and at real scale a 15-deep lineage makes every retry
      // recompute the whole history — localCheckpoint cuts the plan at the
      // materialized blocks (same pattern GraphX uses in Pregel)
      if (iter % 5 == 0) labels = Checkpoints.truncate(labels)
    }
    // silent non-convergence would report one component as several clusters
    require(changed == 0,
      s"dupClusters did not converge after $iter rounds (component diameter > $iter?)")
    // final truncation: consumers (pl04's broadcast(labels), dd06's join)
    // get a block scan, not the last ≤4 un-checkpointed rounds over edges
    Checkpoints.truncate(labels)
      .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
  }

  /** Canonical-document selection (dedup with a QUALITY policy instead of
    * keep-first): within every transitive near-dup cluster, keep the member
    * with the most content (max n_chars; ties break on min doc_id), and
    * report the cluster's size alongside — "which copy survives" is the
    * question every production dedup answers after clustering, and
    * keep-longest is the standard heuristic (e.g. CCNet keeps the longer
    * paragraph). Exact-integer ordering → fully deterministic cross-engine.
    *
    * Plan shape for 100 TB: the cluster labels are a tiny projection of the
    * near-dup graph (pairs only, never the corpus); the doc join carries
    * (doc_id, n_chars) — never text; the pick is one window over the
    * cluster-keyed shuffle, and the member count rides the SAME window
    * partition (one exchange serves both). */
  def canonicalSelect(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
    clusterLabels(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(cw))
      .filter(col("rnk") === 1)
      .select(col("cluster_id"), col("doc_id").as("kept_doc_id"),
        col("n_chars").as("kept_n_chars"), col("n_members"))
      .orderBy(col("cluster_id"))
  }

  /** Soft dedup (duplicate-aware REWEIGHTING instead of dropping): every
    * document gets training weight 1/|its near-dup cluster| (1.0 for
    * singletons), so duplicated content contributes once in expectation
    * while no document is discarded — the "count-based down-weighting"
    * alternative to hard dedup studied for LM training data. The weight is
    * ONE IEEE division of exact integers: bit-identical cross-engine.
    *
    * Plan shape for 100 TB: cluster sizes reduce the label set (pairs-scale,
    * not corpus-scale) with a map-side-combined count; the corpus pass is a
    * doc_id-keyed LEFT join against that tiny table (AQE broadcasts it) —
    * the text column is never touched. */
  def softDedup(s: SparkSession, dir: String): DataFrame =
    softWeights(s, dir).orderBy(col("doc_id"))

  /** The unsorted per-doc weights — shared by [[softDedup]] (which reports
    * them) and [[Pipeline.trainingWeightsQuery]] (which joins them). */
  private[operators] def softWeights(s: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabels(s, dir)
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("csize"))
    val perDoc = labels.join(sizes, "cluster_id")
    Tables.documents(s, dir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        (lit(1.0) / coalesce(col("csize"), lit(1L)).cast("double")).as("weight"))
  }

  /** Applied dedup (greedy keep-first): the retained corpus after dropping
    * the higher-id member of every detected near-dup pair. The drop set is
    * a distinct projection of the session-memoized pair set
    * ([[materializedVerifiedPairs]]) — pairs-scale blocks, no LSH re-run
    * when another consumer already paid for the chain. */
  def dedupApply(s: SparkSession, dir: String): DataFrame = {
    val (pairs, _) = materializedVerifiedPairs(s, dir)
    val drop = pairs.select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(s, dir)
      .join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Exact repeated-substring dedup, APPLY form (the Lee et al. 2021
    * "Deduplicating Training Data Makes Language Models Better" pass, over
    * token n-grams): token spans whose `n`-grams occur more than once
    * anywhere in the corpus are merged into MAXIMAL duplicated spans per
    * document (suffix-array semantics at fixed minimum length n), and each
    * document is rewritten with those spans removed. Output per document:
    * span count, tokens removed, and the md5 of the cleaned text (the
    * full rewritten corpus at scale; the hash keeps the oracle compact).
    *
    * Plan shape for 100 TB — every stage is shuffle-on-key, nothing
    * quadratic: (1) positional n-grams from one native-expression pass;
    * (2) a map-side-combined count keyed by gram marks duplicated grams;
    * (3) the gram join back carries only duplicated starts; (4) span
    * merging is a per-document gaps-and-islands window (one doc-keyed
    * exchange); (5) removal explodes covered positions (bounded by the
    * document's own length) and anti-joins the token stream; (6) the
    * rewrite reassembles positionally, the same pattern as vocab encoding.
    * The only corpus-volume exchanges are keyed by gram and by doc_id. */
  def substringDedup(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("gpos"))
    val docs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), Text.normText(col("text")).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val grams = docs.select(col("doc_id"),
      posexplode(graft.functions.TokenNgrams.tokenNgrams(col("t"), n))
        .as(Seq("gpos", "gram")))
    val dupGrams = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("gram"))
    val starts = grams.join(dupGrams, "gram").select(col("doc_id"), col("gpos"))

    // gaps-and-islands: starts within n of each other produce overlapping
    // or adjacent coverage — merge; a gap > n breaks the island
    val spans = starts
      .withColumn("prev", lag(col("gpos"), 1).over(wOrd))
      .withColumn("brk",
        when(col("prev").isNull || col("gpos") - col("prev") > n, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("gpos")).as("s"), (max(col("gpos")) + n - 1).as("e"))

    val covered = spans.select(col("doc_id"),
      explode(sequence(col("s"), col("e"))).as("pos"))
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("t"), " ")).as(Seq("pos", "w")))
    val cleaned = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        e => e.getField("w")), " ").as("cleaned"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("n_tokens_removed"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_tokens_removed"), lit(0L)).as("n_tokens_removed"),
        md5(coalesce(col("cleaned"), lit(""))).as("cleaned_md5"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[substringDedup]] exactly (token 8-grams).
    * Positions come from a constant range + length filter; a guard CTE
    * raises a loud error() if any document exceeds the cap, so a grown
    * corpus can never silently truncate the oracle's answer. */
  val substringDedupOracleSql: String = """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      tok AS (SELECT doc_id, string_split(t, ' ') AS w FROM d),
      guard AS (SELECT CASE WHEN max(len(w)) >= 8192
                       THEN error('substringDedup oracle: document exceeds 8191-token cap')
                       ELSE 1 END AS ok FROM tok),
      grams AS (SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS gpos,
                  array_to_string(w[CAST(r.i AS INT):CAST(r.i + 7 AS INT)], ' ') AS gram
                FROM tok, range(1, 8192) r(i) WHERE r.i <= len(w) - 7),
      dup AS (SELECT gram FROM (SELECT gram, count(*) AS c FROM grams GROUP BY gram) z
              WHERE c > 1),
      starts AS (SELECT doc_id, gpos FROM grams JOIN dup USING (gram)),
      isl AS (SELECT doc_id, gpos,
                CASE WHEN lag(gpos) OVER w IS NULL OR gpos - lag(gpos) OVER w > 8
                     THEN 1 ELSE 0 END AS brk
              FROM starts WINDOW w AS (PARTITION BY doc_id ORDER BY gpos)),
      isl2 AS (SELECT doc_id, gpos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY gpos
                                ROWS UNBOUNDED PRECEDING) AS island
               FROM isl),
      spans AS (SELECT doc_id, min(gpos) AS s, max(gpos) + 7 AS e
                FROM isl2 GROUP BY doc_id, island),
      covered AS (SELECT doc_id, s + r.i AS pos
                  FROM spans, range(0, 8192) r(i) WHERE r.i <= e - s),
      tokpos AS (SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS pos,
                        w[CAST(r.i AS INT)] AS tokw
                 FROM tok, range(1, 8192) r(i) WHERE r.i <= len(w)),
      cleaned AS (SELECT tp.doc_id,
                    md5(array_to_string(list(tokw ORDER BY tp.pos), ' ')) AS cm
                  FROM tokpos tp LEFT JOIN covered c
                    ON tp.doc_id = c.doc_id AND tp.pos = c.pos
                  WHERE c.pos IS NULL GROUP BY tp.doc_id),
      perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                        CAST(sum(e - s + 1) AS BIGINT) AS n_tokens_removed
                 FROM spans GROUP BY doc_id)
      SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
             coalesce(n_tokens_removed, 0) AS n_tokens_removed,
             coalesce(cm, md5('')) AS cleaned_md5
      FROM d LEFT JOIN perdoc USING (doc_id) LEFT JOIN cleaned USING (doc_id)
      CROSS JOIN guard WHERE guard.ok = 1
      ORDER BY d.doc_id"""

  /** Duplication provenance matrix — for every pair of sources, how many
    * verified near-dup pairs span them (diagnosing WHERE duplication comes
    * from: mirrored domains, re-crawls, boilerplate farms — the first
    * question a curator asks after [[minhashLshPairs]] fires).
    *
    * Plan shape for 100 TB: the pair set (already tiny relative to the
    * corpus — it scales with true duplication) is joined to the doc→source
    * projection twice, then reduced to at most |sources|^2 rows by a
    * map-side-combined count. Source pairs are canonicalized
    * (least, greatest) so the matrix is upper-triangular including the
    * diagonal (within-source duplication). */
  def dupSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val (pairs, _) = materializedVerifiedPairs(s, dir)
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_dup_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** SimHash fingerprints + near-pairs at hamming distance <= 3 via 15-bit
    * band equi-join. Output: candidate pairs with their hamming distance.
    *
    * Uses the PORTABLE 60-bit md5-based fingerprint ([[Md5SimHash60]]):
    * its arithmetic is expressible in DuckDB SQL, so the whole query —
    * fingerprint, banding, hamming cut — is oracle-checked end to end
    * (the xxhash-based [[graft.functions.SimHash64]] stays available where
    * cross-engine parity is not needed).
    *
    * Exactness caveat: buckets above `hotBucketCap` members emit star +
    * identical-fingerprint candidates instead of all pairs (see the
    * [[HotBucketCap]] contract — only non-min/non-min pairs with differing
    * fingerprints are dropped, and only from hot buckets). The test corpus
    * produces no hot bucket, so the brute-force oracle compares against the
    * exact path; pass a larger cap to force exactness on a skewed corpus. */
  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    simhashPairs(s, dir, HotBucketCap, adaptive = true)

  def simhashPairs(s: SparkSession, dir: String, hotBucketCap: Int,
      adaptive: Boolean = false): DataFrame =
    simhashPairsUnordered(s, dir, hotBucketCap, adaptive)
      .orderBy(col("doc_a"), col("doc_b"))

  /** [[simhashPairs]] without the declared output ordering — for
    * consumers that aggregate the pair stream (dd20): persisting the
    * ORDERED frame would materialize a range exchange + sort the
    * aggregations never needed (EliminateSorts removes it from lazy
    * plans, but a cache boundary defeats that). */
  private[operators] def simhashPairsUnordered(s: SparkSession, dir: String,
      hotBucketCap: Int, adaptive: Boolean): DataFrame = {
    val docs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"),
        graft.functions.Md5SimHash60.md5Simhash60(
          split(Text.normText(col("text")), " ")).as("sh64"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // four 15-bit bands; hamming <= 3 implies at least one band matches.
    // Persisted: it feeds both sides of the self-join plus the skew audit.
    val banded = docs.select(col("doc_id"), col("sh64"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh64"), b * 15).bitwiseAND(lit(0x7fffL))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandval")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // same hot-bucket guard as the MinHash path: a boilerplate-heavy corpus
    // drops thousands of near-identical fingerprints into one 16-bit bucket.
    // No canonicalize stage here (simhash buckets the full doc set), so the
    // budget is sized on the raw doc count.
    val nDocs = docs.count()
    val (cold, inHot, nHot, _, capEff) =
      splitHotBuckets(banded, Seq("band", "bandval"), hotBucketCap,
        if (adaptive) Some(hotPairBudget(nDocs)) else None)
    if (nHot > 0)
      log.warn(s"simhashPairs: $nHot simhash band bucket(s) exceed $capEff members; " +
        "emitting star + identical-fingerprint candidates for those buckets " +
        "instead of all-pairs — non-min/non-min pairs with differing " +
        "fingerprints in hot buckets are dropped (see HotBucketCap contract)")

    val coldPairs = cold.alias("x")
      .join(cold.alias("y"),
        col("x.band") === col("y.band") && col("x.bandval") === col("y.bandval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sh64").bitwiseXOR(col("y.sh64"))).cast("long").as("hamming"))
    val pairs =
      if (nHot == 0L) coldPairs
      else {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bandval"))
        val starPairs = inHot
          .withColumn("min_id", min(col("doc_id")).over(w))
          .withColumn("min_sh64", min_by(col("sh64"), col("doc_id")).over(w))
          .filter(col("doc_id") > col("min_id"))
          .select(col("min_id").as("doc_a"), col("doc_id").as("doc_b"),
            bit_count(col("min_sh64").bitwiseXOR(col("sh64"))).cast("long").as("hamming"))
        // identical-fingerprint recovery (see HotBucketCap): hamming-0 pairs
        // between same-fingerprint members, linear per bucket via a
        // fingerprint-group star
        val wfp = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bandval"), col("sh64"))
        val fpStar = inHot
          .withColumn("fp_min", min(col("doc_id")).over(wfp))
          .filter(col("doc_id") > col("fp_min"))
          .select(col("fp_min").as("doc_a"), col("doc_id").as("doc_b"),
            lit(0L).as("hamming"))
        coldPairs.unionByName(starPairs).unionByName(fpStar)
      }

    // filter BEFORE distinct: the hamming cut is a codegen'd bit_count over
    // each raw collision row, so the distinct shuffle carries only surviving
    // pairs instead of every band collision
    pairs
      .filter(col("hamming") <= 3)
      .distinct()
  }

  /** dd17 — cross-document boilerplate strip (the C4/RefinedWeb "remove
    * boilerplate lines seen in many pages" pass; the corpus is unpunctuated
    * single-line text, so the removable unit is a fixed-boundary `width`-token
    * segment instead of a line): every document is cut into consecutive
    * NON-overlapping `width`-token segments; a segment whose exact text occurs
    * in at least `minDocs` distinct documents is boilerplate; the document is
    * REWRITTEN with those segments dropped (unlike [[repeatedSpans]]/dd07,
    * which only scores overlap, this emits the cleaned text).
    *
    * Plan shape for 100 TB: segments are non-overlapping, so the exploded
    * stream is ≈ corpus token count / width — LINEAR, never pairwise. Three
    * exchanges, all key-partitioned and map-side combinable: (seg, doc_id)
    * dedup + per-seg doc count (the boilerplate vote), the seg-keyed marker
    * join back (both sides co-partitioned on seg; AQE broadcasts the
    * boilerplate side when it is small, which it is by construction — only
    * segments crossing the minDocs vote survive), and the per-doc reassembly
    * aggregation. Reassembly order is pinned by array_sort over (pos, seg)
    * structs — no collect_list order assumption. Docs whose text is null
    * bypass the pipeline (null clean_text); a doc whose every segment is
    * boilerplate comes back as the empty string, exactly like the oracle's
    * coalesced string_agg. */
  def boilerplateStrip(s: SparkSession, dir: String, width: Int = 4,
      minDocs: Int = 3): DataFrame = {
    val docs = Tables.parallel(Tables.documents(s, dir))
    val toks = split(Text.normText(col("text")), " ")
    val nseg = ((size(toks) + (width - 1)) / width).cast("int")
    val segs = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nseg - 1),
          i => array_join(slice(toks, i * width + 1, lit(width)), " ")))
          .as(Seq("pos", "seg")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bp = segs.select(col("seg"), col("doc_id")).distinct()
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("seg"), lit(true).as("is_bp"))
    val perDoc = segs.join(bp, Seq("seg"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("is_bp"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("is_bp").isNull, struct(col("pos"), col("seg"))))),
            x => x.getField("seg")),
          " ").as("clean_text"))
    docs.select(col("doc_id"), col("text").isNull.as("tnull"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        when(col("tnull"), lit(null: String))
          .otherwise(coalesce(col("clean_text"), lit(""))).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB SQL replicating [[boilerplateStrip]] exactly: same normalization,
    * same fixed-boundary token slices (1-based inclusive list slice = Spark's
    * `slice(toks, i*width+1, width)` with the short tail kept), same
    * countDistinct >= minDocs vote, same pos-ordered reassembly. */
  def boilerplateStripOracleSql(width: Int = 4, minDocs: Int = 3): String = s"""
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                 FROM documents),
      tok AS (SELECT doc_id, string_split(t, ' ') AS w FROM d WHERE t IS NOT NULL),
      seg AS (SELECT doc_id,
                unnest(range(0, (len(w) + ${width - 1}) // $width)) AS pos,
                unnest(list_transform(range(0, (len(w) + ${width - 1}) // $width),
                  i -> array_to_string(w[CAST(i*$width+1 AS INT):CAST(i*$width+$width AS INT)], ' '))) AS seg
              FROM tok),
      bp AS (SELECT seg FROM seg GROUP BY seg HAVING count(DISTINCT doc_id) >= $minDocs),
      marked AS (SELECT f.doc_id, f.pos, f.seg, (b.seg IS NOT NULL) AS is_bp
                 FROM seg f LEFT JOIN bp b ON f.seg = b.seg),
      perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
                        CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                        coalesce(string_agg(CASE WHEN NOT is_bp THEN seg END, ' ' ORDER BY pos), '') AS ct
                 FROM marked GROUP BY doc_id)
      SELECT d.doc_id, coalesce(n_segments, 0) AS n_segments,
             coalesce(n_removed, 0) AS n_removed,
             CASE WHEN d.t IS NULL THEN NULL ELSE coalesce(ct, '') END AS clean_text
      FROM d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id"""

  /** dd18 — SEMANTIC decontamination: the embedding-space complement of
    * [[decontaminate]]/dd08 (which only catches verbatim n-gram overlap —
    * a paraphrased eval question shares no 8-gram with its source but
    * lands next to it in embedding space). Vectors labeled `benchLabel`
    * are the held-out benchmark; every other vector is scored by its max
    * cosine to ANY benchmark vector and flagged when that exceeds
    * `threshold`, with the nearest benchmark id (tie: smaller id) and the
    * count of benchmark vectors above the threshold as audit columns.
    *
    * Plan shape for 100 TB: benchmark suites are bounded, so the bench
    * side broadcasts and the corpus side is ONE streamed pass (same
    * contract as dd08); the argmax is a map-side-combining max over a
    * (cos, -bench_id) struct — per-corpus-vector state is one struct, no
    * window shuffle, no bench-side distinct-aggregate. If a benchmark
    * outgrew the broadcast limit the sign-LSH bucketing of [[Similarity
    * .lshTopK]] substitutes for candidate generation, same verdict. */
  def semanticDecontaminate(s: SparkSession, dir: String, benchLabel: Int = 0,
      threshold: Double = 0.45): DataFrame = {
    val emb = Tables.parallel(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
    val bench = emb.filter(col("label") === benchLabel)
      .select(col("vec_id").as("bench_id"), col("v").as("bv"))
    emb.filter(col("label") =!= benchLabel)
      .join(broadcast(bench))
      .withColumn("cos",
        round(graft.functions.CosineSim.cosineSim(col("v"), col("bv")), 6))
      .groupBy(col("vec_id"))
      .agg(
        max(struct(col("cos"), (-col("bench_id")).as("nid"))).as("best"),
        sum(when(col("cos") >= threshold, 1L).otherwise(0L)).as("n_hits"))
      .select(
        col("vec_id"),
        col("best.cos").as("max_cos"),
        (-col("best.nid")).as("nearest_bench_id"),
        col("n_hits"),
        (col("best.cos") >= threshold).as("contaminated"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB SQL replicating [[semanticDecontaminate]] exactly: same
    * sequential-fold cosine (bit-identical to CosineSim), same 6dp round
    * before every comparison, min-id tie-break expressed as min(bench_id)
    * over the rows achieving the max (= the struct-max's negated-id
    * field). */
  def semanticDecontaminateOracleSql(benchLabel: Int = 0,
      threshold: Double = 0.45): String = s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
      b AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE label = $benchLabel),
      c AS (SELECT vec_id, v FROM e WHERE label <> $benchLabel),
      scored AS (SELECT c.vec_id, b.bench_id,
                   round((list_sum(list_transform(range(1, len(c.v)+1), i -> c.v[CAST(i AS INT)]*b.bv[CAST(i AS INT)])) /
                     (sqrt(list_sum(list_transform(range(1, len(c.v)+1), i -> c.v[CAST(i AS INT)]*c.v[CAST(i AS INT)]))) *
                      sqrt(list_sum(list_transform(range(1, len(b.bv)+1), i -> b.bv[CAST(i AS INT)]*b.bv[CAST(i AS INT)]))))), 6) AS cos
                 FROM c CROSS JOIN b),
      agg AS (SELECT vec_id, max(cos) AS max_cos,
                     CAST(sum(CASE WHEN cos >= $threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
              FROM scored GROUP BY vec_id),
      nearest AS (SELECT s.vec_id, min(s.bench_id) AS nearest_bench_id
                  FROM scored s JOIN agg a ON s.vec_id = a.vec_id AND s.cos = a.max_cos
                  GROUP BY s.vec_id)
      SELECT a.vec_id, a.max_cos, n.nearest_bench_id, a.n_hits,
             (a.max_cos >= $threshold) AS contaminated
      FROM agg a JOIN nearest n USING (vec_id) ORDER BY a.vec_id"""

  /** Containment threshold for [[containmentPairs]] — deliberately below
    * the 0.8 Jaccard bar: the operator's value is the pairs Jaccard
    * CANNOT see (small A inside big B scores low Jaccard but high
    * containment), and on this corpus τ = 0.7 is where genuinely
    * one-directional inclusions appear. */
  val ContainTau = 0.7
  /** Minimum contained-side shingle count for [[containmentPairs]] —
    * kills the trivially-contained tiny-doc noise. */
  val ContainMinTokens = 20

  /** dd19 — asymmetric shingle-set containment pairs: ordered (contained,
    * container) doc pairs where |A∩B| / |A| ≥ [[ContainTau]] and |A| ≥
    * [[ContainMinTokens]] over the DISTINCT [[ShingleSize]]-char shingle
    * sets of the raw text (dd02/dd03's unit — shingles, not word tokens:
    * this corpus's word vocabulary is ~31 terms, a degenerate space where
    * every doc "contains" every other; shingles carry position structure
    * and a Zipfian-ish df distribution). Jaccard (dd02/dd03) is symmetric
    * and misses INCLUSION — a document quoted whole inside a larger one
    * scores low Jaccard but containment ≈ 1; this is the quote/subset
    * detector a dedup cascade runs after the symmetric pass (and the
    * document-level cousin of dd11's substring containment).
    *
    * Determinism: all censuses are exact integer distinct-counts; the
    * score is ONE division, threshold-compared unrounded on both engines
    * (identical IEEE bit pattern), 6dp round on output only.
    *
    * Plan shape for 100 TB: canonicalize-first (the dd03/er01 move, here
    * keyed on md5 of the RAW text — shingles are over raw text on both
    * engines, so the raw fingerprint is exactly what determines the
    * shingle set; whitespace variants that would normalize together keep
    * distinct shingle sets and MUST stay distinct reps)
    * collapses exact copies before any pairing; candidate generation is a
    * LOSSLESS PREFIX FILTER (the SSJoin/PPJoin family — Chaudhuri et al.
    * ICDE'06, Xiao et al. WWW'08): with tokens globally ordered by
    * (df ASC, token), a pair with containment ≥ τ MUST share one of the
    * contained side's first n_a − ⌊τ·n_a⌋ + 2 rarest tokens (if B misses
    * that whole prefix, shared ≤ ⌊τ·n_a⌋ − 2 < τ·n_a; the +2 slack
    * absorbs the float ⌊⌋ against the exact final compare, making the
    * filter conservative by a full integer). So the candidate join runs
    * prefix(A) ⋈ tok(B): Σ_w df_prefix(w)·df(w), and a stopword is almost
    * never in a rarest-10% prefix — the Σdf² blowup of a naive token
    * self-join never happens. Verification then counts |A∩B| exactly with
    * doc-keyed equi-joins restricted to the surviving candidates
    * (output-sensitive), and the final threshold compare is the same
    * single IEEE division the oracle runs. Within-group pairs expand
    * through the membership table at exactly 1.0 — no recomputation.
    *
    * Regime caveat (measured on the 10x stress corpus): the prefix filter
    * presumes a Zipfian vocabulary — each document owns SOME rare tokens.
    * On a corpus with a small uniform vocabulary every token is common,
    * any token-based candidate filter degenerates to Σdf², and the true
    * containment pair listing is itself near-quadratic; there the
    * membership-shaped dd03/dd05 operators are the scale path and this
    * exact listing is a diagnostic to run on a sample. */
  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fpDocs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .withColumn("fp", md5(col("text")))
    val groups = fpDocs.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep"), max(col("text")).as("text"))
    val mem = fpDocs.select(col("doc_id"), col("fp"))
      .join(groups.select(col("fp"), col("rep")), "fp")
      .select(col("rep"), col("doc_id"))
    // the shingle table feeds prefix ranking, candidate join and two
    // verification joins: persist it once (the dd03 staging-table move;
    // the session cache-clear between queries releases it). charShingles
    // already emits DISTINCT shingles per doc — no extra distinct shuffle.
    val shing = groups.select(col("rep").as("doc"),
      graft.functions.CharShingles.charShingles(col("text"), ShingleSize)
        .as("sh"))
    val tok = shing.select(col("doc"), explode(col("sh")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = shing.select(col("doc"), size(col("sh")).cast("long").as("n_tok"))
    // contained-side prefix: the n − ⌊τ·n⌋ + 2 globally-rarest tokens
    val prefix = tok
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("w"))))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc")).orderBy(col("df"), col("w"))))
      .join(sizes, "doc")
      .filter(col("n_tok") >= ContainMinTokens)
      .filter(col("rnk") <=
        col("n_tok") - floor(lit(ContainTau) * col("n_tok")).cast("long") + 2L)
      .select(col("doc").as("ra"), col("w").as("pw"))
    // SALTED candidate join (q43's SkewJoin, semantics-preserving): a doc
    // whose every shingle is corpus-common puts hot shingles INTO its
    // prefix, and a plain w-keyed join then lands that shingle's whole
    // fan-out on one task (measured: a single 10-minute partial-distinct
    // task at sf0.1). Salting spreads each hot shingle's output over the
    // bucket count before the distinct's partial aggregation.
    val cand = SkewJoin.saltedEquiJoin(
        tok.select(col("doc").as("rb"), col("w")), prefix,
        "w", "pw", col("rb"), buckets = 32)
      .filter(col("ra") =!= col("rb"))
      .select(col("ra"), col("rb")).distinct()
    // exact |A ∩ B| for candidates only: expand by A's tokens, keep those
    // also in B — doc-keyed equi-joins, output-sensitive
    val inter = cand
      .join(tok.select(col("doc").as("ra"), col("w")), "ra")
      .join(tok.select(col("doc").as("rb"), col("w")), Seq("rb", "w"))
      .groupBy(col("ra"), col("rb")).agg(count(lit(1)).as("n_shared"))
    val repPairs = inter
      .join(sizes.select(col("doc").as("ra"), col("n_tok").as("n_a")), "ra")
      .join(sizes.select(col("doc").as("rb"), col("n_tok").as("n_b")), "rb")
      .withColumn("c", col("n_shared").cast("double") / col("n_a").cast("double"))
      .filter(col("n_a") >= ContainMinTokens && col("c") >= ContainTau)
    // bytewise-equal normalized texts have identical token sets: cross-group
    // pairs inherit their representatives' counts and score; within-group
    // ordered pairs are exactly |A|/|A| = 1.0
    val cross = repPairs
      .join(mem.select(col("rep").as("ra"), col("doc_id").as("da")), "ra")
      .join(mem.select(col("rep").as("rb"), col("doc_id").as("db")), "rb")
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("n_a"), col("n_b"), col("n_shared"), col("c"))
    val within = mem.alias("x")
      .join(mem.alias("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.rep").as("doc"), col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
      .join(sizes, "doc")
      .filter(col("n_tok") >= ContainMinTokens)
      .select(col("doc_a"), col("doc_b"), col("n_tok").as("n_a"),
        col("n_tok").as("n_b"), col("n_tok").as("n_shared"),
        lit(1.0d).as("c"))
    cross.unionByName(within)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("n_shared"), round(col("c"), 6).as("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB SQL replicating [[containmentPairs]] exactly — brute-force
    * shingle join over ALL docs (no canonicalization, no prefix filter):
    * the expansion path and the direct path must produce byte-identical
    * rows, which is the same equivalence the dd03 oracle proves for
    * Jaccard. Shingle derivation matches the dd12 oracle's (raw text,
    * 1-based substr, short-text single shingle). */
  def containmentOracleSql(tau: Double = ContainTau,
      minTok: Int = ContainMinTokens): String = s"""
      WITH psh AS (SELECT doc_id, list_distinct(list_transform(
                     range(1, greatest(length(text) - ${ShingleSize - 2}, 2)),
                     i -> substr(text, CAST(i AS INT), $ShingleSize))) AS s
                   FROM documents),
      tok AS (SELECT doc_id, unnest(s) AS w FROM psh),
      sz AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_tok FROM psh),
      iu AS (SELECT x.doc_id AS r1, y.doc_id AS r2, CAST(count(*) AS BIGINT) AS n_shared
             FROM tok x JOIN tok y ON x.w = y.w AND x.doc_id < y.doc_id
             GROUP BY 1, 2),
      i2 AS (SELECT r1 AS ra, r2 AS rb, n_shared FROM iu
             UNION ALL SELECT r2, r1, n_shared FROM iu)
      SELECT ra AS doc_a, rb AS doc_b, a.n_tok AS n_a, b.n_tok AS n_b,
             n_shared,
             round(CAST(n_shared AS DOUBLE) / CAST(a.n_tok AS DOUBLE), 6)
               AS containment
      FROM i2 JOIN sz a ON a.doc_id = ra JOIN sz b ON b.doc_id = rb
      WHERE a.n_tok >= $minTok
        AND CAST(n_shared AS DOUBLE) / CAST(a.n_tok AS DOUBLE) >= $tau
      ORDER BY doc_a, doc_b"""

  /** Sample gate for [[containmentPairsSampled]] — a doc participates on
    * the CONTAINED side iff the first two hex chars of md5(text) are
    * <= this bound ("0a" → bytes 0x00..0x0a → 11/256 ≈ 4.3%). Keying the
    * sample on the TEXT fingerprint (not doc_id) makes it atomic per
    * canonical group: every exact copy of a sampled text is sampled, so
    * the canonicalize-first collapse and the sample commute and the
    * membership expansion stays total. Both engines compare the same
    * lowercase-hex md5 prefix, and 2-char hex compares lexicographically
    * == numerically. */
  val ContainSampleHexMax = "0a"

  /** Size guard for [[containmentPairsSampled]]'s fused join: broadcast
    * the sampled token table when it holds at most this many rows (a
    * (long, 5-char) row hashes at ~50–100 B, so 1M rows ≈ 50–100 MB —
    * comfortable on production executors); above it, fall back to the
    * salted shuffle join. The dd05 size-guarded-hybrid move. */
  val ContainBroadcastMaxTokens = 1000000L

  /** dd21 — SAMPLED containment pairs: [[containmentPairs]] (dd19) with
    * the contained side confined to the deterministic
    * [[ContainSampleHexMax]] md5(text) sample — exact ordered (contained,
    * container) pairs where the contained doc is sampled, |A∩B|/|A| ≥
    * [[ContainTau]] and |A| ≥ [[ContainMinTokens]], against the FULL
    * container side. This is dd19's own scaladoc advice ("on dense-vocab
    * corpora, run the exact listing on a sample") turned into an
    * operator: the dense-vocab regime that degenerates every token-based
    * candidate filter to Σdf² (see SCALE.md's measured >80 GB spill at
    * 10×) scales the sampled listing's join volume LINEARLY by the
    * sample rate — the fused join below is Σ_w df_sampled(w)·df(w) ≈
    * rate·Σdf² (measured at sf0.1: 69.2M vs Σdf² = 1.54G) — which is
    * what makes this the member of the dd19 family that runs at sf0.1
    * under Bench and at 10× under Stress. The per-sampled-doc pair
    * density extrapolates corpus-wide by dividing by the 11/256 rate
    * (the sample is uniform over canonical texts by md5's uniformity).
    *
    * Determinism: the sample gate is a pure string compare on md5 hex
    * both engines compute identically; everything downstream is dd19's
    * exact-integer census and single IEEE division.
    *
    * Plan shape for 100 TB: canonicalize-first like dd19, then ONE FUSED
    * candidate+verify join. Shingles are DISTINCT per doc (charShingles
    * emits sets), so grouping the sampled⋈full token equi-join by the
    * doc pair and counting rows IS |A∩B| — dd19's prefix filter,
    * candidate distinct and verification re-expansion all collapse into
    * a single join + partial-aggregated count. That matters twice over:
    * on a Zipfian corpus the join volume is output-sensitive (rare
    * tokens dominate sampled prefixes), and on THIS dense-vocab corpus
    * the prefix filter prunes nothing anyway, so the fused join's
    * rate·Σdf² volume is the floor for an exact listing and every stage
    * dd19 runs on top of it is pure overhead (measured: 119 s → seconds
    * at sf0.1). The sampled side is tiny by construction (rate × corpus
    * tokens), so a size-guarded hybrid picks the join strategy: at or
    * under [[ContainBroadcastMaxTokens]] rows it broadcasts — the
    * container table never shuffles at all and the fan-out feeds the
    * count's partial aggregation inside the same stage; above the bound
    * it salts the container side ([[SkewJoin.saltedEquiJoin]], dd19's
    * q43 move) so a corpus-hot shingle spreads over the bucket count.
    * The full corpus is touched exactly once past canonicalization.
    *
    * `broadcastMaxTokens` overrides [[ContainBroadcastMaxTokens]] so the
    * branch-equivalence spec can force the salted-shuffle path on a tiny
    * corpus; production callers use the default. */
  def containmentPairsSampled(s: SparkSession, dir: String,
      broadcastMaxTokens: Long = ContainBroadcastMaxTokens): DataFrame = {
    val fpDocs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .withColumn("fp", md5(col("text")))
    val groups = fpDocs.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep"), max(col("text")).as("text"))
    val mem = fpDocs.select(col("doc_id"), col("fp"))
      .join(groups.select(col("fp"), col("rep")), "fp")
      .select(col("rep"), col("doc_id"))
    // the shingle table feeds both sides of the fused join AND the size
    // census: persist the ARRAY form once (round-14; formerly the exploded
    // token table was persisted and `sizes` re-ran the scan + shingling a
    // second time) — the array form is the smaller cache (no per-token row
    // overhead) and both consumers derive from it with a cheap explode /
    // size() projection. Released by the session cache-clear between
    // queries, so embedders who reuse a session should clear the cache
    // after their final action.
    val shing = groups.select(col("rep").as("doc"),
      (substring(col("fp"), 1, 2) <= lit(ContainSampleHexMax)).as("sampled"),
      graft.functions.CharShingles.charShingles(col("text"), ShingleSize)
        .as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tok = shing.select(col("doc"), explode(col("sh")).as("w"))
    val sizes = shing.select(col("doc"), col("sampled"),
      size(col("sh")).cast("long").as("n_tok"))
    val sampDocs = sizes
      .filter(col("sampled") && col("n_tok") >= ContainMinTokens)
      .select(col("doc"), col("n_tok"))
    val sampSide = tok.join(sampDocs.select(col("doc")), "doc")
      .select(col("doc").as("ra"), col("w").as("pw"))
    // size-guarded hybrid: ONE driver-side count of the sampled tokens
    // decides broadcast vs salted shuffle (see scaladoc)
    val nSampTok = sampDocs
      .agg(coalesce(sum(col("n_tok")), lit(0L)).as("n")).head().getLong(0)
    val joined =
      if (nSampTok <= broadcastMaxTokens)
        tok.select(col("doc").as("rb"), col("w"))
          .join(broadcast(sampSide), col("w") === col("pw"))
      else SkewJoin.saltedEquiJoin(
        tok.select(col("doc").as("rb"), col("w")), sampSide,
        "w", "pw", col("rb"), buckets = 32)
    // FUSED candidate+verify: per-doc-distinct shingles make the pairwise
    // row count of the token equi-join exactly |A∩B|
    val inter = joined
      .filter(col("ra") =!= col("rb"))
      .groupBy(col("ra"), col("rb")).agg(count(lit(1)).as("n_shared"))
    val repPairs = inter
      .join(sampDocs.select(col("doc").as("ra"), col("n_tok").as("n_a")), "ra")
      .join(sizes.select(col("doc").as("rb"), col("n_tok").as("n_b")), "rb")
      .withColumn("c", col("n_shared").cast("double") / col("n_a").cast("double"))
      .filter(col("c") >= ContainTau)
    // expansion through membership: the sample is fp-atomic, so every
    // member of a sampled rep is sampled — cross pairs expand totally,
    // within-group ordered pairs of sampled reps score exactly 1.0
    val cross = repPairs
      .join(mem.select(col("rep").as("ra"), col("doc_id").as("da")), "ra")
      .join(mem.select(col("rep").as("rb"), col("doc_id").as("db")), "rb")
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("n_a"), col("n_b"), col("n_shared"), col("c"))
    val within = mem.alias("x")
      .join(mem.alias("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.rep").as("doc"), col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
      .join(sampDocs, "doc")
      .select(col("doc_a"), col("doc_b"), col("n_tok").as("n_a"),
        col("n_tok").as("n_b"), col("n_tok").as("n_shared"),
        lit(1.0d).as("c"))
    cross.unionByName(within)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("n_shared"), round(col("c"), 6).as("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB SQL replicating [[containmentPairsSampled]] exactly —
    * brute-force ordered shingle join with the contained side gated by
    * the same md5(text) hex-prefix sample, no canonicalization and no
    * prefix filter (the dd19 oracle equivalence, restricted). */
  def containmentSampledOracleSql(tau: Double = ContainTau,
      minTok: Int = ContainMinTokens,
      hexMax: String = ContainSampleHexMax): String = s"""
      WITH psh AS (SELECT doc_id, text, list_distinct(list_transform(
                     range(1, greatest(length(text) - ${ShingleSize - 2}, 2)),
                     i -> substr(text, CAST(i AS INT), $ShingleSize))) AS s
                   FROM documents),
      tok AS (SELECT doc_id, unnest(s) AS w FROM psh),
      sz AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_tok FROM psh),
      sd AS (SELECT doc_id FROM psh WHERE substr(md5(text), 1, 2) <= '$hexMax'),
      iu AS (SELECT x.doc_id AS ra, y.doc_id AS rb,
                    CAST(count(*) AS BIGINT) AS n_shared
             FROM tok x
               JOIN sd ON sd.doc_id = x.doc_id
               JOIN tok y ON x.w = y.w AND x.doc_id <> y.doc_id
             GROUP BY 1, 2)
      SELECT ra AS doc_a, rb AS doc_b, a.n_tok AS n_a, b.n_tok AS n_b,
             n_shared,
             round(CAST(n_shared AS DOUBLE) / CAST(a.n_tok AS DOUBLE), 6)
               AS containment
      FROM iu JOIN sz a ON a.doc_id = ra JOIN sz b ON b.doc_id = rb
      WHERE a.n_tok >= $minTok
        AND CAST(n_shared AS DOUBLE) / CAST(a.n_tok AS DOUBLE) >= $tau
      ORDER BY doc_a, doc_b"""

  /** Bottom-k sketch size for [[sketchContainmentQuery]] — k = 64 keeps
    * the Jaccard estimator's std error ≈ 1/√k ≈ 12.5%, plenty for a
    * screen at τ = [[SketchTau]]. */
  val SketchK = 64
  /** Screen threshold — deliberately permissive (a screen feeds the exact
    * dd19/dd21 listing, so false positives cost a re-check, false
    * negatives cost a leak). */
  val SketchTau = 0.5
  /** Deterministic stand-in for the external reference list: docs with
    * id % mod == 0 and id <= maxId. Bounded BY CONTRACT — the real-world
    * reference set is a benchmark/eval suite, not a corpus slice — so the
    * broadcast side stays fixed as the corpus grows. */
  val SketchRefMod = 97
  val SketchRefMaxId = 10000L

  /** dd22 — sketch-containment screen: for every (reference doc A, corpus
    * doc B) pair, an ESTIMATE of containment |A∩B| / |A| from bottom-k
    * (KMV) sketches of their shingle sets, kept where the estimate ≥
    * [[SketchTau]]. This is the SCALE PATH for the containment family on
    * corpora where the exact listing is inherently near-quadratic (the
    * dense-vocab regime that exempts dd19 and rate-limits dd21): the
    * sketches are one linear corpus pass, the reference side is bounded
    * by contract, and the screen's survivors are the only pairs the exact
    * listing ever needs to verify — the dd16-bloom-before-dd08 pattern,
    * applied to containment. Estimator: KMV union sketch (Beyer et al.
    * SIGMOD'07; Broder's MinHash resemblance) — merge the two bottom-k
    * sets, re-cut to k, Ĵ = |merged ∩ S_A ∩ S_B| / |merged|; containment
    * then follows from the exact set sizes (which ARE known — they ride
    * the same scan): ĉ = Ĵ·(n_A + n_B) / ((1 + Ĵ)·n_A).
    *
    * Determinism: hashes are the sk01 60-bit md5-prefix (engine-portable,
    * no RNG); bottom-k membership is (h, shingle)-ordered; the estimate
    * is one fixed IEEE expression, threshold-compared UNROUNDED on both
    * engines, 6dp-rounded on output only.
    *
    * Plan shape for 100 TB: the per-doc sketch is a doc-keyed window that
    * InferWindowGroupLimit cuts to k rows per map task BEFORE the doc
    * exchange (the sk01 shape, pinned); reference sketches broadcast
    * (bounded by contract); the pair pass is a broadcast join whose
    * per-row work is O(k·|refs|) array arithmetic inside codegen — the
    * corpus is scanned once past the sketch build and NOTHING corpus×
    * corpus is ever formed. */
  /** `feasibleTau`: when set, pairs whose candidate is too small to EVER
    * reach that containment (n_tok < (2·τ−1)·n_ref ⇒ c_max = n_tok/n_ref
    * < τ, see the funnel's clamp note) are dropped BEFORE the O(k) merge
    * — the merge is the screen's only per-pair cost, so the τ-infeasible
    * pairs the funnel's gate would discard anyway never pay it. Plain
    * dd22 passes None (its own τ_screen admits pairs the exact listing
    * re-checks; feasibility at τ_screen barely prunes). */
  def sketchContainmentQuery(s: SparkSession, dir: String,
      k: Int = SketchK, tau: Double = SketchTau,
      feasibleTau: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.parallel(Tables.documents(s, dir))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val shing = docs.select(col("doc_id"),
      graft.functions.CharShingles.charShingles(col("text"), ShingleSize)
        .as("sh"))
    // n_tok RIDES the token rows through the window cut (round-14): the
    // former shape derived sizes from a SECOND documents scan — a full
    // re-shingling of the corpus — and reunited it with the sketches by a
    // doc-keyed join (scan + exchange + join, ×2 with the ref side). One
    // 8-byte column on the ≤k-per-doc-per-map-task surviving rows is free
    // by comparison, and first(n_tok) per doc group is exact (every token
    // row of a doc carries the same size).
    val tok = shing.select(col("doc_id"),
        size(col("sh")).cast("long").as("n_tok"), explode(col("sh")).as("w"))
      .withColumn("h", conv(substring(md5(col("w")), 1, 15), 16, 10)
        .cast("long"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("h"), col("w"))
    val docSk = tok
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("h"))).as("sk"),
        first(col("n_tok")).as("n_tok"))
    val refs = docSk
      .filter(col("doc_id") % SketchRefMod === 0 &&
        col("doc_id") <= SketchRefMaxId &&
        col("n_tok") >= ContainMinTokens)
      .select(col("doc_id").as("ref_id"), col("sk").as("ska"),
        col("n_tok").as("n_ref"))
    // [m, inter] via the native two-pointer merge ([[graft.functions
    // .KmvMergeCounts]]): the equivalent HOF chain (array_union → sort →
    // slice → contains-filter) is CodegenFallback — interpreted per PAIR
    // with allocations — and measured 49 s at sf0.1 / 632 s at the 100×
    // rehearsal's 52M pair-estimates; the expression is O(k) primitive
    // compares, no allocation
    val joined = docSk.join(broadcast(refs), col("doc_id") =!= col("ref_id"))
    val feasible = feasibleTau.fold(joined)(t =>
      joined.filter(col("n_tok").cast("double") >=
        (lit(2.0d) * lit(t) - lit(1.0d)) * col("n_ref").cast("double")))
    feasible
      .withColumn("mi", graft.functions.KmvMergeCounts.kmvMergeCounts(
        col("ska"), col("sk"), k))
      .withColumn("est_j",
        element_at(col("mi"), 2).cast("double") /
          element_at(col("mi"), 1).cast("double"))
      .withColumn("c",
        (col("est_j") * (col("n_ref") + col("n_tok")).cast("double")) /
          ((lit(1.0d) + col("est_j")) * col("n_ref").cast("double")))
      .filter(col("c") >= tau)
      .select(col("ref_id"), col("doc_id"), col("n_ref"), col("n_tok"),
        round(col("est_j"), 6).as("est_jaccard"),
        round(col("c"), 6).as("est_containment"))
      .orderBy(col("ref_id"), col("doc_id"))
  }

  /** DuckDB SQL replicating [[sketchContainmentQuery]] exactly — same
    * 60-bit md5-prefix hashes, same (h, shingle)-ordered bottom-k, same
    * merge-and-recut estimator, same unrounded threshold compare. */
  def sketchContainmentOracleSql(k: Int = SketchK, tau: Double = SketchTau,
      refMod: Int = SketchRefMod, refMaxId: Long = SketchRefMaxId,
      minTok: Int = ContainMinTokens,
      feasibleTau: Option[Double] = None): String = s"""
      WITH psh AS (SELECT doc_id, list_distinct(list_transform(
                     range(1, greatest(length(text) - ${ShingleSize - 2}, 2)),
                     i -> substr(text, CAST(i AS INT), $ShingleSize))) AS s
                   FROM documents WHERE text IS NOT NULL),
      sz AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_tok FROM psh),
      tok AS (SELECT doc_id, unnest(s) AS w FROM psh),
      hashed AS (SELECT doc_id, w,
                   CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
                 FROM tok),
      sk AS (SELECT doc_id, (list(h ORDER BY h, w))[1:$k] AS sk
             FROM hashed GROUP BY doc_id),
      ds AS (SELECT doc_id, sk, n_tok FROM sk JOIN sz USING (doc_id)),
      refs AS (SELECT doc_id AS ref_id, sk AS ska, n_tok AS n_ref FROM ds
               WHERE doc_id % $refMod = 0 AND doc_id <= $refMaxId
                 AND n_tok >= $minTok),
      est AS (SELECT ref_id, doc_id, n_ref, n_tok,
                CAST(len(list_filter(m, x -> list_contains(ska, x)
                       AND list_contains(sk, x))) AS DOUBLE) /
                  CAST(len(m) AS DOUBLE) AS j
              FROM (SELECT *,
                      (list_sort(list_distinct(ska || sk)))[1:$k] AS m
                    FROM refs, ds WHERE ds.doc_id <> refs.ref_id${
      feasibleTau.fold("")(t =>
        s"\n                      AND CAST(ds.n_tok AS DOUBLE) >= " +
          s"(2.0 * $t - 1.0) * CAST(refs.n_ref AS DOUBLE)")}) z),
      scr AS (SELECT *,
                (j * CAST(n_ref + n_tok AS DOUBLE)) /
                  ((1.0 + j) * CAST(n_ref AS DOUBLE)) AS c
              FROM est)
      SELECT ref_id, doc_id, n_ref, n_tok,
             round(j, 6) AS est_jaccard, round(c, 6) AS est_containment
      FROM scr WHERE c >= $tau
      ORDER BY ref_id, doc_id"""

  /** Survivor-broadcast guard for [[containmentFunnelQuery]]'s verify
    * joins: the screen's survivor pair list broadcasts when it holds at
    * most this many rows (two longs hash at ~50 B/row, so 2M rows ≈
    * 100 MB — the practical executor ceiling); above it the verify joins
    * shuffle on their keys instead. The dd05/dd21 size-guarded-hybrid
    * move, decided by ONE driver-side count that also materializes the
    * persisted screen. */
  val FunnelBroadcastMaxSurvivors = 2000000L

  /** Sketch depth for the FUNNEL's screen pass — deeper than dd22's
    * standalone k = [[SketchK]] because the funnel PAYS for every screen
    * survivor with an exact verify: at the 100× rehearsal the k=64 screen
    * passed 6.7M random-overlap pairs and the verify spent 400+ s
    * refuting every one. 4× the depth halves the estimator's σ twice
    * over; the screen's own cost is O(k) per pair inside codegen and one
    * k-row window cut per doc — corpus-linear either way. k = 256 is the
    * MEASURED sweet spot of the merge-cost-vs-survivor-volume trade
    * (sf0.1 funnel survivors/wall: k=128 → 12,754/4.6 s; k=256 →
    * 7,884/4.2 s; k=512 → 5,975/4.5 s — halving σ again buys too few
    * survivors for the doubled merge). */
  val FunnelScreenK = 256

  /** z-score of the funnel's precision gate (see
    * [[containmentFunnelQuery]]): a pair whose TRUE containment is
    * exactly [[ContainTau]] survives the gate with Φ(3) ≈ 99.87%
    * probability per pair — recall is spent where the estimator actually
    * needs it (per-pair, size-aware) instead of a flat τ_screen margin
    * paying for worst-case variance on every pair. */
  val FunnelScreenZ = 3.0

  /** Broadcast budget for the funnel verify's REFERENCE token table, in
    * shingle rows (Σ n_ref over surviving refs): ~60 B per hashed row
    * puts 8M rows ≈ 500 MB — the executor-memory ceiling the survivor
    * guard uses. Above it the verify's token join shuffles on
    * (ref_id, w) instead of broadcasting (round-11 advice: the SketchRef
    * contract bounds the ref COUNT but not per-doc shingle counts, so a
    * few huge reference docs could blow an unconditional broadcast). */
  val FunnelRefBroadcastMaxTokens = 8000000L

  /** dd23 — the containment funnel END TO END: dd22's sketch screen feeds
    * the exact verify, composed as one operator (the dd16
    * bloom-before-dd08 pattern applied to containment — SCALE.md's
    * promised composition). Output: every (reference doc A, corpus doc B)
    * pair that SURVIVES the KMV sketch screen at ĉ ≥ [[SketchTau]], with
    * the screen estimate, the EXACT |A∩B| census and score, and a
    * `confirmed` verdict (exact ≥ [[ContainTau]]) on the row — the audit
    * report a decontamination pipeline acts on: confirmed rows are the
    * true inclusions, unconfirmed rows are the screen's measured
    * over-report (dd22 alone over-reports at the τ-gap by design; dd21
    * alone cannot run on dense-vocab corpora at full rate; on the test
    * corpus every survivor is random overlap, so the verdict split is
    * 0/320 at sf0.01 — the funnel proving the screen's FPs are FPs is
    * the non-vacuous content).
    *
    * Semantics contract (stated, not hidden): the funnel's recall is the
    * SCREEN's recall — a pair whose true containment ≥ [[ContainTau]] but
    * whose sketch estimate fell below [[SketchTau]] never reaches the
    * verify. That is the entire point of screening (the permissive
    * τ_screen = 0.5 against τ_exact = 0.7 gives the estimator its ~1/√k
    * error margin), and the spec pins a constructed leak so the trade is
    * visible, not accidental.
    *
    * Determinism: the screen is dd22's (engine-portable hashes, unrounded
    * threshold compare); the verify is dd19's exact integer census and
    * ONE IEEE division, threshold-compared unrounded on both engines,
    * 6dp-rounded on output only.
    *
    * Plan shape for 100 TB: corpus touched exactly TWICE — once by the
    * screen's linear sketch build (dd22's shape: per-doc window cut to k
    * rows map-side, bounded reference broadcast, native
    * [[graft.functions.KmvMergeCounts]] merge), once by the verify's
    * re-scan, where shingling runs ONLY on docs that survived (the
    * survivor semi-join lands on the scan side BEFORE the explode, so the
    * 100 TB corpus contributes text bytes only for the screen's hits).
    * The screen's survivor list persists (released by the session
    * cache-clear between queries, like dd21's staging table); ONE count
    * of it materializes the cache and picks broadcast vs shuffle for the
    * verify joins ([[FunnelBroadcastMaxSurvivors]]). The reference side's
    * token table is bounded by contract and always broadcasts. Nothing
    * corpus×corpus is ever formed: the verify's join volume is
    * Σ_{(A,B) surviving} |B|'s shingles matched against A's — the
    * output-sensitive floor for exact verification. */
  def containmentFunnelQuery(s: SparkSession, dir: String,
      broadcastMaxSurvivors: Long = FunnelBroadcastMaxSurvivors,
      refBroadcastMaxTokens: Long = FunnelRefBroadcastMaxTokens): DataFrame = {
    // SCREEN, two gates (round-12: the 100× rehearsal's k=64/τ=0.5 screen
    // passed 6.7M random-overlap survivors that the verify then spent
    // 400+ s refuting):
    //  1. dd22's permissive base gate, at the funnel's deeper
    //     k = FunnelScreenK (4× depth → half the estimator σ);
    //  2. a per-pair PRECISION gate in Jaccard space. Containment ≥ τ_exact
    //     forces Ĵ near j_tau = τ·n_A / (n_A + n_B − τ·n_A) — both sizes
    //     are exact and ride the screen row — and the KMV estimator's σ at
    //     j_tau is √(j_tau(1−j_tau)/k), so keeping est_j ≥ j_tau − Z·σ
    //     retains a true-τ pair w.p. Φ(Z) while cutting random-overlap
    //     survivors whose Ĵ sits far below any τ_exact-compatible value.
    //     This is size-AWARE: an extreme n_B/n_A ratio (tiny j_tau, where
    //     the sketch genuinely cannot resolve containment) relaxes the
    //     gate toward the base screen instead of silently losing recall.
    //     j_tau is clamped at 1.0: n_tok < (2τ−1)·n_ref makes the raw
    //     value exceed 1 — a pair whose candidate is too small to ever
    //     reach τ containment (c_max = n_tok/n_ref < τ). The clamp keeps
    //     sqrt's argument non-negative on BOTH engines (DuckDB errors on
    //     sqrt(<0); Spark would silently NaN→false) and the resulting
    //     est_j ≥ 1.0 gate correctly drops the τ-infeasible pair.
    val jTau = least(lit(1.0d),
      (lit(ContainTau) * col("n_ref").cast("double")) /
        (col("n_ref").cast("double") + col("n_tok").cast("double") -
          lit(ContainTau) * col("n_ref").cast("double")))
    // feasibleTau pushes the τ-infeasibility cut BEFORE the O(k) merge
    // (the clamp below remains as the gate's own guard for the same
    // condition — belt and braces, both engine-mirrored)
    val screened = sketchContainmentQuery(s, dir, FunnelScreenK, SketchTau,
        feasibleTau = Some(ContainTau))
      .withColumn("j_tau", jTau)
      .filter(col("est_jaccard") >= col("j_tau") - lit(FunnelScreenZ) *
        sqrt(col("j_tau") * (lit(1.0d) - col("j_tau")) /
          lit(FunnelScreenK.toDouble)))
      .drop("j_tau")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE driver action materializes the persisted screen AND feeds both
    // size guards (round-14; formerly the survivor count and the ref-token
    // total ran as two sequential jobs): a per-ref census is bounded by
    // the SketchRef contract (refs are an eval suite, not a corpus slice),
    // so collecting it yields the survivor count (Σ per-ref counts) and
    // the reference token mass (Σ n_ref over distinct refs) in one pass.
    val refCensus = screened.groupBy(col("ref_id"))
      .agg(count(lit(1)).as("c"), first(col("n_ref")).as("nr"))
      .collect()
    val bcast = refCensus.map(_.getLong(1)).sum <= broadcastMaxSurvivors
    def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    val refTokTotal = refCensus.map(_.getLong(2)).sum
    val refBcast = refTokTotal <= refBroadcastMaxTokens
    def refSide(df: DataFrame): DataFrame = if (refBcast) broadcast(df) else df
    if (!refBcast)
      log.warn(s"containmentFunnel: surviving reference docs carry " +
        s"$refTokTotal shingles (> $refBroadcastMaxTokens); verify joins " +
        "the reference tokens by shuffle instead of broadcast")
    val surv = screened.select(col("ref_id"), col("doc_id"),
      col("n_ref"), col("n_tok"), col("est_containment"))
    val docs = Tables.parallel(Tables.documents(s, dir))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    // shingle ONLY the docs the verify needs: semi-join before explode
    def toks(ids: DataFrame): DataFrame = docs
      .join(side(ids), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(graft.functions.CharShingles
          .charShingles(col("text"), ShingleSize)).as("w"))
    val aTok = toks(surv.select(col("ref_id").as("doc_id")).distinct())
      .select(col("doc_id").as("ref_id"), col("w"))
    val bTok = toks(surv.select(col("doc_id")).distinct())
    // exact |A∩B|: shingles are per-doc DISTINCT, so the pair-restricted
    // token equi-join's row count IS the intersection (dd21's fused move)
    val inter = bTok
      .join(side(surv.select(col("ref_id"), col("doc_id"))), Seq("doc_id"))
      .join(refSide(aTok), Seq("ref_id", "w"))
      .groupBy(col("ref_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    // TOTAL report over the survivors (left join: a survivor with zero
    // shared shingles — possible only via a sketch-hash collision — still
    // gets its verdict row); confirmed = the exact one-division compare.
    // inter is bounded by the survivor count, so it rides the same
    // broadcast guard (round-15): under the guard the report join plans
    // as BroadcastHashJoin LeftOuter instead of exchanging + sorting both
    // survivor-scale sides for a sort-merge join.
    surv.join(side(inter), Seq("ref_id", "doc_id"), "left")
      .withColumn("ns", coalesce(col("n_shared"), lit(0L)))
      .withColumn("cx",
        col("ns").cast("double") / col("n_ref").cast("double"))
      .select(col("ref_id"), col("doc_id"), col("n_ref"), col("n_tok"),
        col("ns").as("n_shared"), col("est_containment"),
        round(col("cx"), 6).as("containment"),
        (col("cx") >= ContainTau).as("confirmed"))
      .orderBy(col("ref_id"), col("doc_id"))
  }

  /** DuckDB SQL replicating [[containmentFunnelQuery]] exactly — the dd22
    * screen at the funnel's deeper k as a CTE, the per-pair precision
    * gate in Jaccard space (same IEEE expression order as the Spark
    * plan), then the exact token-intersection verify over its survivors
    * (the dd21-style count restricted to surviving pairs), same unrounded
    * threshold compares. */
  def containmentFunnelOracleSql(tau: Double = ContainTau): String = s"""
      WITH scr0 AS (${sketchContainmentOracleSql(k = FunnelScreenK,
        feasibleTau = Some(tau))}),
      scr AS (SELECT ref_id, doc_id, n_ref, n_tok, est_jaccard,
                     est_containment
              FROM (SELECT *,
                      least(1.0, ($tau * CAST(n_ref AS DOUBLE)) /
                        (CAST(n_ref AS DOUBLE) + CAST(n_tok AS DOUBLE)
                         - $tau * CAST(n_ref AS DOUBLE))) AS j_tau
                    FROM scr0) z
              WHERE est_jaccard >= j_tau - $FunnelScreenZ *
                sqrt(j_tau * (1.0 - j_tau) / ${FunnelScreenK.toDouble})),
      psh2 AS (SELECT doc_id, list_distinct(list_transform(
                 range(1, greatest(length(text) - ${ShingleSize - 2}, 2)),
                 i -> substr(text, CAST(i AS INT), $ShingleSize))) AS s
               FROM documents WHERE text IS NOT NULL),
      tok2 AS (SELECT doc_id, unnest(s) AS w FROM psh2),
      ex AS (SELECT s.ref_id, s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
             FROM scr s
               JOIN tok2 a ON a.doc_id = s.ref_id
               JOIN tok2 b ON b.doc_id = s.doc_id AND b.w = a.w
             GROUP BY 1, 2)
      SELECT s.ref_id, s.doc_id, s.n_ref, s.n_tok,
             coalesce(ex.n_shared, 0) AS n_shared,
             s.est_containment,
             round(CAST(coalesce(ex.n_shared, 0) AS DOUBLE)
                   / CAST(s.n_ref AS DOUBLE), 6) AS containment,
             (CAST(coalesce(ex.n_shared, 0) AS DOUBLE)
              / CAST(s.n_ref AS DOUBLE) >= $tau) AS confirmed
      FROM scr s LEFT JOIN ex
        ON s.ref_id = ex.ref_id AND s.doc_id = ex.doc_id
      ORDER BY s.ref_id, s.doc_id"""

  /** dd20 — near-dup threshold sweep (the tuning report behind picking a
    * dedup radius): for every simhash hamming radius 0..3, the pair count
    * and the count of documents touched by at least one pair at that
    * radius. One run answers "how aggressive does the dedup get as the
    * threshold loosens" — the density curve an operator reads BEFORE
    * committing a radius to dd04's production pass (radius 0 ≈ exact
    * fingerprint dups; each +1 admits looser matches).
    *
    * Determinism: everything is an integer census over dd04's
    * deterministic pair stream.
    *
    * Plan shape for 100 TB: the pair stream is computed ONCE by dd04's
    * banded equi-join (recall-exact for hamming ≤ 3 by pigeonhole), then
    * REDUCED before any radius logic touches it: pairs collapse to a
    * per-hamming histogram (≤ 4 rows — hamming is 0..3 by construction)
    * and docs collapse to a per-doc min-hamming then ITS histogram (also
    * ≤ 4 rows). The radius grid joins those two genuinely tiny aggregates
    * — a doc with min hamming h is "touched at radius r" iff h ≤ r, so
    * counting histogram mass below each radius equals the distinct-doc
    * count — and the broadcast side stays O(1) no matter how many pairs
    * the production corpus produces. No recomputation per threshold — the
    * whole point of sweeping on the pair stream instead of re-running
    * dedup. */
  def hammingSweepQuery(s: SparkSession, dir: String): DataFrame = {
    // (round-15 A/B, persist rejected: caching the unordered pair stream
    // for the two histogram consumers measured 2.28–2.30 s vs 2.20–2.33 s
    // unpersisted — no resolvable win. simhashPairs already persists its
    // docs/banded stages internally, so the duplicated tail (self-join +
    // hamming filter + distinct) is cheap, and the two histogram subtrees
    // are independent stages the scheduler overlaps; a cache barrier
    // would serialize them.)
    val p = simhashPairsUnordered(s, dir, HotBucketCap, adaptive = true)
    val radii = s.range(0, 4).select(col("id").as("radius"))
    // pair-scale work ends here: two map-side-combined histograms
    val hHist = p.groupBy(col("hamming")).agg(count(lit(1)).as("cnt"))
    val dHist = p
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc"),
        col("hamming"))
      .groupBy(col("doc")).agg(min(col("hamming")).as("min_h"))
      .groupBy(col("min_h")).agg(count(lit(1)).as("dcnt"))
    val np = radii.join(broadcast(hHist),
        col("hamming") <= col("radius"), "left")
      .groupBy(col("radius"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_pairs"))
    val nd = radii.join(broadcast(dHist),
        col("min_h") <= col("radius"), "left")
      .groupBy(col("radius"))
      .agg(coalesce(sum(col("dcnt")), lit(0L)).as("n_docs_with_dup"))
    np.join(nd, Seq("radius")).orderBy(col("radius"))
  }

  /** DuckDB SQL replicating [[hammingSweepQuery]] exactly — the radius
    * grid swept over the same brute-force pair stream the dd04 oracle
    * derives. */
  def hammingSweepOracleSql: String = s"""
      WITH sp AS ($simhashOracleSql),
      r AS (SELECT CAST(x AS BIGINT) AS radius
            FROM (VALUES (0), (1), (2), (3)) t(x)),
      d AS (SELECT doc_a AS doc, hamming FROM sp
            UNION ALL SELECT doc_b, hamming FROM sp),
      np AS (SELECT radius, CAST(count(hamming) AS BIGINT) AS n_pairs
             FROM r LEFT JOIN sp ON hamming <= radius GROUP BY radius),
      nd AS (SELECT radius, CAST(count(DISTINCT doc) AS BIGINT)
                      AS n_docs_with_dup
             FROM r LEFT JOIN d ON hamming <= radius GROUP BY radius)
      SELECT radius, n_pairs, n_docs_with_dup
      FROM np JOIN nd USING (radius) ORDER BY radius"""
}
