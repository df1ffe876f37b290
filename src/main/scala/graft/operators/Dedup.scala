package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
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
    * doc_id): linear in bucket size, and since hot buckets are by
    * construction sets of near-identical docs, the star still (a) connects
    * the whole group into one component for [[dupClusters]] and (b) marks
    * every non-min member as a duplicate for [[dedupApply]]. Pairs between
    * two non-min members of a hot bucket are the only ones not emitted from
    * that bucket (they may still surface via a colder band). The cap is far
    * above any bucket the test corpus produces, so the oracle-checked pair
    * set is unaffected; the guard exists for adversarial/production skew. */
  val HotBucketCap = 1024

  /** Skew guard for an LSH band self-join: splits band rows into
    * (cold rows, hot-bucket rows) by bucket population. The population count
    * is one narrow-column hash aggregate over the (already persisted) band
    * table; its result is tiny (one row per HOT bucket only), so checking it
    * on the driver costs one cheap job and lets us skip the guard joins
    * entirely in the overwhelmingly common no-skew case. */
  private def splitHotBuckets(
      bands: DataFrame, keys: Seq[String], cap: Int): (DataFrame, DataFrame, Long) = {
    val hot = bands.groupBy(keys.map(col): _*).count()
      .filter(col("count") > cap)
      .select(keys.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nHot = hot.count()
    if (nHot == 0L) {
      hot.unpersist(blocking = false)
      (bands, null, 0L)
    } else {
      // hot is one row per overloaded bucket — broadcastable unless the skew
      // is itself pathological, in which case fall back to a shuffle join.
      val hotSide = if (nHot <= 100000L) broadcast(hot) else hot
      val cold  = bands.join(hotSide, keys, "left_anti")
      val inHot = bands.join(hotSide, keys, "left_semi")
      (cold, inHot, nHot)
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
    * Pipeline: one-pass text→signature → 32 band hashes → explode →
    * equi-self-join on (band, bandhash) → distinct candidates → signature
    * agreement prefilter → exact Jaccard verification. With these parameters
    * recall at the 0.8 threshold is 1 - 5e-8, so the output equals
    * [[ngramJaccardPairs]] — which is exactly how the oracle checks it —
    * while the plan is equi-joins instead of a cross join. */
  def minhashLshPairs(s: SparkSession, dir: String): DataFrame = {
    // Signatures are computed in ONE pass over the text (no shingle arrays
    // materialized) and persisted — at cluster scale this is the "write
    // signatures to a staging table" step.
    val docs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"),
        graft.functions.MinHashFromText.minhashFromText(col("text"), ShingleSize, SigK).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val bands = docs
      .select(col("doc_id"),
        explode(Text.lshBands(col("sig"), SigK, Bands)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // hot-bucket skew guard: all-pairs only inside buckets below the cap;
    // oversized buckets emit linear star candidates instead (see HotBucketCap)
    val (cold, inHot, nHot) = splitHotBuckets(bands, Seq("band", "bh"), HotBucketCap)
    if (nHot > 0)
      log.warn(s"minhashLshPairs: $nHot LSH bucket(s) exceed $HotBucketCap members; " +
        "emitting star candidates (member vs bucket-min) for those buckets " +
        "instead of all-pairs — non-min/non-min pairs in hot buckets are dropped")

    // candidate pairs straight off the band collisions — deliberately NOT
    // distinct'd here: deduplicating 100s of thousands of raw collisions
    // costs a full shuffle, while the signature prefilter below is a cheap
    // broadcast-join + 128-long compare that cuts them to a handful first
    // (a pair colliding in several bands just re-runs the cheap compare)
    val coldPairs = cold.alias("x")
      .join(cold.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val candidates =
      if (nHot == 0L) coldPairs
      else {
        val starPairs = inHot
          .withColumn("min_id",
            min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("band"), col("bh"))))
          .filter(col("doc_id") > col("min_id"))
          .select(col("min_id").as("doc_a"), col("doc_id").as("doc_b"))
        coldPairs.unionByName(starPairs)
      }

    // cheap prefilter on signature agreement, then exact verification with
    // shingles computed only for the handful of surviving docs. The sig
    // table (doc_id + 128 longs) is explicitly broadcast: it is orders of
    // magnitude smaller than the un-distinct'd candidate stream. On a corpus
    // shard where it outgrows the broadcast budget, drop the hint and
    // distinct() the candidates first so the shuffle join carries the
    // deduplicated pair set.
    val prefiltered = candidates
      .join(broadcast(docs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))), "doc_a")
      .join(broadcast(docs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))), "doc_b")
      .filter(graft.functions.SigOverlap.sigOverlap(col("sig_a"), col("sig_b")) >= SigPrefilter)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // shingles are computed ONLY for docs that survived the prefilter —
    // verification cost scales with survivors, not with the corpus
    val neededIds = prefiltered
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val sh = Tables.documents(s, dir)
      .join(broadcast(neededIds), "doc_id")
      .select(col("doc_id"), graft.functions.CharShingles.charShingles(col("text"), ShingleSize).as("sh"))
      .withColumn("n", size(col("sh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prefiltered
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b")), "doc_b")
      .withColumn("jaccard",
        Text.jaccardWithSizes(col("sh_a"), col("sh_b"), col("n_a"), col("n_b")))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Transitive duplicate clusters from the LSH pair set, by iterative
    * min-label propagation (the scalable connected-components pattern:
    * each round is one shuffle join; rounds ~ cluster diameter, which for
    * near-dup graphs is tiny). Output: (doc_id, cluster_id=min id of the
    * component) for every doc that appears in at least one pair. */
  def dupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshPairs(s, dir).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

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
      if (iter % 5 == 0) labels = labels.localCheckpoint()
    }
    // silent non-convergence would report one component as several clusters
    require(changed == 0,
      s"dupClusters did not converge after $iter rounds (component diameter > $iter?)")
    labels.select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Applied dedup (greedy keep-first): the retained corpus after dropping
    * the higher-id member of every detected near-dup pair. */
  def dedupApply(s: SparkSession, dir: String): DataFrame = {
    val drop = minhashLshPairs(s, dir).select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(s, dir)
      .join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** SimHash fingerprints + near-pairs at hamming distance <= 3 via 15-bit
    * band equi-join. Output: candidate pairs with their hamming distance.
    *
    * Uses the PORTABLE 60-bit md5-based fingerprint ([[Md5SimHash60]]):
    * its arithmetic is expressible in DuckDB SQL, so the whole query —
    * fingerprint, banding, hamming cut — is oracle-checked end to end
    * (the xxhash-based [[graft.functions.SimHash64]] stays available where
    * cross-engine parity is not needed). */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
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
    // drops thousands of near-identical fingerprints into one 16-bit bucket
    val (cold, inHot, nHot) = splitHotBuckets(banded, Seq("band", "bandval"), HotBucketCap)
    if (nHot > 0)
      log.warn(s"simhashPairs: $nHot simhash band bucket(s) exceed $HotBucketCap members; " +
        "emitting star candidates for those buckets instead of all-pairs")

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
        coldPairs.unionByName(starPairs)
      }

    // filter BEFORE distinct: the hamming cut is a codegen'd bit_count over
    // each raw collision row, so the distinct shuffle carries only surviving
    // pairs instead of every band collision
    pairs
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
