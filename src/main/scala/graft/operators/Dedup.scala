package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text
import graft.functions.SimHash64.simhash64

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

  val ShingleSize  = 5
  val SigK         = 128
  val Bands        = 32   // 32 bands x 4 rows: P(candidate | j=0.8) ~ 1 - 5e-8
  val JaccardThreshold = 0.8

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

    // candidate pairs straight off the band collisions — deliberately NOT
    // distinct'd here: deduplicating 100s of thousands of raw collisions
    // costs a full shuffle, while the signature prefilter below is a cheap
    // broadcast-join + 128-long compare that cuts them to a handful first
    // (a pair colliding in several bands just re-runs the cheap compare)
    val candidates = bands.alias("x")
      .join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))

    // cheap prefilter on signature agreement, then exact verification with
    // shingles computed only for the handful of surviving docs
    val prefiltered = candidates
      .join(docs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
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

  /** SimHash fingerprints + near-pairs at hamming distance <= 3 via 16-bit
    * band equi-join. Output: candidate pairs with their hamming distance. */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(Tables.documents(s, dir))
      .select(col("doc_id"),
        simhash64(split(Text.normText(col("text")), " ")).as("sh64"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // four 16-bit bands; hamming <= 3 implies at least one band matches
    val banded = docs.select(col("doc_id"), col("sh64"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh64"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandval")

    banded.alias("x")
      .join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.bandval") === col("y.bandval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sh64").bitwiseXOR(col("y.sh64"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
