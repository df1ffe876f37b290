package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.functions.SimHash64.simhash64

class DedupSpec extends AnyFunSuite {

  test("minhash-LSH pairs == brute-force jaccard pairs (exact recall at 0.8)") {
    val brute = Dedup.ngramJaccardPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus should contain injected near-dup pairs")
    assert(lsh == brute)
  }

  test("minhash-LSH jaccard values equal brute-force values") {
    val brute = Dedup.ngramJaccardPairs(spark, sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Dedup.minhashLshPairs(spark, sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(lsh == brute)
  }

  test("simhash: identical token arrays hash identically; near texts are near") {
    import spark.implicits._
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog and runs far away home"),
      ("b", "the quick brown fox jumps over the lazy dog and runs far away house"),
      ("c", "completely different words about spark catalyst optimizer and shuffles")
    ).toDF("id", "text")
      .withColumn("sh", simhash64(split(col("text"), " ")))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(m("a"), m("b")) < hamming(m("a"), m("c")))
    // determinism across evaluations
    val again = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m == again)
  }

  test("simhash pair query finds near-dup docs and only plausible ones") {
    val pairs = Dedup.simhashPairs(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getLong(2) <= 3))
    // SimHash measures bag-of-words similarity (order-free), so on a
    // shared-vocabulary corpus it legitimately flags some pairs the
    // char-shingle jaccard doesn't. Assert high precision, not identity.
    val trueDups = Dedup.ngramJaccardPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sPairs = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val precision = (sPairs & trueDups).size.toDouble / sPairs.size
    info(s"simhash precision vs char-jaccard truth = $precision (${sPairs.size} pairs)")
    assert(precision >= 0.5, s"simhash precision too low: $precision")
  }

  test("hot-bucket guard: boilerplate corpus (>cap identical docs) stays linear") {
    import spark.implicits._
    // 1.2k identical docs — every LSH bucket and every simhash band bucket
    // holds all of them, far above HotBucketCap, so the all-pairs self-join
    // would be ~700k pairs per band on one reducer. The guard must switch to
    // star candidates and still (a) finish, (b) mark every non-min copy as a
    // duplicate of the min, and (c) keep finding SMALL-bucket pairs all-pairs.
    val boiler = "this is the standard legal boilerplate paragraph that appears " +
      "verbatim at the bottom of every scraped page in the corpus for compliance"
    val nearA = "an entirely different document about catalyst optimizer internals " +
      "and the adaptive query execution framework that spark uses for replanning"
    val nearB = "an entirely different document about catalyst optimizer internals " +
      "and the adaptive query execution framework that spark uses for replannings"
    val unrelated = "completely unrelated text mentioning neither boilerplate nor spark"
    // an exact-duplicate pair with only TWO copies: far below the cap, so it
    // must flow through the untouched all-pairs path of BOTH algorithms
    val dupX = "a rare duplicated page about tungsten code generation and whole " +
      "stage compilation of physical operators into a single java function"
    val n = Dedup.HotBucketCap + 176
    val rows = (0 until n).map(i => (i.toLong, boiler)) ++
      Seq((9001L, nearA), (9002L, nearB), (9003L, unrelated),
        (9011L, dupX), (9012L, dupX))
    val dir = java.nio.file.Files.createTempDirectory("graft_hot").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val lsh = Dedup.minhashLshPairs(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // star edges: every boilerplate copy pairs with the bucket min (doc 0)
    assert((1 until n).forall(i => lsh.contains((0L, i.toLong))),
      "every boilerplate copy must be linked to the min doc")
    // small-bucket pairs still come from the exact all-pairs path
    assert(lsh.contains((9001L, 9002L)))
    assert(lsh.contains((9011L, 9012L)))
    assert(!lsh.exists { case (a, b) => a == 9003L || b == 9003L })

    val sim = Dedup.simhashPairs(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((1 until n).forall(i => sim.contains((0L, i.toLong))))
    // nearA/nearB differ by one TOKEN — enough to flip >3 simhash bits, so
    // only the exact-duplicate small bucket is asserted on the simhash side
    assert(sim.contains((9011L, 9012L)))
    assert(!sim.exists { case (a, b) => a == 9003L || b == 9003L })
  }

  test("hot-bucket star approximation contract: subset of exact, h0 docs recovered") {
    // cap=2 makes nearly every band bucket of the real corpus "hot", forcing
    // the star + identical-fingerprint path everywhere. The contract: the
    // guarded output never invents a pair (recorded hamming is the true
    // hamming, so guarded <= exact), and every doc belonging to an exact
    // hamming-0 pair still appears in a hamming-0 pair (identical-fingerprint
    // recovery), keeping dedupApply/dupClusters semantics intact.
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = pairs(Dedup.simhashPairs(spark, sf0001))
    val guarded = pairs(Dedup.simhashPairs(spark, sf0001, 2))
    assert(guarded.subsetOf(exact), "guard must never emit a false pair")
    val exactH0Docs = exact.filter(_._3 == 0L).flatMap(p => Seq(p._1, p._2))
    val guardedH0Docs = guarded.filter(_._3 == 0L).flatMap(p => Seq(p._1, p._2))
    assert(exactH0Docs.subsetOf(guardedH0Docs),
      "every identical-fingerprint doc must survive the guard")
  }

  test("exact dedup groups every doc exactly once") {
    val total = Dedup.exactDedup(spark, sf0001)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    val docs = graft.core.Tables.documents(spark, sf0001).count()
    assert(total == docs)
  }

  test("adaptive hot-bucket cap: default path is bit-identical to the fixed " +
    "ceiling on the test corpus (census far under the pair budget)") {
    // the round-11 contract: making the cap duplication-adaptive must not
    // change a single emitted pair on the corpora the oracle checks —
    // measured census: sf0.01 has NO bucket over the 64 floor; sf0.1's
    // over-floor candidate mass is 263k vs the >=1M budget
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val adaptive = rows(Dedup.minhashLshPairs(spark, sf0001))
    val fixed = rows(Dedup.minhashLshPairsCapped(spark, sf0001, Dedup.HotBucketCap))
    assert(adaptive == fixed)
  }

  test("adaptive hot-bucket cap engages at synthetic 100x near-copy " +
    "duplication under DEFAULT config and keeps every copy group connected") {
    import spark.implicits._
    // 100x copymark amplification of 40 long documents (the Stress recipe
    // at test scale): near-copies survive md5 canonicalization, so the
    // bucket census is the ONLY signal of duplication — exactly the regime
    // where the fixed cap=1024 died at 100x (SCALE.md ENOSPC kill). Long
    // texts keep copy-vs-copy Jaccard >= 0.8 so the pairs are true dups.
    val base = graft.core.Tables.documents(spark, sf0001)
      .filter(length(col("text")) > 500)
      .orderBy(col("doc_id")).limit(40)
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
      .collect()
    assert(base.length == 40, "corpus must have 40 long docs for this test")
    val span = base.map(_.getLong(0)).max + 1
    val copies = 100
    val amplified = for (r <- base.toSeq; i <- 0 until copies) yield
      (r.getLong(0) + i * span, r.getString(1) + s" copymark$i",
        r.getString(2), r.getString(3))
    val dir = java.nio.file.Files.createTempDirectory("graft_dd_adaptive").toString
    amplified.toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // DEFAULT config — no manual cap argument anywhere; the observer only
    // records the cap the operator derived for the non-vacuity assert
    var capSeen = -1
    val pairs = Dedup.minhashLshPairsTracked(spark, dir,
        capObserver = capSeen = _)._1
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // non-vacuity: the census must have pushed the effective cap BELOW the
    // ceiling (i.e. the star fallback actually engaged for the inflated
    // buckets) — without this the connectivity assert would pass vacuously
    // on the exact all-pairs path. (Output VOLUME is no proxy: dropped
    // hot-bucket pairs legitimately resurface via colder bands.)
    assert(capSeen >= Dedup.HotBucketCapFloor && capSeen < Dedup.HotBucketCap,
      s"adaptive cap $capSeen did not engage (ceiling ${Dedup.HotBucketCap})")
    assert(pairs.nonEmpty)

    // connectivity: every one of the 100 copies of a base doc must land in
    // the same component (the dupClusters/dedupApply guarantee the star
    // contract preserves)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    pairs.foreach { case (a, b) => union(a, b) }
    for (r <- base) {
      val groupIds = (0 until copies).map(i => r.getLong(0) + i * span)
      val comps = groupIds.map(find).distinct
      assert(comps.size == 1,
        s"copy group of base doc ${r.getLong(0)} split into ${comps.size} components")
    }
  }

  test("clusterLabels hybrid: driver union-find == distributed propagation") {
    val pairs = Dedup.minhashLshPairsTracked(spark, sf0001)._1
      .select(col("doc_a"), col("doc_b")).persist()
    assert(pairs.count() > 0)
    val local = Dedup.localLabels(spark, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = Dedup.distributedLabels(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local == dist, "both CC paths produce identical labels")
    pairs.unpersist()
  }
}
