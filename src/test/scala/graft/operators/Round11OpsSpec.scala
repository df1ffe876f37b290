package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

/** Round-11 checks for dd23 (the composed containment funnel: dd22 sketch
  * screen → exact verify confined to survivors). Three semantics are
  * pinned by construction, independent of both the Spark plan and the
  * DuckDB oracle SQL:
  *   - the funnel equals a driver-side recompute (screen estimator +
  *     exact intersection) on the sf0.001 corpus and on a crafted one;
  *   - an OVER-REPORT (screen-pass, exact-fail) is pruned by the verify —
  *     the reason the funnel exists over dd22 alone;
  *   - a constructed screen LEAK (true containment ≥ τ_exact whose sketch
  *     estimate fell under τ_screen) never reaches the verify — the
  *     funnel's recall IS the screen's recall, stated in the scaladoc and
  *     made visible here rather than discovered in production.
  */
class Round11OpsSpec extends AnyFunSuite {
  import spark.implicits._

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(
      t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60(w: String): Long =
    java.lang.Long.parseLong(md5hex(w).substring(0, 15), 16)

  private def shinglesOf(t: String): Set[String] =
    if (t.length < Dedup.ShingleSize) Set(t)
    else t.sliding(Dedup.ShingleSize).toSet

  private def sketchOf(sh: Set[String]): Seq[Long] =
    sh.toSeq.map(w => (hash60(w), w)).sortBy(identity)
      .take(Dedup.SketchK).map(_._1).sorted

  private def roundAt(x: Double, dp: Int): Double =
    BigDecimal.valueOf(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue

  /** The dd22 screen estimate for a (ref, doc) pair — the merge-and-recut
    * KMV estimator, reimplemented independently. */
  private def screenEst(a: Set[String], b: Set[String]): Double = {
    val (ska, skb) = (sketchOf(a), sketchOf(b))
    val merged = (ska ++ skb).distinct.sorted.take(Dedup.SketchK)
    val inter = merged.count(x => ska.contains(x) && skb.contains(x))
    val j = inter.toDouble / merged.size.toDouble
    (j * (a.size + b.size).toDouble) / ((1.0d + j) * a.size.toDouble)
  }

  private type Row8 = (Long, Long, Long, Long, Long, Double, Double, Boolean)

  /** Independent funnel recompute: the screen (unrounded τ compare), then
    * the exact set intersection, one division, and the confirmed verdict —
    * EVERY survivor reported, confirmed or not. */
  private def funnelRecompute(docs: Seq[(Long, String)]): Seq[Row8] = {
    val sh = docs.map { case (id, t) => id -> shinglesOf(t) }.toMap
    val refs = docs.map(_._1).filter(id =>
      id % Dedup.SketchRefMod == 0 && id <= Dedup.SketchRefMaxId &&
        sh(id).size >= Dedup.ContainMinTokens)
    (for {
      ra <- refs; (b, _) <- docs
      if b != ra
      est = screenEst(sh(ra), sh(b))
      if est >= Dedup.SketchTau
      nShared = (sh(ra) intersect sh(b)).size.toLong
      cx = nShared.toDouble / sh(ra).size.toDouble
    } yield (ra, b, sh(ra).size.toLong, sh(b).size.toLong, nShared,
      roundAt(est, 6), roundAt(cx, 6), cx >= Dedup.ContainTau))
      .sortBy(p => (p._1, p._2))
  }

  private def funnelRun(d: String, bcastMax: Long =
      Dedup.FunnelBroadcastMaxSurvivors): Seq[Row8] =
    Dedup.containmentFunnelQuery(spark, d, bcastMax).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7))).toSeq

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dd23").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dd23: funnel recomputes from a driver-side screen+verify (sf0.001)") {
    val corpus = graft.core.Tables.documents(spark, graft.SparkTestSession.sf0001)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => Option(r.getString(1)).map(t => (r.getLong(0), t))).toSeq
    assert(funnelRun(graft.SparkTestSession.sf0001) == funnelRecompute(corpus))
  }

  // ---- crafted corpus: exact hit, over-report pruned, screen leak absent

  /** Search a numeric suffix until the predicate on the crafted text
    * holds; bounded so an impossible predicate fails loudly. */
  private def craft(mk: Int => String)(p: String => Boolean): String =
    Iterator.from(0).take(20000).map(mk).find(p)
      .getOrElse(fail("crafting search exhausted"))

  private lazy val crafted: Seq[(Long, String)] = {
    val exactRef = "a reference benchmark passage about catalyst optimizer " +
      "rules and vectorized parquet readers used for decontamination"
    // over-report: ~60% shared shingle mass — screen-pass (est ≥ 0.5),
    // exact-fail (c < 0.7); the suffix search absorbs sketch noise
    val shared = "common boilerplate about shuffle partitions broadcast " +
      "joins and adaptive query execution shared between both documents"
    val oRef = shared + " plus reference-only commentary on predicate " +
      "pushdown and column pruning through scans"
    // the variant marker is woven through the WHOLE candidate-only text so
    // each draw resamples the candidate's sketch (a tail-only marker would
    // barely move the bottom-k and the search could never flip)
    val oDoc = craft(i => shared + (1 to 3).map(k =>
      s" candidate note $k salt$i on skewed keys salting and coalescing " +
        s"small partitions draw$i").mkString) { t =>
      val (a, b) = (shinglesOf(oRef), shinglesOf(t))
      val est = screenEst(a, b)
      val cx = (a intersect b).size.toDouble / a.size.toDouble
      est >= Dedup.SketchTau && cx < Dedup.ContainTau
    }
    // screen leak: a SMALL ref quoted whole inside a BIG container — true
    // containment is exactly 1.0, yet the estimate is 0 once NONE of the
    // ref's shingle hashes land in the container's bottom-k sketch. Two
    // stages, because one is not enough: (1) craft a ref whose MIN
    // shingle hash sits above the ~0.01 quantile (a fixed unlucky-low
    // min hash would ride every container's bottom-k forever — measured
    // before this construction), then (2) craft a container large enough
    // (~13k distinct shingles of hash-derived filler) that >k of its own
    // hashes undercut that min. This is the documented recall trade of
    // screening, pinned deliberately.
    val leakRef = craft(i => "reference " + md5hex(s"ref-$i") +
      " watermark state page") { t =>
      val sh = shinglesOf(t)
      sh.size >= Dedup.ContainMinTokens &&
        sh.map(hash60).min.toDouble / math.pow(2, 60) >= 0.01
    }
    val leakDoc = craft(i => leakRef + " " +
      (0 until 400).map(k => md5hex(s"$i-$k")).mkString(" ")) {
      t => screenEst(shinglesOf(leakRef), shinglesOf(t)) < Dedup.SketchTau
    }
    Seq(0L -> exactRef, 1L -> exactRef, 97L -> oRef, 2L -> oDoc,
      194L -> leakRef, 3L -> leakDoc,
      4L -> ("unrelated material on kafka consumer groups idempotent " +
        "producers and transactional offsets with no shingle overlap"))
  }

  test("dd23: exact copy confirms at 1.0; over-report gets a false verdict; leak absent") {
    val got = funnelRun(writeDocs(crafted))
    assert(got == funnelRecompute(crafted))
    val byPair = got.map(p => (p._1, p._2) -> p).toMap
    // the exact copy of ref 0 verifies at exactly 1.0 on both scores
    val hit = byPair((0L, 1L))
    assert(hit._6 == 1.0 && hit._7 == 1.0 && hit._8)
    // over-report: the screen passed it, the exact verify REFUTES it —
    // the row is present with confirmed = false (the audit-report value)
    val o = byPair((97L, 2L))
    assert(o._6 >= Dedup.SketchTau && o._7 < Dedup.ContainTau && !o._8)
    // screen leak: TRUE containment is 1.0 (every ref shingle is in the
    // container), yet the pair is absent — the funnel's recall is the
    // screen's, by contract
    val shL = shinglesOf(crafted.toMap.apply(194L))
    val shC = shinglesOf(crafted.toMap.apply(3L))
    assert((shL intersect shC).size == shL.size)
    assert(!byPair.contains((194L, 3L)))
  }

  test("dd23: broadcast and shuffle verify branches agree row for row") {
    val d = writeDocs(crafted)
    assert(funnelRun(d, bcastMax = 0L) ==
      funnelRun(d, bcastMax = Dedup.FunnelBroadcastMaxSurvivors))
  }
}
