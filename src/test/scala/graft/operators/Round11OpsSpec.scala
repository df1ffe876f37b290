package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

/** Round-11/12 checks for dd23 (the composed containment funnel: dd22
  * sketch screen at the funnel's deeper k, the round-12 per-pair
  * precision gate, then exact verify confined to survivors). Pinned by
  * construction, independent of both the Spark plan and the DuckDB
  * oracle SQL:
  *   - the funnel equals a driver-side recompute (screen estimator +
  *     precision gate + exact intersection) on the sf0.001 corpus and on
  *     a crafted one;
  *   - an OVER-REPORT (screen-pass, exact-fail) is pruned by the verify —
  *     the reason the funnel exists over dd22 alone;
  *   - a constructed screen LEAK (true containment ≥ τ_exact whose sketch
  *     estimate fell under τ_screen) never reaches the verify — the
  *     funnel's recall IS the screen's recall, stated in the scaladoc and
  *     made visible here rather than discovered in production;
  *   - round-12 RETENTION: a constructed TRUE inclusion that the screen
  *     sees survives the tightened precision gate and confirms — the
  *     gate's 10× survivor cut spends no recall on resolvable pairs.
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

  /** Bottom-k sketch at the FUNNEL's depth (round-12: k = FunnelScreenK,
    * not dd22's standalone SketchK). */
  private def sketchOf(sh: Set[String]): Seq[Long] =
    sh.toSeq.map(w => (hash60(w), w)).sortBy(identity)
      .take(Dedup.FunnelScreenK).map(_._1).sorted

  private def roundAt(x: Double, dp: Int): Double =
    BigDecimal.valueOf(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue

  /** The screen estimates for a (ref, doc) pair — the merge-and-recut
    * KMV estimator at the funnel's k, reimplemented independently.
    * Returns (Ĵ, ĉ). */
  private def screenEst(a: Set[String], b: Set[String]): (Double, Double) = {
    val (ska, skb) = (sketchOf(a), sketchOf(b))
    val merged = (ska ++ skb).distinct.sorted.take(Dedup.FunnelScreenK)
    val inter = merged.count(x => ska.contains(x) && skb.contains(x))
    val j = inter.toDouble / merged.size.toDouble
    val c = (j * (a.size + b.size).toDouble) /
      ((1.0d + j) * a.size.toDouble)
    (j, c)
  }

  /** The round-12 precision gate, recomputed independently: keep iff the
    * ROUNDED Ĵ clears j_tau − Z·σ(j_tau) for this pair's exact sizes. */
  private def passesGate(j: Double, nRef: Long, nTok: Long): Boolean = {
    val t = Dedup.ContainTau
    val jTau = math.min(1.0,
      (t * nRef.toDouble) / (nRef.toDouble + nTok.toDouble - t * nRef.toDouble))
    roundAt(j, 6) >= jTau - Dedup.FunnelScreenZ *
      math.sqrt(jTau * (1.0d - jTau) / Dedup.FunnelScreenK.toDouble)
  }

  private type Row8 = (Long, Long, Long, Long, Long, Double, Double, Boolean)

  /** Independent funnel recompute: the two-gate screen (unrounded base τ
    * compare, rounded-Ĵ precision gate), then the exact set intersection,
    * one division, and the confirmed verdict — EVERY survivor reported,
    * confirmed or not. */
  private def funnelRecompute(docs: Seq[(Long, String)]): Seq[Row8] = {
    val sh = docs.map { case (id, t) => id -> shinglesOf(t) }.toMap
    val refs = docs.map(_._1).filter(id =>
      id % Dedup.SketchRefMod == 0 && id <= Dedup.SketchRefMaxId &&
        sh(id).size >= Dedup.ContainMinTokens)
    (for {
      ra <- refs; (b, _) <- docs
      if b != ra
      // the round-12 feasibility pre-cut (runs BEFORE the merge in the
      // operator): candidate too small to ever reach ContainTau
      if sh(b).size.toDouble >=
        (2.0 * Dedup.ContainTau - 1.0) * sh(ra).size.toDouble
      (estJ, estC) = screenEst(sh(ra), sh(b))
      if estC >= Dedup.SketchTau
      if passesGate(estJ, sh(ra).size.toLong, sh(b).size.toLong)
      nShared = (sh(ra) intersect sh(b)).size.toLong
      cx = nShared.toDouble / sh(ra).size.toDouble
    } yield (ra, b, sh(ra).size.toLong, sh(b).size.toLong, nShared,
      roundAt(estC, 6), roundAt(cx, 6), cx >= Dedup.ContainTau))
      .sortBy(p => (p._1, p._2))
  }

  private def funnelRun(d: String, bcastMax: Long =
      Dedup.FunnelBroadcastMaxSurvivors,
      refMax: Long = Dedup.FunnelRefBroadcastMaxTokens): Seq[Row8] =
    Dedup.containmentFunnelQuery(spark, d, bcastMax, refMax).collect()
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

  test("dd23: funnel recomputes from a driver-side screen+gate+verify (sf0.001)") {
    val corpus = graft.core.Tables.documents(spark, graft.SparkTestSession.sf0001)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => Option(r.getString(1)).map(t => (r.getLong(0), t))).toSeq
    assert(funnelRun(graft.SparkTestSession.sf0001) == funnelRecompute(corpus))
  }

  // ---- crafted corpus: exact hit, over-report pruned, screen leak
  // absent, true inclusion RETAINED through the round-12 gate

  /** Search a numeric suffix until the predicate on the crafted text
    * holds; bounded so an impossible predicate fails loudly. */
  private def craft(mk: Int => String)(p: String => Boolean): String =
    Iterator.from(0).take(20000).map(mk).find(p)
      .getOrElse(fail("crafting search exhausted"))

  private lazy val crafted: Seq[(Long, String)] = {
    val exactRef = "a reference benchmark passage about catalyst optimizer " +
      "rules and vectorized parquet readers used for decontamination"
    // over-report: high shared shingle mass — passes BOTH screen gates
    // (base est ≥ 0.5 and the per-pair precision gate), yet exact-fails
    // (c < 0.7); the suffix search absorbs sketch noise
    val shared = "common boilerplate about shuffle partitions broadcast " +
      "joins and adaptive query execution shared between both documents " +
      "covering dynamic partition pruning and runtime filter pushdown"
    // reference-only tail sized so true containment lands ~0.65: inside
    // the (precision gate, τ_exact) window — screen-pass, exact-fail
    val oRef = shared + " plus reference-only commentary on predicate " +
      "pushdown and column pruning through parquet scan nodes"
    // the variant marker is woven through the WHOLE candidate-only text so
    // each draw resamples the candidate's sketch (a tail-only marker would
    // barely move the bottom-k and the search could never flip)
    val oDoc = craft(i => shared + (1 to 2).map(k =>
      s" candidate note $k salt$i on skewed keys salting and coalescing " +
        s"small partitions draw$i").mkString) { t =>
      val (a, b) = (shinglesOf(oRef), shinglesOf(t))
      val (estJ, estC) = screenEst(a, b)
      val cx = (a intersect b).size.toDouble / a.size.toDouble
      estC >= Dedup.SketchTau &&
        passesGate(estJ, a.size.toLong, b.size.toLong) &&
        cx < Dedup.ContainTau
    }
    // screen leak: a SMALL ref quoted whole inside a BIG container — true
    // containment is exactly 1.0, yet the estimate is 0 once NONE of the
    // ref's shingle hashes land in the container's bottom-k sketch. Two
    // stages, because one is not enough: (1) craft a ref whose MIN
    // shingle hash sits above the ~0.01 quantile (a fixed unlucky-low
    // min hash would ride every container's bottom-k forever — measured
    // before this construction), then (2) craft a container large enough
    // (~40k distinct shingles of hash-derived filler, sized for the
    // funnel's k = FunnelScreenK bottom-k) that >k of its own hashes
    // undercut that min. This is the documented recall trade of
    // screening, pinned deliberately.
    val leakRef = craft(i => "reference " + md5hex(s"ref-$i") +
      " watermark state page") { t =>
      val sh = shinglesOf(t)
      sh.size >= Dedup.ContainMinTokens &&
        sh.map(hash60).min.toDouble / math.pow(2, 60) >= 0.01
    }
    val leakDoc = craft(i => leakRef + " " +
      (0 until 1300).map(k => md5hex(s"$i-$k")).mkString(" ")) {
      t => screenEst(shinglesOf(leakRef), shinglesOf(t))._2 < Dedup.SketchTau
    }
    // round-12 retention: a true inclusion the screen CAN resolve — the
    // whole ref quoted inside a moderate container (c = 1.0, comparable
    // sizes) — must pass the tightened gate and confirm
    val keepRef = "retention reference passage on watermarked streaming " +
      "aggregation state stores and exactly once transactional sinks " +
      "with idempotent producer sequencing across broker epochs"
    val keepDoc = keepRef + " surrounded by a moderate amount of novel " +
      "commentary discussing checkpoint recovery and changelog compaction"
    Seq(0L -> exactRef, 1L -> exactRef, 97L -> oRef, 2L -> oDoc,
      194L -> leakRef, 3L -> leakDoc, 291L -> keepRef, 5L -> keepDoc,
      4L -> ("unrelated material on kafka consumer groups idempotent " +
        "producers and transactional offsets with no shingle overlap"))
  }

  test("dd23: exact copy confirms at 1.0; over-report gets a false verdict; leak absent; true inclusion retained (round-12 gate)") {
    val got = funnelRun(writeDocs(crafted))
    assert(got == funnelRecompute(crafted))
    val byPair = got.map(p => (p._1, p._2) -> p).toMap
    // the exact copy of ref 0 verifies at exactly 1.0 on both scores
    val hit = byPair((0L, 1L))
    assert(hit._6 == 1.0 && hit._7 == 1.0 && hit._8)
    // over-report: BOTH screen gates passed it, the exact verify REFUTES
    // it — the row is present with confirmed = false (the audit value)
    val o = byPair((97L, 2L))
    assert(o._6 >= Dedup.SketchTau && o._7 < Dedup.ContainTau && !o._8)
    // screen leak: TRUE containment is 1.0 (every ref shingle is in the
    // container), yet the pair is absent — the funnel's recall is the
    // screen's, by contract
    val shL = shinglesOf(crafted.toMap.apply(194L))
    val shC = shinglesOf(crafted.toMap.apply(3L))
    assert((shL intersect shC).size == shL.size)
    assert(!byPair.contains((194L, 3L)))
    // round-12 retention: the resolvable true inclusion SURVIVES the
    // tightened precision gate and confirms — tightening spent no recall
    // on pairs the sketch can actually resolve
    val kept = byPair((291L, 5L))
    assert(kept._7 == 1.0 && kept._8,
      s"true inclusion lost or unconfirmed at the round-12 gate: $kept")
  }

  test("dd23: broadcast and shuffle verify branches agree row for row") {
    val d = writeDocs(crafted)
    assert(funnelRun(d, bcastMax = 0L) ==
      funnelRun(d, bcastMax = Dedup.FunnelBroadcastMaxSurvivors))
    // the REF-token broadcast guard (round-11 advice) must also be
    // plan-only: forcing the shuffle route changes no rows
    assert(funnelRun(d, refMax = 0L) == funnelRun(d))
  }
}
