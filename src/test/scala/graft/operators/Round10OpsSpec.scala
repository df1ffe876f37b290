package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

/** Round-10 checks for dd21 (sampled containment), closing the gap the
  * round-9 verdict named: the sf0.01 oracle gate matched on only 3 rows,
  * leaving the sample-atomicity (within-group 1.0) branch and the md5
  * "0a"/"0b" boundary unexercised. A crafted corpus straddles the sample
  * gate with exact-duplicate groups on BOTH sides of the boundary, and a
  * driver-side brute-force recompute (independent of the Spark plan and
  * of the DuckDB oracle SQL) pins the full semantics. */
class Round10OpsSpec extends AnyFunSuite {
  import spark.implicits._

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(
      t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def sampled(t: String): Boolean =
    md5hex(t).substring(0, 2) <= Dedup.ContainSampleHexMax

  /** Deterministically search a numeric suffix until md5(text) lands in
    * the wanted sample band ("0a"-or-below vs strictly above). */
  private def craft(base: String, wantSampled: Boolean): String =
    Iterator.from(0).map(i => s"$base variant $i")
      .find(t => sampled(t) == wantSampled).get

  private def shinglesOf(t: String): Set[String] =
    if (t.length < Dedup.ShingleSize) Set(t)
    else t.sliding(Dedup.ShingleSize).toSet

  private def roundAt(x: Double, dp: Int): Double =
    BigDecimal.valueOf(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue

  // crafted corpus: two exact-duplicate groups straddling the md5 sample
  // boundary, one asymmetric inclusion with a SAMPLED contained side and
  // an UNSAMPLED container, one unsampled-contained inclusion (must not
  // surface), and a sampled short doc under the token floor
  private lazy val (dir, docs) = {
    val g1 = craft("the quick brown fox jumps over the lazy dog and then " +
      "naps in the warm afternoon sun beside the river", wantSampled = true)
    val g2 = craft("an entirely different story about compilers lowering " +
      "relational plans into vectorized loops over columnar batches",
      wantSampled = false)
    val contained = craft("a sampled page quoting spark catalyst rules for " +
      "predicate pushdown and column pruning across scans", wantSampled = true)
    // container = contained text plus a short suffix: shingle containment of
    // the contained side stays ≥ τ while the container's own containment in
    // the contained doc falls below τ (and it is unsampled anyway)
    val container = {
      val c = contained + " with a long stretch of extra commentary " +
        "appended at the end so that the container is big enough that its " +
        "own shingles are nowhere near contained in the smaller quoted page"
      assert(!sampled(c)); c
    }
    val revContained = craft("an unsampled page describing shuffle hash " +
      "joins and sort merge joins and broadcast variants", wantSampled = false)
    val revContainer = {
      val c = revContained + " padded with a comparably long unsampled " +
        "trailing clause carrying plenty of shingles of its own so the " +
        "reverse direction cannot sneak past the containment threshold"
      assert(!sampled(c)); c
    }
    val short = craft("tiny doc", wantSampled = true)
    assert(shinglesOf(short).size < Dedup.ContainMinTokens)
    val sh = shinglesOf(contained); val shB = shinglesOf(container)
    assert((sh & shB).size.toDouble / sh.size >= Dedup.ContainTau)
    assert((sh & shB).size.toDouble / shB.size < Dedup.ContainTau)

    val rows: Seq[(Long, String)] = Seq(
      1L -> g1, 2L -> g1, 3L -> g1,
      4L -> g2, 5L -> g2, 6L -> g2,
      10L -> contained, 11L -> container,
      20L -> revContained, 21L -> revContainer,
      30L -> short)
    val d = java.nio.file.Files.createTempDirectory("graft_dd21").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    (d, rows)
  }

  private def recompute: Seq[(Long, Long, Long, Long, Long, Double)] = {
    val toks = docs.map { case (id, t) => (id, t, shinglesOf(t)) }
    (for {
      (a, ta, sa) <- toks; (b, _, sb) <- toks
      if a != b && sampled(ta) && sa.size >= Dedup.ContainMinTokens
      shared = (sa & sb).size
      c = shared.toDouble / sa.size.toDouble
      if c >= Dedup.ContainTau
    } yield (a, b, sa.size.toLong, sb.size.toLong, shared.toLong,
      roundAt(c, 6))).sortBy(p => (p._1, p._2))
  }

  private def run(broadcastMaxTokens: Long): Seq[(Long, Long, Long, Long, Long, Double)] =
    Dedup.containmentPairsSampled(spark, dir, broadcastMaxTokens).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq

  test("dd21: driver recompute on a corpus straddling the md5 sample boundary") {
    val expected = recompute
    val got = run(Dedup.ContainBroadcastMaxTokens)
    assert(got == expected)

    val pairs = got.map(p => (p._1, p._2)).toSet
    // sample atomicity: the SAMPLED exact-dup group is all-in — every
    // ordered within pair at exactly 1.0 — and the UNSAMPLED group is
    // all-out on the contained side (the all-in/all-out gate the fp-keyed
    // sample guarantees; a doc_id-keyed sample would split the group)
    val g1 = Seq(1L, 2L, 3L)
    for (a <- g1; b <- g1 if a != b) {
      assert(pairs.contains((a, b)))
      assert(got.find(p => p._1 == a && p._2 == b).get._6 == 1.0)
    }
    assert(!got.exists(p => Seq(4L, 5L, 6L).contains(p._1)))
    // asymmetric inclusion: sampled-contained pair surfaces, its reverse
    // does not, and the unsampled-contained inclusion stays invisible
    assert(pairs.contains((10L, 11L)) && !pairs.contains((11L, 10L)))
    assert(!got.exists(p => p._1 == 20L || p._1 == 21L))
    // the short sampled doc is under the token floor
    assert(!got.exists(p => p._1 == 30L))
  }

  test("dd21: broadcast and salted-shuffle branches agree row for row") {
    assert(run(0L) == run(Dedup.ContainBroadcastMaxTokens))
  }

  // ----------------------- dd22 sketch containment ----------------------

  private def hash60(w: String): Long =
    java.lang.Long.parseLong(md5hex(w).substring(0, 15), 16)

  private def sketchOf(sh: Set[String]): Seq[Long] =
    sh.toSeq.map(w => (hash60(w), w)).sortBy(identity)
      .take(Dedup.SketchK).map(_._1).sorted

  /** Independent reimplementation of the KMV merge-and-recut estimator. */
  private def sketchRecompute(
      docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Double, Double)] = {
    val ds = docs.map { case (id, t) =>
      val sh = shinglesOf(t); (id, sh.size.toLong, sketchOf(sh))
    }
    val refs = ds.filter { case (id, n, _) =>
      id % Dedup.SketchRefMod == 0 && id <= Dedup.SketchRefMaxId &&
        n >= Dedup.ContainMinTokens
    }
    (for {
      (ra, na, ska) <- refs; (b, nb, skb) <- ds
      if b != ra
      merged = (ska ++ skb).distinct.sorted.take(Dedup.SketchK)
      inter = merged.count(x => ska.contains(x) && skb.contains(x))
      j = inter.toDouble / merged.size.toDouble
      c = (j * (na + nb).toDouble) / ((1.0d + j) * na.toDouble)
      if c >= Dedup.SketchTau
    } yield (ra, b, na, nb, roundAt(j, 6), roundAt(c, 6)))
      .sortBy(p => (p._1, p._2))
  }

  private def sketchRun(d: String): Seq[(Long, Long, Long, Long, Double, Double)] =
    Dedup.sketchContainmentQuery(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq

  test("KmvMergeCounts: native expression equals the merged-recut reference on edge shapes") {
    def ref(a: Seq[Long], b: Seq[Long], k: Int): (Long, Long) = {
      val m = (a ++ b).distinct.sorted.take(k)
      (m.size.toLong, m.count(x => a.contains(x) && b.contains(x)).toLong)
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L))) ++
      (1 to 20).map(_ => (
        Seq.fill(rnd.nextInt(80))(math.abs(rnd.nextLong()) % 1000L)
          .distinct.sorted,
        Seq.fill(rnd.nextInt(80))(math.abs(rnd.nextLong()) % 1000L)
          .distinct.sorted))
    for ((a, b) <- cases; k <- Seq(1, 4, 64)) {
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.KmvMergeCounts
          .kmvMergeCounts(col("a"), col("b"), k).as("mi"))
        .collect()(0).getSeq[Long](0)
      assert((got(0), got(1)) == ref(a, b, k), s"a=$a b=$b k=$k")
    }
  }

  test("dd22: sketch screen recomputes from a driver-side KMV estimator (sf0.001)") {
    val corpus = graft.core.Tables.documents(spark, graft.SparkTestSession.sf0001)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => Option(r.getString(1)).map(t => (r.getLong(0), t))).toSeq
    assert(sketchRun(graft.SparkTestSession.sf0001) == sketchRecompute(corpus))
  }

  test("dd22: exact copies score 1.0, inclusions pass the screen, unrelated docs do not") {
    val ref = "a reference benchmark passage about catalyst optimizer rules " +
      "and vectorized parquet readers used for decontamination screening"
    val container = ref + " quoted verbatim inside a longer page with extra " +
      "surrounding commentary that roughly doubles the shingle population"
    val unrelated = "completely different material on kafka transactions " +
      "offsets consumer groups and idempotent producers with no overlap"
    val docs = Seq(0L -> ref, 1L -> ref, 2L -> unrelated, 3L -> container)
    val d = java.nio.file.Files.createTempDirectory("graft_dd22").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = sketchRun(d)
    assert(got == sketchRecompute(docs))
    val byDoc = got.map(p => p._2 -> p._6).toMap
    assert(byDoc(1L) == 1.0)          // identical sketches ⇒ ĉ exactly 1
    assert(byDoc.contains(3L))        // the inclusion survives the screen
    assert(!byDoc.contains(2L))       // unrelated text is screened out
  }

  // ------------------------- sa12 token budget --------------------------

  test("sa12: admission recomputes from a driver-side greedy budget fold (sf0.001)") {
    def normT(t: String): String =
      t.toLowerCase.replaceAll("\\s+", " ").trim
    def tokens(t: String): Long =
      if (t.isEmpty) 0L else (t.length - t.replace(" ", "").length + 1).toLong
    def theCount(t: String): Long = {
      val dd = (" " + t + " ").replace(" ", "  ")
      ((dd.length - dd.replaceAll(" \\Qthe\\E ", "").length) / 5).toLong
    }
    val docs = graft.core.Tables.documents(spark, graft.SparkTestSession.sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .flatMap(r => Option(r.getString(2)).map(t =>
        (r.getLong(0), r.getString(1), normT(t))))
      .map { case (id, src, t) => (id, src, tokens(t), theCount(t)) }
      .filter(_._3 > 0L)
      .map { case (id, src, n, c) => (id, src, n, c.toDouble / n.toDouble) }
      .toSeq
    val census = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = census.values.sum
    val ws = census.toSeq.sortBy(_._1)
      .map { case (s, n) => s -> roundAt(math.sqrt(n.toDouble / total.toDouble), 8) }
    val z = roundAt(ws.map(_._2).sum, 8)
    val budget = ws.map { case (s, w) =>
      s -> math.floor((w / z) *
        math.floor(total.toDouble / Curation.BudgetDivisor)).toLong
    }.toMap
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val ordered = ds.sortBy(d => (-d._4, d._1))
      var cum = 0L
      ordered.flatMap { case (id, _, n, sc) =>
        val admit = cum < budget(src)
        val row = if (admit)
          Some((src, id, n, roundAt(sc, 6), budget(src), cum)) else None
        cum += n
        row
      }
    }.sortBy(_._2)
    val got = Curation.tokenBudgetQuery(spark, graft.SparkTestSession.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // non-vacuity: the budget actually CUTS (some doc rejected in some
    // source) and more than one source is represented
    assert(expected.size < docs.size)
    assert(expected.map(_._1).distinct.size > 1)
  }

  // ----------------------- cl09 threshold sweep -------------------------

  test("cl09: PR sweep recomputes from cl01's scored output (sf0.001)") {
    val scored = Classifier
      .qualityClassifierQuery(spark, graft.SparkTestSession.sf0001)
      .select(col("label"), col("score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val nPos = scored.count(_._1 == 1L).toLong
    def r6(x: Double) = roundAt(x, 6)
    val expected = (0 to Classifier.SweepSteps).map { j =>
      val predPos = scored.filter(d => math.floor(d._2 * Classifier.SweepSteps) >= j)
      val tp = predPos.count(_._1 == 1L).toLong
      val fp = predPos.count(_._1 == 0L).toLong
      val fn = nPos - tp
      val p = if (tp + fp > 0) Some(r6(tp.toDouble / (tp + fp).toDouble)) else None
      val rc = if (tp + fn > 0) Some(r6(tp.toDouble / (tp + fn).toDouble)) else None
      val f1 = (p, rc) match {
        case (Some(pp), Some(rr)) if pp + rr > 0.0 =>
          Some(r6(2.0 * pp * rr / (pp + rr)))
        case _ => None
      }
      (roundAt(j.toDouble / Classifier.SweepSteps, 2), tp, fp, fn, p, rc, f1)
    }
    val got = Classifier
      .thresholdSweepQuery(spark, graft.SparkTestSession.sf0001).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toSeq
    assert(got == expected)
    // non-vacuity: threshold 0 admits everything (recall 1); recall is
    // monotone non-increasing; and the sweep actually separates somewhere
    assert(got.head._5.isDefined && got.head._6.contains(1.0))
    val recalls = got.flatMap(_._6)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b <= a })
    assert(got.exists(g => g._6.exists(r => r > 0.0 && r < 1.0)))
  }
}
