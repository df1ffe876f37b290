package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the round-8 sixth-batch additions beyond their
  * DuckDB oracles: driver-side brute-force recomputes of ta21 (Flesch
  * readability), ev14 (time-decayed engagement), gr04 (k-core peel), sk06
  * (KMV set-operation estimates) and ir12 (NDCG eval), independent of both
  * the Spark plans and the oracle SQL. */
class Round8dOpsSpec extends AnyFunSuite {

  private def roundAt(x: Double, dp: Int): Double =
    BigDecimal.valueOf(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue

  private def norm(t: String): String =
    t.toLowerCase.replaceAll("\\s+", " ").trim

  private def countMatches(t: String, re: String): Int =
    re.r.findAllMatchIn(t).length

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(word: String): Long =
    java.lang.Long.parseLong(md5hex(word).take(15), 16)

  test("ta21: Flesch censuses and score recompute from a driver-side scan") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val expected = docs.map { case (id, raw) =>
      val t = norm(raw)
      if (t.isEmpty) (id, 0L, 0L, 0L, None)
      else {
        val words = t.split(" ", -1)
        val nw = words.length.toLong
        val ns = math.max(1, countMatches(t, "[.!?]+")).toLong
        val sy = words.map(w => math.max(1, countMatches(w, "[aeiouy]+")))
          .map(_.toLong).sum
        val score = roundAt(206.835 - 1.015 * (nw.toDouble / ns.toDouble) -
          84.6 * (sy.toDouble / nw.toDouble), 4)
        (id, nw, ns, sy, Some(score))
      }
    }.sortBy(_._1)
    val got = TextAnalysis.readabilityQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got.toSeq == expected.toSeq)
    assert(expected.exists(_._5.nonEmpty))
  }

  test("ev14: decayed engagement recomputes from an ordered driver fold") {
    val evs = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val mt = evs.map(_._3).max
    def weight(t: String): Double = t match {
      case "purchase" => 5.0; case "signup" => 3.0; case "click" => 2.0
      case "view" => 1.0; case _ => 0.0
    }
    val expected = evs.groupBy(_._1).toSeq.map { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      val ages = es.map(e => (mt - e._3) / 86400000000L)
      val raw = ordered.foldLeft(0.0) { (acc, e) =>
        acc + weight(e._4) * math.pow(2.0, -((mt - e._3) / 86400000000L).toDouble)
      }
      (u, es.length.toLong, ages.min, roundAt(raw, 6))
    }.sortBy(_._1)
    val got = Windows.decayEngagementQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expected.toSeq)
    // non-vacuity: decay must actually discount someone (not all weight-1)
    assert(expected.exists(_._4 > 0.0))
  }

  test("gr04: k-core peel recomputes from a driver-side edge walk") {
    val pairs = Dedup.boundedPairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges: Set[(Long, Long)] =
      pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val deg0 = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var keep: Set[Long] = Set.empty
    for (_ <- 1 to Graph.KCorePeels) {
      keep = edges.groupBy(_._1).filter(_._2.size >= Graph.KCoreK).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val degF = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val expected = deg0.toSeq.map { case (id, d) =>
      (id, d, keep(id),
        if (keep(id)) Some(degF.getOrElse(id, 0L)) else None)
    }.sortBy(_._1)
    val got = Graph.kcoreQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == expected.toSeq)
    // non-vacuity: the peel must both keep a dense community and dissolve
    // at least one chain/star node
    assert(expected.exists(_._3) && expected.exists(!_._3))
  }

  test("sk06: KMV set-op estimates recompute from a driver-side sketch") {
    val k = 16
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("")))
    val dt: Seq[(String, String)] = docs
      .flatMap { case (src, t) => norm(t).split(" ", -1).map(src -> _) }
      .distinct.toSeq
    val norm60 = 1152921504606846976.0d
    val bySrc = dt.groupBy(_._1)
    case class Sk(nExact: Long, est: Double,
        bottom: Seq[(Long, String)], words: Set[String])
    val sk = bySrc.map { case (src, ws) =>
      val hashed = ws.map(_._2).map(w => (h60(w), w)).sortBy(identity)
      val bottom = hashed.take(k)
      val nExact = ws.size.toLong
      val est =
        if (bottom.size == k) (k - 1).toDouble / (bottom.last._1 / norm60)
        else nExact.toDouble
      src -> Sk(nExact, est, bottom, ws.map(_._2).toSet)
    }
    val srcs = sk.keys.toSeq.sorted
    val expected = for {
      a <- srcs; b <- srcs if a < b
    } yield {
      val (sa, sb) = (sk(a), sk(b))
      val merged = (sa.bottom ++ sb.bottom).groupBy(_._2)
        .map { case (w, hs) => (hs.map(_._1).min, w) }.toSeq
        .sortBy(identity).take(k)
      val estU =
        if (merged.size == k) (k - 1).toDouble / (merged.last._1 / norm60)
        else merged.size.toDouble
      val nInt = (sa.words & sb.words).size.toLong
      (a, b, sa.nExact + sb.nExact - nInt, roundAt(estU, 4), nInt,
        roundAt(sa.est + sb.est - estU, 4))
    }
    val got = Sketch.kmvSetOpsQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == expected.toSeq)
    // non-vacuity: some pair shares vocabulary, and at least one sketch is
    // saturated (the estimator branch actually exercises)
    assert(expected.exists(_._5 > 0L))
    assert(sk.values.exists(_.bottom.size == k))
  }

  test("ir12: NDCG recomputes from the two collected base rankings") {
    def ranksOf(rows: Array[(Long, Double)]): Seq[(Long, Int)] =
      rows.sortBy { case (id, sc) => (-sc, id) }.zipWithIndex
        .map { case ((id, _), i) => (id, i + 1) }
    val bm = ranksOf(Search.bm25TopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("bm25")))))
    val grades = bm.map { case (id, r) =>
      id -> (if (r <= 3) 3 else if (r <= 10) 2 else 1)
    }.toMap
    val sys = ranksOf(Search.lmDirichletTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("lm_score")))))
    val disc = Search.NdcgDiscounts
    val maxCut = Search.NdcgCutoffs.max
    val sysTerms = sys.filter(_._2 <= maxCut).sortBy(_._2).map { case (id, r) =>
      (r, (math.pow(2.0, grades.getOrElse(id, 0).toDouble) - 1.0) * disc(r - 1))
    }
    val idealTerms = grades.toSeq.sortBy { case (id, g) => (-g, id) }
      .zipWithIndex.map { case ((_, g), i) => (i + 1, g) }
      .filter(_._1 <= maxCut)
      .map { case (p, g) => (p, (math.pow(2.0, g.toDouble) - 1.0) * disc(p - 1)) }
    val expected = Search.NdcgCutoffs.map { n =>
      val dcg = sysTerms.filter(_._1 <= n).map(_._2).foldLeft(0.0)(_ + _)
      val idcg = idealTerms.filter(_._1 <= n).map(_._2).foldLeft(0.0)(_ + _)
      (n.toLong, roundAt(dcg, 6), roundAt(idcg, 6), roundAt(dcg / idcg, 6))
    }
    val got = Search.ndcgEvalQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == expected)
    // non-vacuity: the two systems must actually disagree somewhere, or the
    // eval certifies nothing
    assert(expected.exists(_._4 < 1.0))
  }
}
