package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the round-8 fifth-batch additions beyond their
  * DuckDB oracles: driver-side brute-force recomputes of dq05 (per-source
  * completeness audit), ev13 (conversion-lag cohorts), ir10 (reciprocal
  * rank fusion) and ta20 (clipped ROUGE overlap), independent of both the
  * Spark plans and the oracle SQL. */
class Round8cOpsSpec extends AnyFunSuite {

  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue

  private def tokensOf(t: String): Seq[String] = {
    val n = t.toLowerCase.replaceAll("\\s+", " ").trim
    if (n.isEmpty) Seq.empty else n.split(" ", -1).toSeq
  }

  test("dq05: completeness audit recomputes from a driver-side fold") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("source"), col("text"), col("lang"), col("n_chars"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getLong(3)))
    val expected = docs.groupBy(_._1).toSeq.map { case (src, rows) =>
      val nEmpty = rows.count(r => r._2.forall(_.trim.isEmpty)).toLong
      val nLang = rows.count(r => r._3.forall(_.isEmpty)).toLong
      // null text never counts as a length mismatch (SQL null comparison)
      val nMism = rows.count(r => r._2.exists(t => r._4 != t.length)).toLong
      (src, rows.length.toLong, nEmpty, nLang, nMism,
        rows.flatMap(_._3).distinct.length.toLong,
        rows.map(_._4).min, rows.map(_._4).max,
        nEmpty == 0 && nLang == 0 && nMism == 0)
    }.sortBy(_._1)
    val got = DataQuality.completenessQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getBoolean(8)))
    assert(got.toSeq == expected)
    assert(expected.nonEmpty)
  }

  test("ev13: conversion-lag cohorts recompute from a driver-side walk") {
    val evs = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts_us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perUser = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val fv = es.filter(_._2 == "view").map(_._3).minOption
      val fp = es.filter(_._2 == "purchase").map(_._3).minOption
      (fv, fp) match {
        case (Some(v), Some(p)) if p >= v =>
          val day = java.time.LocalDate.ofEpochDay(
            Math.floorDiv(v, 86_400_000_000L))
          Some((day.toString, p - v))
        case _ => None
      }
    }
    val expected = perUser.groupBy(_._1).toSeq.map { case (day, xs) =>
      val lags = xs.map(_._2).sorted
      (day, xs.length.toLong, lags((lags.length + 1) / 2 - 1), lags.last,
        lags.sum.toDouble / lags.length.toDouble)
    }.sortBy(_._1)
    val got = Windows.conversionLagQuery(spark, sf0001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == expected)
    assert(expected.nonEmpty, "no converting user at sf0.001")
  }

  test("ir10: RRF recomputes from the two base rankings") {
    def ranksOf(rows: Array[(Long, Double)]): Map[Long, Long] =
      rows.sortBy { case (id, sc) => (-sc, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val bm = ranksOf(Search.bm25TopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("bm25")))))
    val lm = ranksOf(Search.lmDirichletTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("lm_score")))))
    val expected = (bm.keySet ++ lm.keySet).toSeq.map { id =>
      val s = bm.get(id).map(r => 1.0 / (Search.RrfK + r.toDouble))
        .getOrElse(0.0) +
        lm.get(id).map(r => 1.0 / (Search.RrfK + r.toDouble)).getOrElse(0.0)
      (id, bm.get(id), lm.get(id), round6(s))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(Search.RrfOut)
    val got = Search.rrfFusionTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3)))
    assert(got.toSeq == expected)
    // the fusion must actually see disagreement between the systems
    assert(expected.exists { case (id, b, l, _) => b != l },
      "bm25 and LM ranked every document identically")
  }

  test("ir11: PRF offer weights recompute from a driver-side count") {
    val r0 = Search.PrfDocs
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), tokensOf(Option(r.getString(1)).getOrElse(""))))
    val fb = Search.bm25TopK(spark, sf0001, k = r0).collect()
      .map(_.getLong(0)).toSet
    assert(fb.size == r0)
    val n = docs.length.toLong
    val byTerm = docs.flatMap { case (id, toks) =>
      toks.distinct.map(t => (t, id))
    }.groupBy(_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.count(x => fb.contains(x._2)).toLong)
    }
    def round4(x: Double): Double =
      BigDecimal.valueOf(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .doubleValue
    val expected = byTerm.toSeq
      .filter { case (t, _, r) => r > 0 && !Search.QueryTerms.contains(t) }
      .map { case (t, df, r) =>
        val num = (r.toDouble + 0.5) / (r0.toDouble - r.toDouble + 0.5)
        val den = (df.toDouble - r.toDouble + 0.5) /
          (n.toDouble - r0.toDouble - df.toDouble + r.toDouble + 0.5)
        (t, df, r, round4(r.toDouble * math.log(num / den)))
      }
      .sortBy { case (t, _, _, w) => (-w, t) }.take(Search.PrfTerms)
    val got = Search.queryExpansionTerms(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expected)
    // expansion must surface terms beyond the original query by construction
    assert(expected.nonEmpty && expected.forall(t =>
      !Search.QueryTerms.contains(t._1)))
  }

  test("ta20: clipped ROUGE recomputes from a driver-side count") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        tokensOf(Option(r.getString(2)).getOrElse(""))))
    def grams(toks: Seq[String], g: Int): Seq[String] =
      if (g == 1) toks
      else if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    def counts(gs: Seq[String]): Map[String, Long] =
      gs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val heads = docs.groupBy(_._2).map { case (src, ds) =>
      src -> ds.minBy(_._1)
    }
    val expected = (for {
      (id, src, toks) <- docs.toSeq
      head = heads(src) if id != head._1
      g <- Seq(1L, 2L)
      cand = grams(toks, g.toInt) if cand.nonEmpty
      ref = grams(head._3, g.toInt) if ref.nonEmpty
    } yield {
      val cc = counts(cand); val rc = counts(ref)
      val nClip = cc.map { case (k, c) => math.min(c, rc.getOrElse(k, 0L)) }
        .sum
      val p = nClip.toDouble / cand.length.toDouble
      val r = nClip.toDouble / ref.length.toDouble
      val f = if (nClip > 0) 2.0 * p * r / (p + r) else 0.0
      (id, head._1, g, cand.length.toLong, ref.length.toLong, nClip,
        round6(p), round6(r), round6(f))
    }).sortBy(t => (t._1, t._3))
    val got = TextAnalysis.rougeQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8)))
    assert(got.toSeq == expected)
    assert(expected.nonEmpty)
    // overlap must be PARTIAL somewhere, or the metric is degenerate
    assert(expected.exists(t => t._6 > 0 && t._9 < 1.0),
      "no pair with partial clipped overlap")
  }
}
