package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the round-8 tenth-batch additions beyond their
  * DuckDB oracles: driver-side recomputes of q43 (salted join ==
  * plain-join semantics), mm08 (audio near-dup from the fixture sample
  * function — an independent path from the codec decode the query runs)
  * and cl08 (langid agreement from the two voters' outputs). */
class Round8hOpsSpec extends AnyFunSuite {

  private def roundAt(x: Double, dp: Int): Double =
    BigDecimal.valueOf(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue

  test("q43: the salted join reproduces the plain-join aggregate") {
    val li = graft.core.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val prio = graft.core.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = li.flatMap { case (ok, p, d) => prio.get(ok).map(_ -> (p, d)) }
      .groupBy(_._1).toSeq.map { case (pr, xs) =>
        (pr, xs.length.toLong, roundAt(xs.map { case (_, (p, d)) =>
          p * (1.0 - d) }.sum, 2))
      }.sortBy(_._1)
    val got = Relational.saltedJoinQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // the money sum is shuffle-order-dependent: compare rounded totals to
    // the cent (the q01 convention), everything else exactly
    assert(got.map(g => (g._1, g._2)).toSeq == expected.map(e => (e._1, e._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 0.02, s"${g._1}: ${g._3} vs ${e._3}")
    }
    assert(expected.nonEmpty)
  }

  test("mm08: near-dup pairs recompute from the fixture sample function") {
    val frameLen = 64
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    def sigsOf(t: String): Set[Seq[Int]] = {
      val samples = t.getBytes("UTF-8").zipWithIndex
        .map { case (b, i) => Multimodal.AudioFixtures.sample(b, i) }
      samples.grouped(frameLen).map(_.toSeq).toSet
    }
    val perDoc = docs.map { case (id, t) => (id, sigsOf(t)) }
      .filter(_._2.nonEmpty)
    val expected = (for {
      (a, sa) <- perDoc; (b, sb) <- perDoc if a < b
      common = (sa & sb).size
      if common > 0
      j = roundAt(common.toDouble / (sa.size + sb.size - common).toDouble, 6)
      if j >= 0.5
    } yield (a, b, sa.size.toLong, sb.size.toLong, common.toLong, j))
      .sortBy(p => (p._1, p._2))
    val got = Multimodal.audioNearDupQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == expected.toSeq)
    // non-vacuity: NEAR-dups (strictly below 1.0) must appear — shared
    // frames without identical frame sets
    assert(expected.exists(p => p._6 < 1.0))
  }

  test("sa11: the temporal split recomputes from a driver-side user fold") {
    def utcMs(d: String): Long = java.time.LocalDateTime.parse(
      d.replace(" ", "T")).toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val (c1, c2) = (utcMs(Curation.SplitCutTrain), utcMs(Curation.SplitCutValid))
    val evs = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val byUser = evs.groupBy(_._1)
    val rows = byUser.toSeq.flatMap { case (u, es) =>
      val ft = es.map(_._2).min
      val (split, cut) =
        if (ft < c1) ("train", Some(c1))
        else if (ft < c2) ("valid", Some(c2)) else ("test", None)
      es.map { case (_, ts) => (split, u, ts, cut) }
    }
    val expected = rows.groupBy(_._1).toSeq.map { case (split, xs) =>
      (split, xs.map(_._2).distinct.length.toLong, xs.length.toLong,
        xs.count(x => x._4.exists(x._3 >= _)).toLong,
        new java.sql.Date(xs.map(_._3).min).toString,
        new java.sql.Date(xs.map(_._3).max).toString)
    }.sortBy(_._1)
    val got = Curation.temporalSplitQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDate(4).toString, r.getDate(5).toString))
    assert(got.toSeq == expected)
    // non-vacuity: all three splits populated, and the future-information
    // census is nonzero somewhere (the reason the audit exists)
    assert(expected.map(_._1).toSet == Set("train", "valid", "test"))
    assert(expected.exists(_._4 > 0L))
  }

  test("cl08: the agreement matrix recomputes from the two voters") {
    val h = TextAnalysis.langIdQuery(spark, sf0001)
      .select(col("doc_id"), col("pred_lang"), col("declared_lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val nb = Classifier.naiveBayesLangQuery(spark, sf0001)
      .filter(col("predicted"))
      .select(col("doc_id"), col("cand_lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = h.flatMap { case (id, hp, dl) =>
      nb.get(id).map(n => (hp, n, dl))
    }.groupBy(x => (x._1, x._2)).toSeq.map { case ((hp, n), xs) =>
      (hp, n, xs.length.toLong, xs.count(x => x._1 == x._3).toLong,
        xs.count(x => x._2 == x._3).toLong, hp == n)
    }.sortBy(x => (x._1, x._2))
    val got = Classifier.langAgreementQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == expected)
    // non-vacuity: the models must disagree on at least one cell
    assert(expected.exists(!_._6))
  }
}
