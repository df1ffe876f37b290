package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the round-8 eighth-batch additions beyond their
  * DuckDB oracles: driver-side brute-force recomputes of ev16 (A/B test),
  * cl07 (classifier ensemble), dd20 (hamming threshold sweep) and ir14
  * (snippet extraction), independent of both the Spark plans and the
  * oracle SQL. */
class Round8fOpsSpec extends AnyFunSuite {

  private def roundAt(x: Double, dp: Int): Double =
    BigDecimal.valueOf(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue

  test("ev16: two-proportion z recomputes from a driver-side user fold") {
    val evs = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = evs.groupBy(_._1)
    val expected = Windows.AbGoals.sorted.map { goal =>
      val users = byUser.toSeq.map { case (u, es) =>
        (if (u % 2 == 0) "A" else "B", es.exists(_._2 == goal))
      }
      val (na, ca) = (users.count(_._1 == "A").toLong,
        users.count(u => u._1 == "A" && u._2).toLong)
      val (nb, cb) = (users.count(_._1 == "B").toLong,
        users.count(u => u._1 == "B" && u._2).toLong)
      val p1 = ca.toDouble / na.toDouble
      val p2 = cb.toDouble / nb.toDouble
      val pp = (ca + cb).toDouble / (na + nb).toDouble
      val se = math.sqrt(pp * (1.0 - pp) * (1.0 / na.toDouble + 1.0 / nb.toDouble))
      val z = if (se > 0) Some(roundAt((p1 - p2) / se, 6)) else None
      val sig = se > 0 && math.abs((p1 - p2) / se) > 1.96
      (goal, na, ca, nb, cb, roundAt(p1, 6), roundAt(p2, 6), z, sig)
    }
    val got = Windows.abTestQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7)), r.getBoolean(8)))
    assert(got.toSeq == expected)
    // non-vacuity: both arms populated for every goal
    assert(expected.forall(e => e._2 > 0 && e._4 > 0))
  }

  test("cl07: the three-voter majority recomputes from the voters' outputs") {
    def preds(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select(col("vec_id"), col("pred_label")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val k5 = Classifier.knnClassifierQuery(spark, sf0001, 5)
    val truth = k5.select(col("vec_id"), col("true_label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (v5, v1) = (preds(k5), preds(Classifier.knnClassifierQuery(spark, sf0001, 1)))
    val vc = preds(Classifier.centroidClassifierQuery(spark, sf0001))
    val expected = truth.keys.toSeq.sorted.map { id =>
      val (a, b, c) = (v5(id), v1(id), vc(id))
      val ens = if (b == c && b != a) b else a
      val agree = if (a == b && b == c) 3L
        else if (a == b || a == c || b == c) 2L else 1L
      (id, truth(id), a, b, c, ens, agree, ens == truth(id))
    }
    val got = Classifier.ensembleQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getLong(6), r.getBoolean(7)))
    assert(got.toSeq == expected)
    // non-vacuity: the voters must actually disagree somewhere, and the
    // 2-1 override path must fire at least once
    assert(expected.exists(_._7 < 3L))
    assert(expected.exists(e => e._6 != e._3))
  }

  test("dd20: the radius sweep recomputes from the dd04 pair stream") {
    val pairs = Dedup.simhashPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = (0L to 3L).map { rad =>
      val in = pairs.filter(_._3 <= rad)
      (rad, in.length.toLong,
        in.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
    }
    val got = Dedup.hammingSweepQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
    // non-vacuity: the sweep must be a non-constant curve
    assert(expected.map(_._2).distinct.length > 1)
  }

  test("ir14: best windows recompute from a driver-side token scan") {
    val w = Search.SnippetWindow
    val terms = Search.QueryTerms.toSet
    val top = Search.bm25TopK(spark, sf0001, k = Search.SnippetDocs).collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("bm25"))))
      .sortBy { case (id, sc) => (-sc, id) }.map(_._1).zipWithIndex
      .map { case (id, i) => (id, (i + 1).toLong) }
    val texts = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    val expected = top.map { case (id, rank) =>
      val toks = texts(id).toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ", -1).toSeq
      val hits = toks.map(t => if (terms(t)) 1 else 0)
      val starts = 1 to math.max(toks.length - w + 1, 1)
      val cnts = starts.map(i => hits.slice(i - 1, i - 1 + w).sum)
      val best = cnts.max
      val pos = cnts.indexOf(best) // earliest
      (id, rank, best.toLong, toks.slice(pos, pos + w).mkString(" "))
    }.sortBy(_._2)
    val got = Search.snippetQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == expected.toSeq)
    // non-vacuity: some snippet contains more than one hit, and the best
    // window is not always the document head
    assert(expected.exists(_._3 > 1L))
    assert(expected.exists(e => !texts(e._1).toLowerCase
      .replaceAll("\\s+", " ").trim.startsWith(e._4)))
  }
}
