package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the round-6 second-batch operators beyond their
  * DuckDB oracles (ev06 / dq04 / ta17 / ir05 / sa08 / mm06 / cl02). */
class Round6bOpsSpec extends AnyFunSuite {

  test("ev06: one row per purchase; touch precedes, is in-window and is the latest") {
    val rows = Windows.attributionQuery(spark, sf0001).collect()
    val ev = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = ev.filter(_._3 == "purchase")
    assert(rows.length == purchases.length, "every purchase exactly once")
    val lookbackUs = 259200L * 1000000L
    val touchesByUser = ev.filter(e => e._3 == "click" || e._3 == "view")
      .groupBy(_._1)
    rows.foreach { r =>
      val (pid, uid, pus) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // brute-force recompute: latest (tus, event_id) strictly before the
      // purchase in (tus, id) order, then the window cut
      val expected = touchesByUser
        .getOrElse(uid, Array.empty[(Long, Long, String, Long)])
        .filter(t => t._4 < pus || (t._4 == pus && t._2 < pid))
        .sortBy(t => (t._4, t._2)).lastOption
        .filter(t => pus - t._4 <= lookbackUs)
      expected match {
        case None => assert(r.isNullAt(3), s"purchase $pid should be unattributed")
        case Some(t) =>
          assert(!r.isNullAt(3) && r.getLong(3) == t._2, s"purchase $pid touch id")
          assert(r.getString(4) == t._3, s"purchase $pid touch type")
          assert(r.getLong(5) == (pus - t._4) / 1000000L, s"purchase $pid gap")
      }
    }
  }

  test("dq04: counts conserve per type; z recomputes from the day matrix") {
    val rows = DataQuality.volumeAnomalyQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    val typeTotals = graft.core.Tables.events(spark, sf0001)
      .groupBy(col("event_type")).agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getLong(2)).sum == typeTotals(t), s"$t counts conserve")
      val cs = rs.map(_.getLong(2))
      val n = cs.length
      val mu = cs.sum.toDouble / n
      rs.foreach { r =>
        assert(math.abs(r.getDouble(3) - mu) < 1e-9, s"$t mu")
        if (!r.isNullAt(4)) {
          val sd = math.sqrt((n.toLong * cs.map(c => c * c).sum -
            cs.sum * cs.sum).toDouble / (n.toLong * (n - 1)))
          val z = (r.getLong(2) - mu) / sd
          assert(math.abs(r.getDouble(4) - z) < 1e-9, s"$t z")
          assert(r.getBoolean(5) == (math.abs(z) > 2.0), s"$t flag")
        }
      }
    }
  }

  test("ta17: thirds are balanced per language and ordered by score") {
    val rows = TextAnalysis.pplBucketsQuery(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs, "every document bucketed")
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_.getString(3)).view.mapValues(_.length).toMap
      assert(sizes.keySet.subsetOf(Set("head", "middle", "tail")), lang)
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang ntile balance")
      // bucket order follows score order: min(head) >= max(middle) etc.
      def scores(b: String) = rs.filter(_.getString(3) == b).map(_.getDouble(2))
      if (sizes.contains("head") && sizes.contains("middle"))
        assert(scores("head").min >= scores("middle").max, s"$lang head>=middle")
      if (sizes.contains("middle") && sizes.contains("tail"))
        assert(scores("middle").min >= scores("tail").max, s"$lang middle>=tail")
    }
  }

  test("ir05: occurrence counts match a regex recount of the raw text") {
    val rows = Search.phraseSearch(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
    val phrase = Search.Phrase
    docs.foreach { d =>
      val toks = d.getString(1).toLowerCase.trim.split("\\s+")
      val expected = toks.sliding(phrase.length)
        .count(_.sameElements(phrase))
      if (expected == 0) assert(!rows.contains(d.getLong(0)), s"doc ${d.getLong(0)}")
      else assert(rows.get(d.getLong(0)).contains(expected.toLong),
        s"doc ${d.getLong(0)}: expected $expected")
    }
  }

  test("sa08: shares normalize; epochs capped; planned tokens consistent") {
    val rows = Curation.epochPlanQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4, "shares sum to 1")
    rows.foreach { r =>
      val (nTok, raw, ep, planned) =
        (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(ep <= 4.0 + 1e-9, "cap")
      assert(ep <= raw + 1e-9, "capped epochs never exceed raw")
      assert(math.abs(planned - ep * nTok) < 0.5 + 1e-6 * planned, "planned = epochs x tokens")
    }
    // the budget is conserved up to the cap: uncapped sources' planned
    // tokens equal budget x share
    val total = rows.map(_.getLong(1)).sum
    rows.filter(_.getDouble(4) < 4.0).foreach { r =>
      assert(math.abs(r.getDouble(5) - 2.0 * total * r.getDouble(2)) /
        math.max(1.0, r.getDouble(5)) < 1e-3, s"${r.getString(0)} budget share")
    }
  }

  test("mm06: frames cover the payload exactly; stats recompute brute-force") {
    val rows = Multimodal.audioFramesQuery(spark, sf0001).collect()
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byMedia = rows.groupBy(_.getLong(0))
    assert(byMedia.keySet == docs.keySet.filter(docs(_).nonEmpty), "all media framed")
    byMedia.foreach { case (id, frames) =>
      val bytes = docs(id).getBytes("UTF-8")
      assert(frames.map(_.getLong(2)).sum == bytes.length, s"media $id coverage")
      assert(frames.map(_.getLong(1)).sorted.toSeq ==
        (0L until frames.length).toSeq, s"media $id frame indexes")
      // brute-force recompute of one media's frames
      if (id == byMedia.keySet.min) {
        // the brute-force twin runs the REAL codec round-trip too
        val pcm = Multimodal.AudioDecoder.pcm(Multimodal.AudioFixtures.pcm16Wav(bytes))
        frames.sortBy(_.getLong(1)).foreach { f =>
          val from = f.getLong(1).toInt * 64
          val slice = pcm.slice(from, from + 64)
          assert(f.getLong(3) == slice.map(a => a.toLong * a).sum, "energy")
          assert(f.getLong(4) ==
            slice.sliding(2).count(p => p.length == 2 && p(0) * p(1) < 0), "zc")
          assert(f.getBoolean(5) == (f.getLong(3) > f.getLong(2) * 5500L), "gate")
        }
      }
    }
  }

  test("cl02: a full decision surface — 5 scored rows and ONE prediction per doc") {
    val rows = Classifier.naiveBayesLangQuery(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs * Classifier.Langs.length)
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      assert(rs.map(_.getString(2)).sorted.toSeq == Classifier.Langs, s"doc $id")
      val predicted = rs.filter(_.getBoolean(4))
      assert(predicted.length == 1, s"doc $id: exactly one prediction")
      // the prediction is the rounded-score argmax with min-lang tiebreak
      val maxScore = rs.map(_.getDouble(3)).max
      val expected = rs.filter(_.getDouble(3) == maxScore).map(_.getString(2)).min
      assert(predicted.head.getString(2) == expected, s"doc $id argmax")
    }
  }

  test("sim08: MIPS ranking matches a driver recompute; asymmetric transform preserves it") {
    val k = 5
    val rows = Similarity.mipsTopK(spark, sf0001, k = k, nQueries = 10).collect()
    val vecs = graft.core.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val maxNorm = math.sqrt(vecs.values.map(v => dot(v, v)).max)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.length == k, s"query $qid emits k rows")
      val q = vecs(qid)
      // brute-force expected top-k under the SAME rounding and tiebreaks
      val expected = vecs.toSeq.filter(_._1 != qid)
        .map { case (cid, cv) =>
          (cid, BigDecimal(dot(q, cv)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (cid, ip) => (-ip, cid) }.take(k).map(_._1)
      assert(rs.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq == expected, s"query $qid")
      // Shrivastava & Li: augmented-space cosine order == dot order for a
      // fixed query (augmented candidate norm is the constant maxNorm)
      val augRank = vecs.toSeq.filter(_._1 != qid)
        .map { case (cid, cv) =>
          val aug = dot(q, cv) / (math.sqrt(dot(q, q)) * maxNorm)
          (cid, aug) }
        .sortBy { case (cid, s) => (-s, cid) }.take(k).map(_._1)
      val dotRank = vecs.toSeq.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, dot(q, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(k).map(_._1)
      assert(augRank == dotRank, s"query $qid: asymmetric transform rank drift")
    }
  }

  test("ev07: per-day top-k recomputes from the raw counts") {
    val rows = Windows.heavyHittersQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val counts = graft.core.Tables.events(spark, sf0001)
      .selectExpr("ts_us div 86400000000 AS day", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.groupBy(_.getLong(0)).foreach { case (day, rs) =>
      val expected = counts.collect { case ((d, u), c) if d == day => (u, c) }
        .toSeq.sortBy { case (u, c) => (-c, u) }.take(3)
      assert(rs.sortBy(_.getLong(3)).map(r => (r.getLong(1), r.getLong(2))).toSeq
        == expected, s"day $day")
    }
  }

  test("ta18: alpha recomputes from the ranked counts and looks Zipf-like") {
    val rows = TextAnalysis.zipfFitQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 10, s"${r.getString(0)}: enough ranked words")
      // the synthetic corpus is near-uniform over a small vocabulary, so
      // alpha is small-positive; the fit must at least be finite and sane
      assert(!r.getDouble(2).isNaN && r.getDouble(2) > -1.0 && r.getDouble(2) < 3.0,
        s"${r.getString(0)}: alpha ${r.getDouble(2)}")
      assert(!r.getDouble(3).isNaN, s"${r.getString(0)}: intercept")
    }
  }
}
