package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the round-8 seventh-batch additions beyond their
  * DuckDB oracles: driver-side brute-force recomputes of dd19 (token-set
  * containment), ta22 (trigram novelty), dq07 (snapshot state diff), ev15
  * (CUSUM changepoints) and ir13 (BM25F), independent of both the Spark
  * plans and the oracle SQL. */
class Round8eOpsSpec extends AnyFunSuite {

  private def roundAt(x: Double, dp: Int): Double =
    BigDecimal.valueOf(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue

  private def norm(t: String): String =
    t.toLowerCase.replaceAll("\\s+", " ").trim

  private def docShingles: Seq[(Long, Set[String])] =
    graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        Option(r.getString(1)).map { t =>
          // charShingles semantics: 1-based 5-char substrings; a text
          // shorter than the shingle yields the single (short) shingle
          val sh = if (t.length < Dedup.ShingleSize) Set(t)
            else t.sliding(Dedup.ShingleSize).toSet
          (r.getLong(0), sh)
        }
      }.toSeq

  test("dd19: containment pairs recompute from driver-side shingle sets") {
    val toks = docShingles
    val expected = (for {
      (a, sa) <- toks; (b, sb) <- toks
      if a != b && sa.size >= Dedup.ContainMinTokens
      shared = (sa & sb).size
      c = shared.toDouble / sa.size.toDouble
      if c >= Dedup.ContainTau
    } yield (a, b, sa.size.toLong, sb.size.toLong, shared.toLong,
      roundAt(c, 6))).sortBy(p => (p._1, p._2))
    val got = Dedup.containmentPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == expected)
    // non-vacuity: asymmetric inclusion must actually appear — some pair
    // (a contained in b) whose reverse direction does NOT qualify
    val keys = expected.map(p => (p._1, p._2)).toSet
    assert(expected.exists(p => !keys.contains((p._2, p._1))))
  }

  test("ta22: trigram novelty recomputes from a driver-side first-occurrence map") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    def gramsOf(t: String): Set[String] = {
      val w = norm(t).split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val perDoc = docs.map { case (id, t) => (id, t.map(gramsOf).getOrElse(Set.empty)) }
    val first = perDoc.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val expected = perDoc.map { case (id, gs) =>
      val novel = gs.count(g => first(g) == id).toLong
      (id, gs.size.toLong, novel,
        if (gs.isEmpty) None
        else Some(roundAt(novel.toDouble / gs.size.toDouble, 6)))
    }.sortBy(_._1)
    val got = TextAnalysis.noveltyQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == expected.toSeq)
    // non-vacuity: novelty must separate — some doc fully novel, some not
    assert(expected.exists(e => e._4.contains(1.0)) &&
      expected.exists(e => e._4.exists(_ < 1.0)))
  }

  test("dq07: snapshot diff recomputes from a driver-side two-watermark fold") {
    // cutoffs as UTC instants — the session TZ the query's string cast uses
    def utcMs(d: String): Long = java.time.LocalDate.parse(d)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val (cutOld, cutNew) = (utcMs(DataQuality.SnapOld), utcMs(DataQuality.SnapNew))
    val orders = graft.core.Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .filter(_._2 < cutNew)
    val expected = orders.groupBy(_._1).toSeq.map { case (ck, os) =>
      val old = os.filter(_._2 < cutOld)
      val ct = if (old.isEmpty) "added"
        else if (os.length > old.length) "changed" else "unchanged"
      (ck, ct, old.length.toLong, os.length.toLong)
    }.sortBy(_._1)
    val got = DataQuality.snapshotDiffQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // all three classes must be populated or the audit certifies nothing
    assert(Set("added", "changed", "unchanged").subsetOf(
      expected.map(_._2).toSet))
  }

  test("ev15: CUSUM closed form equals the naive max(0, S+dev) recursion") {
    val rows = Windows.cusumQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val evs = graft.core.Tables.events(spark, sf0001)
      .select(col("event_type"), to_date(col("ts")).cast("string"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byType = evs.groupBy(_._1)
    val expected = byType.toSeq.flatMap { case (et, es) =>
      val daily = es.groupBy(_._2).toSeq.map { case (d, xs) => (d, xs.length.toLong) }
        .sortBy(_._1)
      val k = daily.map(_._2).sum.toDouble / daily.length.toDouble
      // the query's closed form: S_i = P_i - min(0, min_{j<=i} P_j)
      var p = 0.0; var minP = 0.0
      daily.map { case (d, x) =>
        p += x.toDouble - k
        minP = math.min(minP, p)
        val sc = p - math.min(minP, 0.0)
        (et, d, x, roundAt(sc, 6), sc > 3.0 * k)
      }
    }.sortBy(e => (e._1, e._2))
    assert(rows.toSeq == expected)
    // semantic equivalence to the textbook recursion (tolerance: the two
    // forms round differently in IEEE, equal in exact arithmetic)
    byType.foreach { case (et, es) =>
      val daily = es.groupBy(_._2).toSeq.map { case (d, xs) => (d, xs.length.toLong) }
        .sortBy(_._1)
      val k = daily.map(_._2).sum.toDouble / daily.length.toDouble
      var sNaive = 0.0; var p = 0.0; var minP = 0.0
      daily.foreach { case (_, x) =>
        sNaive = math.max(0.0, sNaive + x.toDouble - k)
        p += x.toDouble - k
        minP = math.min(minP, p)
        val sClosed = p - math.min(minP, 0.0)
        assert(math.abs(sNaive - sClosed) <= 1e-9 * math.max(1.0, sNaive.abs),
          s"$et: closed-form drifted from recursion")
      }
    }
    // non-vacuity: CUSUM must accumulate somewhere
    assert(expected.exists(_._4 > 0.0))
  }

  test("ir13: BM25F recomputes from a driver-side field-split scorer") {
    val W = Search.TitleWeight
    val terms = Search.QueryTerms
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).map(norm).getOrElse("")))
    val titleRe = "^[^.!?]*[.!?]*".r
    def toks(x: String): Seq[String] =
      if (x.isEmpty) Seq.empty else x.split(" ", -1).toSeq
    val perDoc = docs.map { case (id, t) =>
      val title = titleRe.findFirstIn(t).getOrElse("")
      val body = t.drop(title.length).trim
      val (tt, bt) = (toks(title), toks(body))
      val dlw = W * tt.length + bt.length
      val tfw = terms.map(w => W * tt.count(_ == w) + bt.count(_ == w))
      (id, dlw, tfw)
    }
    val n = perDoc.length.toDouble
    val avgdl = perDoc.map(_._2).sum.toDouble / n
    val dfs = terms.indices.map(i => perDoc.count(_._3(i) > 0).toDouble)
    val scored = perDoc.map { case (id, dlw, tfw) =>
      val sc = terms.indices.map { i =>
        val tf = tfw(i).toDouble
        val idf = math.log((n - dfs(i) + 0.5) / (dfs(i) + 0.5) + 1.0)
        idf * (tf * (Search.K1 + 1.0)) /
          (tf + Search.K1 * ((1.0 - Search.B) + Search.B * dlw.toDouble / avgdl))
      }.sum
      (id, tfw, roundAt(sc, 4))
    }
    val expected = scored.sortBy { case (id, _, sc) => (-sc, id) }
      .take(Search.TopK)
      .map { case (id, tfw, sc) => (id, tfw.map(_.toLong), sc) }
    val got = Search.bm25fTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), terms.indices.map(i => r.getLong(i + 1)),
        r.getDouble(terms.length + 1)))
    assert(got.toSeq == expected.toSeq)
    // non-vacuity: the field weighting must actually reorder vs plain bm25
    val plain = Search.bm25TopK(spark, sf0001).collect().map(_.getLong(0)).toSeq
    assert(got.map(_._1).toSeq != plain)
  }
}
