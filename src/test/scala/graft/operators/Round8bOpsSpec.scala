package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the round-8 second-batch additions beyond their
  * DuckDB oracles: driver-side brute-force recomputes of ir08 (LM-Dirichlet
  * retrieval), cl05 (nearest-centroid classifier), cl06 (calibration
  * report), ev11 (Markov next-event), sim11 (MaxSim late interaction) and
  * gr03 (Adamic-Adar), independent of both the Spark plans and the oracle
  * SQL. */
class Round8bOpsSpec extends AnyFunSuite {

  private def round(x: Double, scale: Int): Double =
    BigDecimal.valueOf(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue
  private def round6(x: Double): Double = round(x, 6)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { // left-to-right folds, like CosineSim
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    round6(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  private def tokensOf(t: String): Seq[String] = {
    val n = t.toLowerCase.replaceAll("\\s+", " ").trim
    if (n.isEmpty) Seq.empty else n.split(" ", -1).toSeq
  }

  test("ir08: LM-Dirichlet top-k recomputes from a driver-side pass") {
    val terms = Search.QueryTerms
    val mu = Search.Mu
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        tokensOf(Option(r.getString(1)).getOrElse(""))))
    val c = docs.map(_._2.length.toLong).sum
    val cf = terms.map(t =>
      t -> docs.map(_._2.count(_ == t).toLong).sum).toMap
    val scored = docs.map { case (id, toks) =>
      val dl = toks.length.toLong
      val tfs = terms.map(t => toks.count(_ == t).toLong)
      val score = round(terms.zip(tfs).map { case (t, tf) =>
        math.log((tf.toDouble + mu * (cf(t).toDouble / c.toDouble)) /
          (dl.toDouble + mu))
      }.sum, 4)
      (id, dl, tfs, score)
    }
    val expected = scored.sortBy { case (id, _, _, sc) => (-sc, id) }
      .take(Search.TopK)
      .map { case (id, dl, tfs, sc) => (id, dl, tfs(0), tfs(1), tfs(2), sc) }
    val got = Search.lmDirichletTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == expected.toSeq)
    assert(expected.exists(e => e._3 + e._4 + e._5 > 0),
      "no query term occurs — retrieval untested")
    assert(expected.map(_._6).distinct.length > 1,
      "all scores equal — ranking untested")
  }

  test("cl05: nearest-centroid predictions recompute driver-side") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def h(id: Long): Long = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 10
    val train = emb.filter(e => h(e._1) < 8)
    val test0 = emb.filter(e => h(e._1) >= 8).sortBy(_._1)
    assert(train.nonEmpty && test0.nonEmpty)
    val cents = train.groupBy(_._3).map { case (l, vs) =>
      val dim = vs.head._2.length
      l -> Array.tabulate(dim) { j =>
        round6(vs.sortBy(_._1).map(_._2(j)).sum / vs.length)
      }
    }
    val expected = test0.map { case (id, v, l) =>
      val (pl, c) = cents.toSeq
        .map { case (cl, cv) => (cl, cos(v, cv)) }
        .sortBy { case (cl, cc) => (-cc, cl) }.head
      (id, l, pl, c, pl == l)
    }
    val got = Classifier.centroidClassifierQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.toSeq == expected.toSeq)
    assert(expected.map(_._3).distinct.length > 1,
      "every test vector got the same centroid — separation untested")
  }

  test("cl06: calibration bins recompute from the cl01 score stream") {
    val bins = 10
    val scored = Classifier.qualityClassifierQuery(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getDouble(2))) // (label, score)
    val lo = scored.map(_._2).min
    val hi = scored.map(_._2).max
    def binOf(s: Double): Long =
      if (hi > lo) math.min(math.floor((s - lo) / (hi - lo) * bins).toLong,
        (bins - 1).toLong)
      else 0L
    val expected = scored.groupBy(e => binOf(e._2)).toSeq.map { case (b, es) =>
      val conf = round6(es.map(_._2).sum / es.length)
      val acc = round6(es.map(_._1).sum.toDouble / es.length)
      (b, es.length.toLong, conf, acc, round6(math.abs(conf - acc)))
    }.sortBy(_._1)
    val got = Classifier.calibrationReportQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == expected.toSeq)
    assert(expected.length > 1, "one bin — the diagram audits nothing")
    assert(expected.map(_._2).sum == scored.length.toLong,
      "bins must partition the score stream")
  }

  test("ev11: Markov next-event predictions recompute driver-side") {
    val evs = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = evs.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2))).toMap
    val trans = byUser.values.flatMap(es =>
      es.zip(es.drop(1)).map { case (a, b) => (a._3, b._3) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totals = trans.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val best = trans.keys.map(_._1).toSeq.distinct.map { f =>
      val (to, n) = trans.collect { case ((`f`, t), c) => (t, c) }.toSeq
        .sortBy { case (t, c) => (-c, t) }.head
      f -> (to, n.toDouble / totals(f).toDouble)
    }.toMap
    val expected = byUser.toSeq.map { case (u, es) =>
      val lastType = es.maxBy(e => (e._4, e._2))._3
      best.get(lastType) match {
        case Some((p, pr)) => (u, lastType, p, pr)
        case None          => (u, lastType, null: String, Double.NaN)
      }
    }.sortBy(_._1)
    val got = Windows.markovNextQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"row $g vs $e")
      assert((g._4.isNaN && e._4.isNaN) || g._4 == e._4, s"prob $g vs $e")
    }
    assert(expected.exists(_._3 != null), "no prediction produced")
    assert(expected.map(_._3).distinct.length > 1,
      "constant prediction — the matrix argmax is untested")
  }

  test("sim11: MaxSim top-k recomputes from a driver-side brute force") {
    val vecsPerDoc = 5; val nQueryDocs = 10; val k = 5
    val emb = graft.core.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val byDoc = emb.groupBy(e => e._1 / vecsPerDoc).view
      .mapValues(_.sortBy(_._1)).toMap
    val qdocs = byDoc.keys.filter(d =>
      byDoc(d).exists(_._1 < vecsPerDoc.toLong * nQueryDocs)).toSeq.sorted
    val expected = qdocs.flatMap { qd =>
      val qvs = byDoc(qd).filter(_._1 < vecsPerDoc.toLong * nQueryDocs)
      byDoc.keys.filter(_ != qd).toSeq.map { dd =>
        val score = round6(qvs.map { case (_, qv) =>
          byDoc(dd).map(d => cos(qv, d._2)).max
        }.sum)
        (qd, dd, score)
      }.sortBy { case (_, dd, sc) => (-sc, dd) }.take(k)
        .zipWithIndex.map { case ((q, d, sc), i) => (q, d, sc, (i + 1).toLong) }
    }.sortBy(t => (t._1, t._4))
    val got = Similarity.maxSimTopK(spark, sf0001, vecsPerDoc, nQueryDocs, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // late interaction must disagree with single-vector pooling somewhere:
    // the top-1 by MaxSim differs from the top-1 by mean-vector cosine for
    // at least one query doc (otherwise sim11 degenerates to sim01 here)
    val pooled = byDoc.view.mapValues { vs =>
      val dim = vs.head._2.length
      Array.tabulate(dim)(j => vs.map(_._2(j)).sum / vs.length)
    }.toMap
    val disagrees = qdocs.exists { qd =>
      val maxsimTop = expected.filter(e => e._1 == qd && e._4 == 1L).head._2
      val pooledTop = byDoc.keys.filter(_ != qd).toSeq
        .map(dd => (dd, cos(pooled(qd), pooled(dd))))
        .sortBy { case (dd, c) => (-c, dd) }.head._1
      maxsimTop != pooledTop
    }
    assert(disagrees, "MaxSim never diverged from pooled cosine")
  }

  test("ta19: char entropy recomputes from a driver-side census") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")
        .toLowerCase.replaceAll("\\s+", " ").trim))
    val expected = docs.map { case (id, t) =>
      if (t.isEmpty) (id, 0L, 0L, 0.0)
      else {
        val chars = t.toCharArray.map(_.toString)
        val cd = chars.distinct.sorted
        val len = chars.length
        val h = cd.map { c =>
          val p = chars.count(_ == c).toDouble / len.toDouble
          p * math.log(p)
        }.sum
        (id, len.toLong, cd.length.toLong, round6(-h))
      }
    }.sortBy(_._1)
    val got = TextAnalysis.charEntropyQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expected.toSeq)
    assert(expected.map(_._4).distinct.length > 1, "constant entropy")
    // the native CharEntropy expression must equal the interpreted HOF
    // spec bit-for-bit (the CosineSim cross-validation contract)
    val hof = TextAnalysis.charEntropyHof(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(hof.toSeq == got.toSeq)
  }

  test("sk05: AMS F2 estimate recomputes from a driver-side census") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("text")).collect()
      .map(r => Option(r.getString(0)).getOrElse(""))
    val tf = docs.flatMap(t => tokensOf(t)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exact = tf.values.map(c => c * c).sum
    val counters = (0 until Sketch.AmsCounters).map { i =>
      tf.map { case (term, c) =>
        val d = Integer.parseInt(md5hex(s"$i:$term").take(1), 16)
        if (d % 2 == 0) c else -c
      }.sum
    }
    val est = counters.map(c => c * c).sum.toDouble / Sketch.AmsCounters
    val relErr = round6(math.abs(est - exact.toDouble) / exact.toDouble)
    val got = Sketch.amsF2Query(spark, sf0001).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == exact)
    assert(got(0).getDouble(1) == est)
    assert(got(0).getDouble(2) == relErr)
    // the sketch must be an estimate that is actually in the ballpark
    // (counters=16 => expected relative error sqrt(2/16) ~ 35%)
    assert(relErr < 1.0, s"AMS estimate off by ${relErr * 100}%")
  }

  test("ev12: cadence stats recompute from a driver-side walk") {
    val evs = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = evs.groupBy(_._1).toSeq.map { case (u, es) =>
      val ts = es.sortBy(e => (e._3, e._2)).map(_._3)
      val gaps = ts.zip(ts.drop(1)).map { case (a, b) => b - a }.sorted
      if (gaps.isEmpty) (u, es.length.toLong, None, None, None)
      else (u, es.length.toLong, Some(gaps((gaps.length + 1) / 2 - 1)),
        Some(gaps.last), Some(gaps.sum.toDouble / gaps.length.toDouble))
    }.sortBy(_._1)
    val got = Windows.cadenceQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got.toSeq == expected.toSeq)
    assert(expected.exists(_._3.isDefined), "no user has a gap")
  }

  test("mm07: frame-set Jaccard recomputes from a driver-side chunking") {
    val chunkSize = 64
    val minJ = 0.5
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getString(1)))
    val sigs = docs.map { case (id, t) =>
      id -> t.getBytes("UTF-8").grouped(chunkSize)
        .map(ch => md5hex(new String(ch, "UTF-8"))).toSet
    }.toMap
    val expected = (for {
      (a, sa) <- sigs.toSeq; (b, sb) <- sigs.toSeq if a < b
      ix = (sa & sb).size if ix > 0
      j = round6(ix.toDouble / (sa.size + sb.size - ix).toDouble)
      if j >= minJ
    } yield (a, b, sa.size.toLong, sb.size.toLong, ix.toLong, j))
      .sortBy(t => (t._1, t._2))
    val got = Multimodal.videoNearDupQuery(spark, sf0001, chunkSize, minJ)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == expected)
    assert(expected.nonEmpty, "no near-dup media pair at sf0.001")
    // the operator must see PARTIAL overlap, not just exact copies
    assert(expected.exists(_._6 < 1.0),
      "every pair is an exact frame-set copy — Jaccard untested")
  }

  test("ir09: ANN recall report recomputes from the two retrieval outputs") {
    val k = 5
    val ex = Similarity.bruteForceTopK(spark, sf0001, k, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val ls = Similarity.lshTopK(spark, sf0001, k, 8, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val lsByQ = ls.groupBy(_._1)
    val expected = ex.map(_._1).distinct.sorted.map { q =>
      val exact = ex.filter(_._1 == q)
      val got = lsByQ.getOrElse(q, Array.empty).map(_._2).toSet
      val overlap = exact.count(e => got(e._2)).toLong
      val nn = exact.find(_._3 == 1L).get._2
      val rr = lsByQ.getOrElse(q, Array.empty).find(_._2 == nn)
        .map(t => 1.0 / t._3.toDouble).getOrElse(0.0)
      (q, overlap, overlap.toDouble / k.toDouble, rr)
    }
    val got = Similarity.annRecallQuery(spark, sf0001, k, 8, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == expected.toSeq)
    // the report must measure something: the ANN index misses at least
    // one exact neighbor on this corpus (otherwise eval is vacuous)
    assert(expected.exists(_._3 < 1.0), "LSH recall is perfect — untested")
  }

  test("dq06: orphan counts recompute from driver-side key sets") {
    def keys(t: String, c: String): Array[Long] =
      graft.core.Tables.load(spark, sf0001, t).select(col(c)).collect()
        .filter(!_.isNullAt(0))
        .map(r => r.get(0) match {
          case l: java.lang.Long    => l.longValue
          case i: java.lang.Integer => i.longValue
        })
    val expected = DataQuality.ForeignKeys.map { case (child, fk, parent, pk) =>
      val cks = keys(child, fk)
      val pset = keys(parent, pk).toSet
      val nRows = graft.core.Tables.load(spark, sf0001, child).count()
      (child, fk, parent, nRows, nRows - cks.length,
        cks.count(!pset(_)).toLong)
    }.sortBy(t => (t._1, t._2))
    val got = DataQuality.refIntegrityQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected)
    assert(expected.map(_._4).distinct.length > 1,
      "all children same size — counts untested")
  }

  test("gr03: Adamic-Adar scores recompute from a driver-side pass") {
    val pairs = Dedup.minhashLshPairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairSet = pairs.toSet
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val w = nbrs.collect { case (b, ns) if ns.length >= 2 =>
      b -> round(1.0 / math.log(ns.length.toDouble), 8)
    }
    val wedges = nbrs.toSeq.flatMap { case (b, ns) =>
      for (a <- ns; c <- ns if a < c) yield (a, c, b)
    }
    val expected = wedges.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((a, c), ws) =>
        val bs = ws.map(_._3).sorted
        (a, c, bs.length.toLong, round6(bs.map(w).sum),
          pairSet.contains((a, c)))
      }.sortBy(t => (t._1, t._2))
    val got = Graph.adamicAdarQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.toSeq == expected)
    assert(expected.nonEmpty, "no common-neighbor pair at sf0.001")
  }
}
