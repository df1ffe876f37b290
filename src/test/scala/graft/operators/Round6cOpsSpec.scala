package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the round-6 third-batch operators beyond their
  * DuckDB oracles (q38 / ev08). */
class Round6cOpsSpec extends AnyFunSuite {

  private def events(): Array[(Long, Long, String, Double, Long)] =
    graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))

  test("q38: one row per user; the latest (ts, id) event wins; counts conserve") {
    val ev = events()
    val rows = Relational.latestSnapshot(spark, sf0001).collect()
    val byUser = ev.groupBy(_._1)
    assert(rows.length == byUser.size, "exactly one snapshot row per user")
    rows.foreach { r =>
      val uid = r.getLong(0)
      val es = byUser(uid)
      val latest = es.maxBy(e => (e._5, e._2))
      assert(r.getLong(1) == latest._2, s"user $uid last_event_id")
      assert(r.getString(2) == latest._3, s"user $uid last_type")
      assert(r.getDouble(3) == latest._4, s"user $uid last_value")
      assert(r.getLong(4) == latest._5, s"user $uid last_us")
      assert(r.getLong(5) == es.length.toLong, s"user $uid n_events")
    }
  }

  test("ir06: PMI rows recompute from driver presence sets; band respected") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Text.normText(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").toSet))
    val n = docs.length.toLong
    val df = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
      .filter { case (_, d) => d * 100 >= n * 5 && d * 100 <= n * 95 }
    val rows = Search.pmiCooccurQuery(spark, sf0001).collect()
    assert(rows.nonEmpty, "the default band must produce rows on the corpus")
    rows.foreach { r =>
      val (a, b, nab) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(df.contains(a) && df.contains(b), s"($a,$b) outside the band")
      val expected = docs.count(d => d._2(a) && d._2(b)).toLong
      assert(nab == expected, s"($a,$b) co-occurrence $nab != $expected")
      assert(nab * 100 >= n * 2, s"($a,$b) below min-pair cut")
      val pmi = BigDecimal.valueOf(
        math.log(nab.toDouble * n / (df(a).toDouble * df(b)).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
      assert(r.getDouble(3) == pmi, s"($a,$b) pmi")
    }
  }

  test("sk02: CMS error is one-sided and the probe rows are the true top-k") {
    val rows = Sketch.cmsHeavyQuery(spark, sf0001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS must never undercount: ${r.getString(0)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    val counts = graft.core.Tables.documents(spark, sf0001)
      .select(graft.functions.Text.normText(col("text")).as("t"))
      .collect().flatMap(_.getString(0).split(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(20)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == expected)
  }

  test("cl03: predictions equal a brute-force kNN vote; split is 80/20-ish") {
    def r6(x: Double): Double = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val vecs = graft.core.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def h10(id: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16) % 10
    }
    val train = vecs.filter(v => h10(v._1) < 8)
    val test = vecs.filter(v => h10(v._1) >= 8)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = Classifier.knnClassifierQuery(spark, sf0001).collect()
    assert(rows.length == test.length, "one row per test vector")
    val byId = rows.map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4))).toMap
    test.foreach { case (qid, qv, qlabel) =>
      val nn = train.map(t => (r6(cos(qv, t._2)), t._1, t._3))
        .sortBy(t => (-t._1, t._2)).take(5)
      val votes = nn.groupBy(_._3).view.mapValues(_.length.toLong).toSeq
      val (predLabel, nVotes) = votes.minBy { case (l, c) => (-c, l) }
      val got = byId(qid)
      assert(got._1 == qlabel && got._2 == predLabel && got._3 == nVotes &&
        got._4 == (predLabel == qlabel), s"vec $qid: $got vs ($predLabel, $nVotes)")
    }
  }

  test("sa09: no near-dup cluster ever spans two splits; coverage is total") {
    val rows = Curation.clusterSplitQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length.toLong == nDocs, "every document assigned exactly once")
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $rep spans splits: ${members.map(_._3).distinct.toSeq}")
    }
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train") > rows.length / 2, s"split sizes: $bySplit")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sk03: estimates recompute from driver md5 signatures; truth is exact") {
    val texts = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] =
      if (t.length < 5) Set(t.substring(0, math.min(t.length, 5)))
      else (0 to t.length - 5).map(i => t.substring(i, i + 5)).toSet
    def mh(j: Int, sh: Set[String]): Long = {
      val P = 2147483647L
      sh.map { g =>
        val base = java.lang.Long.parseLong(md5hex(g).take(15), 16) % P
        (base * (2 * j + 1) + 40503L * j) % P
      }.min
    }
    val rows = Sketch.minhashEstimateQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
      val inter = (sa & sb).size
      val truth = inter.toDouble / (sa.size + sb.size - inter)
      assert(r.getDouble(2) == truth, s"($a,$b) true jaccard")
      val matches = (0 until Sketch.MhK).count(j => mh(j, sa) == mh(j, sb))
      assert(r.getLong(3) == matches.toLong, s"($a,$b) mh matches")
      assert(r.getDouble(4) == matches.toDouble / Sketch.MhK, s"($a,$b) est")
    }
  }

  test("ev09: EWMA recomputes from the daily matrix; flag reads the rounded ratio") {
    def r6(x: Double): Double = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val daily = events().groupBy(e => (e._3, e._5 / 86400000000L)).view
      .mapValues(_.length.toLong).toMap
    val rows = Windows.ewmaAnomalyQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val series = daily.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    val w = (0 until Windows.EwmaHorizon).map(h =>
      math.pow(1.0 - Windows.EwmaAlpha, h))
    rows.foreach { r =>
      val (ty, day, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(n == daily((ty, day)))
      val days = series(ty)
      val idx = days.indexOf(day)
      val lags = (0 until Windows.EwmaHorizon).flatMap { h =>
        if (idx - h >= 0) Some((daily((ty, days(idx - h))).toDouble, w(h)))
        else None
      }
      var num = 0.0; var den = 0.0
      lags.foreach { case (x, wt) => num += x * wt; den += wt }
      val ewma = r6(num / den)
      assert(r.getDouble(3) == ewma, s"($ty,$day) ewma")
      val ratio = r6(n.toDouble / ewma)
      assert(r.getDouble(4) == ratio, s"($ty,$day) ratio")
      assert(r.getBoolean(5) == (ratio > 2.0 || ratio < 0.5), s"($ty,$day) flag")
    }
  }

  test("cl04: the scorecard aggregates cl03's own predictions exactly") {
    def r6(x: Double): Double = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val pred = Classifier.knnClassifierQuery(spark, sf0001).collect()
      .map(r => (r.getInt(1), r.getInt(2)))
    val rows = Classifier.confusionReportQuery(spark, sf0001).collect()
    val labels = (pred.map(_._1) ++ pred.map(_._2)).distinct.sorted
    assert(rows.map(_.getInt(0)).toSeq == labels.toSeq)
    rows.foreach { r =>
      val c = r.getInt(0)
      val nTrue = pred.count(_._1 == c).toLong
      val nPred = pred.count(_._2 == c).toLong
      val tp = pred.count(p => p._1 == c && p._2 == c).toLong
      assert(r.getLong(1) == nTrue && r.getLong(2) == nPred && r.getLong(3) == tp)
      if (nPred > 0) assert(r.getDouble(4) == r6(tp.toDouble / nPred))
      else assert(r.isNullAt(4))
      if (nTrue > 0) assert(r.getDouble(5) == r6(tp.toDouble / nTrue))
      else assert(r.isNullAt(5))
      if (nPred > 0 && nTrue > 0) {
        val (p, rc) = (r6(tp.toDouble / nPred), r6(tp.toDouble / nTrue))
        if (p + rc > 0) assert(r.getDouble(6) == r6(2.0 * p * rc / (p + rc)))
        else assert(r.isNullAt(6))
      }
    }
  }

  test("q39: melt triples the wide rows and preserves every measure value") {
    val wide = Relational.unpivotLineitem(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val li = graft.core.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val flags = li.map(_._1).distinct
    assert(wide.size == flags.length * 3)
    flags.foreach { f =>
      val rows = li.filter(_._1 == f)
      assert(wide((f, "n_lines")) == rows.length.toLong)
      assert(wide((f, "n_orders")) == rows.map(_._2).distinct.length.toLong)
      assert(wide((f, "n_parts")) == rows.map(_._3).distinct.length.toLong)
    }
  }

  test("ir07: positions, counts and snippets recompute from driver strings") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Text.normText(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val term = Search.KwicTerm
    val rows = Search.kwicQuery(spark, sf0001).collect()
    val expectedIds = docs.filter(_._2.contains(term)).keySet
    assert(rows.map(_.getLong(0)).toSet == expectedIds && rows.nonEmpty)
    rows.foreach { r =>
      val t = docs(r.getLong(0))
      val pos = t.indexOf(term) + 1
      assert(r.getLong(1) == pos.toLong)
      // NON-overlapping count — the operator's replace-length contract
      assert(r.getLong(2) ==
        ((t.length - t.replace(term, "").length) / term.length).toLong)
      val start = math.max(1, pos - Search.KwicContext) - 1
      val len = Search.KwicContext * 2 + term.length
      assert(r.getString(3) == t.substring(start, math.min(t.length, start + len)))
    }
  }

  test("gr02: triangles and clustering recompute from the pair graph") {
    val pairs = Dedup.minhashLshPairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val rows = Graph.triangleCountQuery(spark, sf0001).collect()
    assert(rows.length == adj.size && rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getLong(0)
      val ns = adj(v)
      assert(r.getLong(1) == ns.size.toLong, s"node $v degree")
      val tri = ns.toSeq.combinations(2).count(p => adj(p.head)(p(1)))
      assert(r.getLong(2) == tri.toLong, s"node $v triangles")
      if (ns.size >= 2) {
        val cc = BigDecimal.valueOf(2.0 * tri / (ns.size.toLong * (ns.size - 1L)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
        assert(r.getDouble(3) == cc, s"node $v clustering")
      } else assert(r.getDouble(3) == 0.0)
    }
  }

  test("ev10: bounce report recomputes from a brute-force session walk") {
    def r6(x: Double): Double = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val gapUs = 1800L * 1000000L
    case class Ses(entry: String, n: Long, durUs: Long)
    val sessions = events().groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._5, e._2)).toList
      val out = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(String, Long)]]
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev == Long.MinValue || e._5 - prev > gapUs)
          out += scala.collection.mutable.ArrayBuffer.empty
        out.last += ((e._3, e._5))
        prev = e._5
      }
      out.map(s => Ses(s.head._1, s.length.toLong, s.last._2 - s.head._2))
    }.toSeq
    val rows = Windows.sessionBounceQuery(spark, sf0001).collect()
    val byEntry = sessions.groupBy(_.entry)
    assert(rows.map(_.getString(0)).toSet == byEntry.keySet && rows.nonEmpty)
    rows.foreach { r =>
      val ss = byEntry(r.getString(0))
      assert(r.getLong(1) == ss.length.toLong)
      assert(r.getLong(2) == ss.count(_.n == 1L).toLong)
      assert(r.getDouble(3) == r6(ss.count(_.n == 1L).toDouble / ss.length))
      assert(r.getDouble(4) == r6(ss.map(_.n).sum.toDouble / ss.length))
      assert(r.getDouble(5) ==
        r6(ss.map(_.durUs).sum.toDouble / ss.length / 1000000.0))
    }
  }

  test("sk04: sampled and exact quantiles recompute from a driver sort") {
    val ev = events().map(e => (e._3, e._2, e._4)) // (type, event_id, value)
    def h32(id: Long): Long = java.lang.Long.parseLong(
      md5hex(id.toString).take(8), 16)
    val cut = (Sketch.QuantileSampleRate * 4294967296.0).toLong
    def q(rows: Seq[(Long, Double)], num: Int, den: Int): Double = {
      val sorted = rows.sortBy(r => (r._2, r._1))
      val n = sorted.length.toLong
      sorted(((n * num + num) / den - 1).toInt)._2
    }
    val rows = Sketch.sampleQuantilesQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ty = r.getString(0)
      val all = ev.filter(_._1 == ty).map(e => (e._2, e._3)).toSeq
      val smp = all.filter(e => h32(e._1) < cut)
      assert(r.getLong(1) == all.length.toLong && r.getLong(2) == smp.length.toLong)
      assert(r.getDouble(3) == q(all, 1, 2) && r.getDouble(4) == q(smp, 1, 2))
      assert(r.getDouble(5) == q(all, 9, 10) && r.getDouble(6) == q(smp, 9, 10))
      assert(r.getDouble(7) == q(all, 99, 100) && r.getDouble(8) == q(smp, 99, 100))
    }
  }

  test("pl04: the dataset card aggregates its component operators exactly") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        graft.functions.Text.normText(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val kept = Curation.curationQuery(spark, sf0001).collect()
      .filter(_.getString(1) == "ok").map(_.getLong(0)).toSet
    val dup = Dedup.dupClusters(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    val split = Curation.clusterSplitQuery(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val rows = Pipeline.datasetCardQuery(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == docs.map(_._2).distinct.sorted.toSeq)
    rows.foreach { r =>
      val src = r.getString(0)
      val ds = docs.filter(_._2 == src)
      def tok(t: String): Long =
        if (t.isEmpty) 0L else t.count(_ == ' ').toLong + 1L
      assert(r.getLong(1) == ds.length.toLong, s"$src n_docs")
      assert(r.getLong(2) == ds.map(d => tok(d._3)).sum, s"$src n_tokens")
      assert(r.getLong(3) == ds.map(_._3.length.toLong).sum, s"$src n_chars")
      assert(r.getLong(4) == ds.count(d => kept(d._1)).toLong, s"$src n_kept")
      assert(r.getLong(5) == ds.count(d => dup(d._1)).toLong, s"$src n_dup")
      assert(r.getLong(6) == ds.count(d => split(d._1) == "train").toLong, s"$src train")
      assert(r.getLong(7) == ds.count(d => split(d._1) == "val").toLong, s"$src val")
      assert(r.getLong(8) == ds.count(d => split(d._1) == "test").toLong, s"$src test")
    }
  }

  test("ev08: trigram counts equal a brute-force session walk; top-k ordered") {
    val gapUs = 1800L * 1000000L
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    events().groupBy(_._1).values.foreach { es =>
      val sorted = es.sortBy(e => (e._5, e._2))
      // session index via the same gap rule, then trigrams within sessions
      var sess = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { e =>
        if (prev == Long.MinValue || e._5 - prev > gapUs) sess += 1
        prev = e._5
        (e._3, sess)
      }
      tagged.sliding(3).foreach {
        case Array((t1, s1), (t2, _), (t3, s3)) if s1 == s3 =>
          val p = s"$t1>$t2>$t3"
          counts(p) = counts.getOrElse(p, 0L) + 1
        case _ =>
      }
    }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = Windows.pathNgramsQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(expected.nonEmpty && got == expected,
      s"expected $expected\ngot $got")
  }

  test("q31: embedded bounds audit — exact columns match q42, all flags 1") {
    // q31 carries its bounds check IN the output now (round-13): exact
    // columns must equal the q42 twin's, and every *_ok flag must be 1
    // (the sketch landed inside its documented bound). The same contract
    // the DuckDB oracle asserts via hash match.
    val exact = Relational.exactStats(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val audited = Relational.approxStats(spark, sf0001).collect()
    assert(audited.map(_.getString(0)).toSet == exact.keySet)
    audited.foreach { r =>
      val flag = r.getString(0)
      val (nParts, nOrders, median) = exact(flag)
      assert(r.getLong(1) == nParts && r.getLong(2) == nOrders &&
        r.getDouble(3) == median,
        s"$flag exact columns drifted from the q42 twin: $r")
      assert(r.getLong(4) == 1L, s"$flag parts_ok=0 (HLL++ outside 5*rsd)")
      assert(r.getLong(5) == 1L, s"$flag orders_ok=0 (HLL++ outside 5*rsd)")
      assert(r.getLong(6) == 1L, s"$flag median_ok=0 (outside 0.49..0.51 ranks)")
    }
  }

  test("q31: the in-bounds flag logic detects an out-of-bounds estimate") {
    // the audit must be a live gate, not a tautology: feed the PRODUCTION
    // flag expressions (the very ones approxStats emits — not a re-typed
    // copy that could diverge) deliberately-bad estimates and they must
    // emit 0
    import spark.implicits._
    val hll = Seq((100L, 112L), (100L, 109L)).toDF("exact", "est")
      .select(Relational.hllWithinRsd(col("est"), col("exact")).as("ok"))
    assert(hll.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val med = Seq((5.0, 1.0, 4.0), (3.0, 1.0, 4.0), (0.5, 1.0, 4.0))
      .toDF("est", "lo", "hi")
      .select(Relational.withinRankBounds(col("est"), col("lo"), col("hi")).as("ok"))
    assert(med.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 0L))
  }
}
