package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the corpus-curation operators beyond their DuckDB
  * oracles (ta07 / dd08 / sa01 / ir01). */
class CorpusOpsSpec extends AnyFunSuite {

  test("ta07: unigram log-probs are negative and cover every document") {
    val rows = TextAnalysis.unigramLogProbQuery(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs)
    // every token probability is < 1 (vocab has >1 distinct word), so the
    // mean log-prob must be strictly negative
    assert(rows.forall(r => r.getDouble(2) < 0.0))
    assert(rows.forall(r => r.getLong(1) > 0))
  }

  test("dd08: contamination flag consistent, benchmark docs excluded") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val benchIds = docs.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = Dedup.decontaminate(spark, sf0001).collect()
    assert(rows.length == docs.count() - benchIds.size)
    assert(rows.forall(r => !benchIds.contains(r.getLong(0))))
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(rows.forall(r => r.getBoolean(3) == (r.getLong(2) > 0)))
    // the synthetic corpus repeats spans across sources, so the pass must
    // actually flag something (otherwise it silently checks nothing)
    assert(rows.exists(_.getBoolean(3)))
  }

  test("sa01: per-stratum counts exact, ranks contiguous, deterministic") {
    val df = Curation.stratifiedSampleQuery(spark, sf0001, perStratum = 40)
    val rows = df.collect()
    val strata = graft.core.Tables.documents(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length.toLong }
    assert(got == strata.map { case (l, n) => l -> math.min(40L, n) })
    got.keys.foreach { l =>
      val ranks = rows.filter(_.getString(1) == l).map(_.getLong(2)).sorted
      assert(ranks.sameElements(1L to ranks.length))
    }
    assert(df.collect().map(_.toString).sameElements(rows.map(_.toString)))
  }

  test("dd09: verdicts match a local recomputation from fingerprints") {
    import org.apache.spark.sql.functions.{col, md5}
    val rows = Dedup.incrementalDedup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) == (!r.getBoolean(1) && !r.getBoolean(2)), r.toString)
    }
    // independent recomputation driver-side
    val fps = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        md5(graft.functions.Text.normText(col("text"))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1).drop(3).toLong, r.getString(2)))
    val store = fps.filter(_._2 < 10).map(_._3).toSet
    val batch = fps.filter(_._2 >= 10)
    val firstIn = batch.groupBy(_._3).map { case (fp, ds) => fp -> ds.map(_._1).min }
    val expected = batch.map { case (id, _, fp) =>
      id -> (store.contains(fp), id != firstIn(fp))
    }.toMap
    assert(rows.length == batch.length)
    rows.foreach { r =>
      assert((r.getBoolean(1), r.getBoolean(2)) == expected(r.getLong(0)), r.toString)
    }
  }

  test("ir02: pruned df, bounded postings, unique sorted terms") {
    val rows = Search.invertedIndex(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      assert(df >= 25 && r.getLong(2) >= df) // total_tf >= df
      val postings = r.getString(3).split(",")
      assert(postings.length == math.min(df, 8L), r.toString)
      assert(postings.map(_.toLong).sorted.sameElements(postings.map(_.toLong)))
    }
    val terms = rows.map(_.getString(0))
    assert(terms.distinct.length == terms.length)
    assert(terms.sorted.sameElements(terms))
  }

  test("ta09: repetition ratios match a local recomputation") {
    val texts = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Text.normText(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.repetitionQuery(spark, sf0001).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      val w = t.split(" ", -1)
      def grams(n: Int) = (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" "))
      assert(r.getLong(1) == t.length)
      if (w.length >= 2) {
        val counts = grams(2).groupBy(identity).map { case (g, o) => g -> o.length }
        val (topG, topC) = counts.toSeq.minBy { case (g, c) => (-c, g) }
        assert(r.getString(2) == topG, s"doc ${r.getLong(0)}")
        assert(r.getDouble(3) == topC.toLong * topG.length.toDouble / t.length)
      }
      if (w.length >= 3) {
        val counts = grams(3).groupBy(identity).map { case (g, o) => g -> o.length }
        val dup = counts.collect { case (g, c) if c > 1 => c.toLong * g.length }.sum
        assert(r.getDouble(4) == dup.toDouble / t.length, s"doc ${r.getLong(0)}")
      }
    }
    // the synthetic corpus repeats heavily — the scores must not be vacuous
    assert(rows.exists(_.getDouble(4) > 0.0))
  }

  test("ta10: chunks cover every token, overlap by width-stride, reassemble") {
    val texts = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Text.normText(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.chunkQuery(spark, sf0001).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == texts.keySet)
    byDoc.foreach { case (id, cs) =>
      val w = texts(id).split(" ", -1)
      val sorted = cs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(sorted.indices))
      assert(sorted.length == (w.length - 1) / 24 + 1)
      sorted.foreach { c =>
        val start = c.getInt(1) * 24
        val exp = w.slice(start, start + 32)
        assert(c.getLong(2) == exp.length)
        assert(c.getString(3) == exp.mkString(" "), s"doc $id chunk ${c.getInt(1)}")
      }
      // stride-prefixes of the chunks reassemble the original document
      val rebuilt = sorted.flatMap(c =>
        c.getString(3).split(" ", -1).take(24)).take(w.length)
      assert(rebuilt.sameElements(w.take(rebuilt.length)))
    }
  }

  test("ta11: offsets are the exact global prefix sum; window spans consistent") {
    val rows = Curation.packWindowsQuery(spark, sf0001).collect()
    val nTok = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        graft.functions.Text.tokenCount(graft.functions.Text.normText(col("text"))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == nTok.size)
    var expected = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      val n = nTok(r.getLong(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == expected, s"doc ${r.getLong(0)}")
      if (n > 0) {
        assert(r.getLong(3) == expected / 256)
        assert(r.getLong(4) == (expected + n - 1) / 256)
        assert(r.getLong(5) == r.getLong(4) - r.getLong(3) + 1)
      } else assert(r.getLong(5) == 0L)
      expected += n
    }
    // docs longer than one window must actually straddle boundaries
    assert(rows.exists(_.getLong(5) > 1))
  }

  test("sa03: hash sample matches a local md5 recomputation, rate on target") {
    val rows = Curation.hashSampleQuery(spark, sf0001).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(id: Long): Long = {
      md.reset()
      val d = md.digest(id.toString.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val all = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = all.filter(id => h32(id) < 644245094L).toSet
    assert(rows.map(_.getLong(0)).toSet == expected)
    rows.foreach(r => assert(h32(r.getLong(0)) == r.getLong(3)))
    // md5 is uniform: 500 docs at rate .15 => ~75 expected, binomial sd ~8
    assert(rows.length > 40 && rows.length < 115, s"${rows.length} sampled")
  }

  test("ev02: offsets nonnegative, day-0 equals cohort size, users conserved") {
    val rows = Windows.retentionQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 0L))
    // every cohort has a day-0 row and it is its largest count (each member
    // is by definition active on their first day)
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (c, rs) =>
      val day0 = rs.find(_.getLong(1) == 0L)
      assert(day0.isDefined, s"cohort $c missing day-0")
      assert(rs.forall(_.getLong(2) <= day0.get.getLong(2)), s"cohort $c")
    }
    // cohort sizes sum to the distinct-user count
    val nUsers = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id")).distinct().count()
    assert(byCohort.values.map(_.find(_.getLong(1) == 0L).get.getLong(2)).sum == nUsers)
  }

  test("sa04: mixture sample respects per-domain rates and the hash cut") {
    val rows = Curation.mixtureSampleQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(id: Long): Long = {
      md.reset()
      val d = md.digest(id.toString.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    // every kept doc's hash is under its domain's cut; rates are min(1, w/2)
    val docs = graft.core.Tables.documents(spark, sf0001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.values.sum.toDouble
    def rate(src: String): Double = {
      val target = (src.drop(3).toLong % 4 + 1).toDouble / 50.0
      math.min(1.0, target / (docs(src) / total) * 0.5)
    }
    rows.foreach { r =>
      val expected = rate(r.getString(1))
      assert(r.getDouble(2) == expected, s"rate for ${r.getString(1)}")
      assert(h32(r.getLong(0)).toDouble < expected * 4294967296.0, r.toString)
    }
    // a domain with weight >= 2 keeps everything (rate clamps to 1)
    val full = docs.keys.filter(s => rate(s) >= 1.0)
    val kept = rows.groupBy(_.getString(1)).map { case (s, rs) => s -> rs.length.toLong }
    full.foreach(s => assert(kept.getOrElse(s, 0L) == docs(s), s"domain $s"))
  }

  test("sa05: shards partition the corpus; positions contiguous per shard") {
    val rows = Curation.shardAssignQuery(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs)
    assert(rows.map(_.getLong(0)).distinct.length == nDocs)
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 8))
    rows.groupBy(_.getLong(1)).foreach { case (sh, rs) =>
      val ps = rs.map(_.getLong(2)).sorted
      assert(ps.sameElements(0L until ps.length), s"shard $sh positions")
    }
    // md5 is uniform: no shard should be pathologically skewed (>2x mean)
    val sizes = rows.groupBy(_.getLong(1)).values.map(_.length)
    assert(sizes.max < 2 * (nDocs / 8).toInt, s"shard sizes: $sizes")
  }

  test("ev03: transition probabilities normalize; pair count conserved") {
    val rows = Windows.transitionsQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // per from_type, probabilities sum to 1 (exact sum of n/total)
    rows.groupBy(_.getString(0)).foreach { case (f, rs) =>
      val total = rs.map(_.getLong(2)).sum
      rs.foreach(r => assert(r.getDouble(3) == r.getLong(2).toDouble / total))
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-9, s"from $f")
    }
    // total transitions = total events - distinct users (each user's chain
    // has length n_events - 1)
    val ev = graft.core.Tables.events(spark, sf0001)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("ta12: bigram log-probs negative, bounded by zero, count = tokens-1") {
    val rows = TextAnalysis.bigramLogProbQuery(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) < 0.0) // every context has >1 continuation here
    }
    // n_bigrams per doc = token count - 1
    val toks = TextAnalysis.tokenStatsQuery(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == toks(r.getLong(0)) - 1, r.toString))
  }

  test("ta13: BPE pair counts descend, pairs are 2 chars, top pair plausible") {
    val rows = TextAnalysis.bpePairsQuery(spark, sf0001).collect()
    assert(rows.length == 50)
    rows.foreach(r => assert(r.getString(0).length == 2, r.toString))
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // local recomputation of the top pair's count
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { t =>
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")
        .filter(_.length >= 2)
        .foreach(w => w.sliding(2).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + 1))
    }
    val top = rows.head
    assert(counts(top.getString(0)) == top.getLong(1))
    assert(counts.values.max == top.getLong(1))
  }

  test("dd10: matrix pair total equals the verified near-dup pair count") {
    val matrix = Dedup.dupSourceMatrix(spark, sf0001).collect()
    val nPairs = Dedup.minhashLshPairs(spark, sf0001).count()
    assert(matrix.map(_.getLong(2)).sum == nPairs)
    // canonical upper-triangular keys
    matrix.foreach(r => assert(r.getString(0) <= r.getString(1), r.toString))
    assert(matrix.nonEmpty)
  }

  test("ev04: z-score baseline matches a local recomputation of the frame") {
    val rows = Windows.rollingZscoreQuery(spark, sf0001).collect()
    val nEvents = graft.core.Tables.events(spark, sf0001).count()
    assert(rows.length == nEvents)
    // each user's first event has an empty trailing frame => null stats
    val events = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("value"), col("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byUser = events.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._4, e._2))
    }
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    byUser.foreach { case (u, es) =>
      val first = got((u, es.head._2))
      assert(first.isNullAt(2) && first.isNullAt(3), s"user $u head")
      // spot-check the 12th event of each user (full 10-element frame)
      if (es.length > 11) {
        val frame = es.slice(1, 11).map(e => math.round(e._3 * 100))
        val e12 = es(11)
        val n = frame.length.toLong
        val mu = (frame.sum.toDouble / n.toDouble) / 100.0
        val r = got((u, e12._2))
        assert(r.getDouble(2) == mu, s"user $u mu")
      }
    }
  }

  test("writeCurated: source-partitioned layout, pruned reads, kept set exact") {
    val out = "target/tmp-curated"
    Curation.writeCurated(spark, sf0001, out)
    // one directory per source, hive-style
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("source="))
    val nSources = graft.core.Tables.documents(spark, sf0001)
      .select("source").distinct().count()
    assert(dirs.length.toLong <= nSources && dirs.nonEmpty, dirs.mkString(","))
    // reading one source prunes all other partitions at planning time
    val oneSrc = dirs.head.stripPrefix("source=")
    val pruned = spark.read.parquet(out).filter(col("source") === oneSrc)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains(s"PartitionFilters: [isnotnull(source"), plan)
    // round trip: exactly the ta06 'ok' set survives
    val expected = Curation.curationQuery(spark, sf0001)
      .filter(col("reason") === "ok").count()
    assert(spark.read.parquet(out).count() == expected)
  }

  test("dd11: untouched docs keep their fingerprint; spans bound removals") {
    val rows = Dedup.substringDedup(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs)
    // corpus repeats spans across sources (dd08 proves it), so the pass
    // must actually rewrite something
    assert(rows.exists(_.getLong(1) > 0))
    // every span is at least n=8 tokens after merging
    rows.filter(_.getLong(1) > 0).foreach { r =>
      assert(r.getLong(2) >= 8 * r.getLong(1), r.toString)
    }
    // a doc with zero spans is untouched: cleaned md5 == ta04 fingerprint
    val fp = TextAnalysis.fingerprintQuery(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val untouched = rows.filter(_.getLong(1) == 0)
    assert(untouched.nonEmpty)
    untouched.foreach(r => assert(r.getString(3) == fp(r.getLong(0)), r.toString))
    // a doc with spans is NOT untouched
    rows.filter(_.getLong(1) > 0)
      .foreach(r => assert(r.getString(3) != fp(r.getLong(0)), r.toString))
  }

  test("ir03: exactly k terms per doc, descending scores, tf-consistent") {
    val rows = Search.tfIdfTopTerms(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length == 5 * nDocs)
    rows.groupBy(_.getLong(0)).foreach { case (d, rs) =>
      assert(rs.map(_.getLong(3)).sorted.sameElements(1L to 5L), s"doc $d")
      val byRank = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"doc $d")
    }
    // every score is nonnegative (df <= N => ln(N/df) >= 0)
    assert(rows.forall(_.getDouble(2) >= 0.0))
  }

  test("dq01/dq02: profile totals consistent; clean warehouse passes checks") {
    val prof = DataQuality.profileOrders(spark, sf0001).collect()
    assert(prof.length == 6)
    val nOrders = graft.core.Tables.orders(spark, sf0001).count()
    prof.foreach { r =>
      assert(r.getLong(1) == nOrders, r.toString)         // n_rows
      assert(r.getLong(2) <= nOrders, r.toString)         // nulls bounded by rows
      assert(r.getLong(3) <= nOrders - r.getLong(2), r.toString) // distinct <= non-null
    }
    val keyRow = prof.find(_.getString(0) == "o_orderkey").get
    assert(keyRow.getLong(2) == 0 && keyRow.getLong(3) == nOrders) // PK: no nulls, all distinct
    val checks = DataQuality.constraintChecks(spark, sf0001).collect()
    assert(checks.length == 6)
    // the synthetic warehouse is referentially intact and in-domain
    checks.foreach(r => assert(r.getBoolean(2), r.toString))
  }

  test("ir01: top-k size, descending rounded scores, positive-tf head") {
    val rows = Search.bm25TopK(spark, sf0001).collect()
    assert(rows.length == Search.TopK)
    val scores = rows.map(_.getDouble(4))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the head of the ranking must actually contain query terms
    val head = rows.head
    assert((1 to 3).map(head.getLong).sum > 0 && head.getDouble(4) > 0.0)
  }

  test("ta14: overlap matrix matches a local bigram/tf recomputation") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.trim.replaceAll("\\s+", " ")))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bigrams = bySrc.map { case (s, texts) =>
      s -> texts.flatMap { t =>
        val w = t.split(" "); w.zip(w.tail).map { case (a, b) => s"$a $b" }
      }.toSet
    }
    val tf = bySrc.map { case (s, texts) =>
      s -> texts.flatMap(_.split(" ").toSeq).groupBy(identity)
        .map { case (w, ws) => w -> ws.size.toLong }
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val srcs = bySrc.keys.toSeq.sorted
    val want = for {
      a <- srcs; b <- srcs if a < b
      inter = (bigrams(a) & bigrams(b)).size
    } yield {
      val jac = inter.toDouble / (bigrams(a).size + bigrams(b).size - inter)
      val dot = tf(a).map { case (w, c) => c * tf(b).getOrElse(w, 0L) }.sum.toDouble
      def n2(m: Map[String, Long]) = math.sqrt(m.values.map(c => (c * c).toDouble).sum)
      (a, b, r6(jac), r6(dot / (n2(tf(a)) * n2(tf(b)))))
    }
    val got = TextAnalysis.sourceOverlapQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want)
    // every source pair overlaps (the inner intersect joins drop nothing),
    // and neither signal is saturated or empty
    assert(want.size == srcs.size * (srcs.size - 1) / 2)
    assert(want.forall { case (_, _, j, c) => j > 0.0 && j < 1.0 && c > 0.0 && c <= 1.0 })
  }

  test("ta15: planted PII is found, Luhn separates, redaction is total") {
    val rows = TextAnalysis.piiQuery(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs)
    def cnt(i: Int) = rows.map(_.getLong(i))
    // counts follow the fixture residue classes exactly
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 1 else 0), s"emails doc $id")
      assert(r.getLong(2) == (if (id % 4 == 0) 1 else 0), s"phones doc $id")
      assert(r.getLong(3) == (if (id % 5 == 0) 1 else 0), s"ips doc $id")
      assert(r.getLong(4) == (if (id % 6 == 0) 1 else 0), s"cards doc $id")
      assert(r.getLong(5) <= r.getLong(4), s"valid>seen doc $id")
      assert(r.getBoolean(7) == (r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) > 0))
    }
    // Luhn validation must have real positives AND real negatives —
    // otherwise the check is vacuous
    assert(cnt(5).sum > 0 && cnt(5).sum < cnt(4).sum,
      s"luhn: ${cnt(5).sum} valid of ${cnt(4).sum} cards")
    // a doc with every class planted (id divisible by 60) exists at sf0.001
    assert(rows.exists(r => r.getLong(0) % 60 == 0))
  }

  test("sa06: DSIR log-ratios favor the target slice and match a local recompute") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq))
    val cr = docs.flatMap(_._3).groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val ct = docs.filter(_._2 == "src0").flatMap(_._3).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val (nr, nt, v) = (cr.values.sum, ct.values.sum, cr.size.toLong)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val want = docs.map { case (id, _, ws) =>
      val score = ws.groupBy(identity).map { case (w, g) =>
        g.size * (math.log((ct.getOrElse(w, 0L) + 1).toDouble / (nt + v)) -
          math.log((cr(w) + 1).toDouble / (nr + v)))
      }.sum
      (id, ws.size.toLong, r4(score))
    }.sortBy(_._1)
    val got = Curation.dsirWeightQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == want.toSeq)
    assert(got.forall(t => t._4 == (t._3 >= 0.0)))
    // the importance weights must actually separate: target docs skew
    // positive vs the rest (that's the whole point of DSIR)
    val bySrc = docs.map(d => d._1 -> d._2).toMap
    val (tgt, rest) = got.partition(t => bySrc(t._1) == "src0")
    def mean(xs: Array[Double]) = xs.sum / xs.length
    assert(mean(tgt.map(_._3)) > mean(rest.map(_._3)))
    assert(got.exists(_._4) && got.exists(!_._4))
  }
}
