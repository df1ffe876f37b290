package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the round-6 operators beyond their DuckDB oracles
  * (ev05 / dd14 / dd15 / dq03 / sa07 / ir04 / ta16 / mm05). */
class Round6OpsSpec extends AnyFunSuite {

  test("ev05: events conserved, session indexes contiguous, gaps respected") {
    val rows = Windows.sessionizeQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nEvents = graft.core.Tables.events(spark, sf0001).count()
    assert(rows.map(_.getLong(4)).sum == nEvents, "every event in exactly one session")
    val gapUs = 1800L * 1000000L
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      // indexes are 1..n with no holes
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq, s"user $u")
      // spans are well-formed and consecutive sessions are separated by > gap
      sorted.foreach(r => assert(r.getLong(2) <= r.getLong(3), s"user $u span"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(3) > gapUs,
            s"user $u: sessions ${a.getLong(1)} and ${b.getLong(1)} closer than the gap")
        case _ =>
      }
    }
  }

  test("dd14: kept doc is a max-n_chars member of its cluster; sizes match dd05") {
    val kept = Dedup.canonicalSelect(spark, sf0001).collect()
    assert(kept.nonEmpty)
    val clusters = Dedup.dupClusters(spark, sf0001).collect()
      .groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.map(_.getLong(0)).toSet }
    val chars = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.map(_.getLong(0)).toSet == clusters.keySet, "one row per cluster")
    kept.foreach { r =>
      val (cid, keptId, keptChars, n) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val members = clusters(cid)
      assert(members.contains(keptId))
      assert(n == members.size)
      assert(keptChars == members.map(chars).max, s"cluster $cid keeps the longest")
      assert(keptId == members.filter(m => chars(m) == keptChars).min,
        s"cluster $cid ties break on min doc_id")
    }
  }

  test("dd15: weights in (0,1], singletons 1.0, cluster weights sum to ~1") {
    val rows = Dedup.softDedup(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs, "no document dropped")
    rows.foreach { r =>
      val w = r.getDouble(2)
      assert(w > 0.0 && w <= 1.0)
      if (r.isNullAt(1)) assert(w == 1.0, "singleton weight is exactly 1")
    }
    rows.filter(!_.isNullAt(1)).groupBy(_.getLong(1)).foreach { case (c, rs) =>
      assert(math.abs(rs.map(_.getDouble(2)).sum - 1.0) < 1e-9,
        s"cluster $c contributes ~1 doc in expectation")
    }
  }

  test("dq03: features partition the corpus; PSI terms are finite") {
    val rows = DataQuality.driftPsiQuery(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    val byFeature = rows.groupBy(_.getString(0))
    assert(byFeature.keySet == Set("len", "lang", "source"))
    byFeature.foreach { case (f, rs) =>
      // each feature's buckets cover every document exactly once, per side
      assert(rs.map(_.getLong(2)).sum + rs.map(_.getLong(3)).sum == nDocs, f)
      rs.foreach(r => assert(!r.getDouble(4).isNaN && !r.getDouble(4).isInfinite, f))
    }
  }

  test("sa07: temperature shares normalize and flatten the distribution") {
    val rows = Curation.temperatureMixQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4, "shares sum to 1")
    // sqrt-flattening boosts below-average sources and shrinks above-average
    // ones: boost is monotone DECREASING in natural share
    val sorted = rows.sortBy(_.getDouble(2))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        if (a.getDouble(2) < b.getDouble(2))
          assert(a.getDouble(4) >= b.getDouble(4), "flattening is monotone")
      case _ =>
    }
  }

  test("ir04: conjunctive semantics — every hit contains all terms, ranked by total tf") {
    val rows = Search.booleanRetrieval(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tfs = (1 to Search.QueryTerms.length).map(r.getLong)
      assert(tfs.forall(_ > 0), "AND semantics")
      assert(r.getLong(r.length - 1) == tfs.sum, "total_tf is the sum")
    }
    val totals = rows.map(r => r.getLong(r.length - 1))
    assert(totals.sameElements(totals.sorted.reverse), "descending rank")
  }

  test("ta16: lexical stats are internally consistent and cover the corpus") {
    val rows = TextAnalysis.lexicalStatsQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val corpusTokens = graft.core.Tables.documents(spark, sf0001)
      .select(size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == corpusTokens, "token volume conserved")
    rows.foreach { r =>
      val (tokens, types, hapax) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hapax <= types && types <= tokens)
      assert(r.getDouble(4) == types.toDouble / tokens.toDouble, "ttr exact")
      assert(r.getDouble(5) == hapax.toDouble / types.toDouble, "hapax share exact")
    }
  }

  test("mm05: frame coverage exact; first frame NULL; deltas recompute") {
    val rows = Multimodal.sceneCutQuery(spark, sf0001).collect()
    val lens = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), length(col("text")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byMedia = rows.groupBy(_.getLong(0))
    byMedia.foreach { case (m, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.length == ((lens(m) + 63) / 64).toInt, s"media $m frame count")
      assert(sorted.head.isNullAt(3) && sorted.head.isNullAt(4), s"media $m first frame")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) == math.abs(b.getLong(2) - a.getLong(2)), s"media $m delta")
          assert(b.getBoolean(4) == (b.getLong(3) > 400L), s"media $m cut flag")
        case _ =>
      }
    }
    assert(byMedia.keySet == lens.filter(_._2 > 0).keySet)
  }

  test("pl03: weights agree with the composed sub-operators") {
    val rows = Pipeline.trainingWeightsQuery(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs, "one weight per document")
    val verdicts = Curation.curationQuery(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dupW = Dedup.softDedup(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val boosts = Curation.temperatureMixQuery(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    rows.foreach { r =>
      val (id, src, reason) = (r.getLong(0), r.getString(1), r.getString(2))
      assert(reason == verdicts(id))
      assert(r.getDouble(3) == dupW(id))
      assert(r.getDouble(4) == boosts(src))
      val expected = if (reason == "ok") dupW(id) * boosts(src) else 0.0
      assert(r.getDouble(5) == expected, s"doc $id")
    }
    // the gate actually fires: some weight mass is zeroed, some survives
    assert(rows.exists(_.getDouble(5) == 0.0) && rows.exists(_.getDouble(5) > 0.0))
  }
}
