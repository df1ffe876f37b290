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

  test("ir01: top-k size, descending rounded scores, positive-tf head") {
    val rows = Search.bm25TopK(spark, sf0001).collect()
    assert(rows.length == Search.TopK)
    val scores = rows.map(_.getDouble(4))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the head of the ranking must actually contain query terms
    val head = rows.head
    assert((1 to 3).map(head.getLong).sum > 0 && head.getDouble(4) > 0.0)
  }
}
