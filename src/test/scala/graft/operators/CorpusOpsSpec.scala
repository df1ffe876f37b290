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
