package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the composed pipeline funnel (pl01/pl02) beyond
  * its DuckDB oracle: the manifest must partition the corpus, agree with
  * each standalone stage operator, and number the kept shards correctly. */
class PipelineSpec extends AnyFunSuite {

  private lazy val rows = Pipeline.pipelineQuery(spark, sf0001).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("pl01: one row per document, stages partition the corpus") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    assert(rows.length == docs.count())
    assert(rows.map(_._1).distinct.length == rows.length)
    val stages = rows.map(_._2).toSet
    val legal = Set("benchmark", "exact_dup", "lang_mismatch", "too_short",
      "span_dup", "contaminated", "sampled_out", "kept")
    assert(stages.subsetOf(legal), stages)
    // the funnel must actually funnel: something kept, something dropped
    // ('contaminated' may be absent at sf0.001 — every contaminated doc
    // can be masked by an earlier cascade stage; the cascade-agreement
    // test proves the masking is exact)
    assert(stages.contains("kept") && stages.contains("benchmark") &&
      stages.contains("sampled_out"))
    // benchmark carve-out is exactly the src0 slice
    val nBench = docs.filter(col("source") === "src0").count()
    assert(rows.count(_._2 == "benchmark") == nBench)
  }

  test("pl01: stage cascade agrees with each standalone operator") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val reason = Curation.curationQuery(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val contam = Dedup.decontaminate(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val sampled = Curation.hashSampleQuery(spark, sf0001, rate = Pipeline.SampleRate)
      .collect().map(_.getLong(0)).toSet
    rows.foreach { case (id, stage, _, _, _) =>
      val want =
        if (srcOf(id) == "src0") "benchmark"
        else if (reason(id) != "ok") reason(id)
        else if (contam(id)) "contaminated"
        else if (!sampled.contains(id)) "sampled_out"
        else "kept"
      assert(stage == want, s"doc $id: got $stage want $want")
    }
  }

  test("pl01: kept docs get dense per-shard positions, dropped docs get -1") {
    val (kept, dropped) = rows.partition(_._2 == "kept")
    assert(dropped.forall(t => t._3 == -1L && t._4 == -1L))
    assert(kept.forall(t => t._3 >= 0 && t._3 < 8))
    kept.groupBy(_._3).foreach { case (shard, g) =>
      val ps = g.map(_._4).sorted
      assert(ps.toSeq == (0L until g.length).toSeq, s"shard $shard positions")
    }
  }

  test("pl02: funnel report re-aggregates the manifest exactly") {
    val got = Pipeline.funnelQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._2).map { case (st, g) =>
      (st, g.length.toLong, g.map(_._5).sum)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
  }
}
