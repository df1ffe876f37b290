package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sf0001, spark}

/** sk01/dd16 — deterministic-hash sketches: estimator quality, the
  * small-set fallback, Bloom's no-false-negative guarantee, and agreement
  * with the exact operators they approximate. */
class SketchSpec extends AnyFunSuite {

  test("sk01: estimator engages and lands within KMV error; fallback is exact") {
    val rows = Sketch.kmvDistinctQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, est) = (r.getLong(1), r.getDouble(3))
      if (!r.isNullAt(2)) {
        // sketch path: KMV stderr is ~n/sqrt(K) (K=16 → ~25%); 50% is a
        // deterministic bound for THIS corpus, not a statistical claim
        assert(math.abs(est - n) / n < 0.5, s"${r.getString(0)}: est $est vs $n")
      } else assert(est == n.toDouble, s"${r.getString(0)}: fallback must be exact")
    }
    // at least one source must actually exercise the estimator
    assert(rows.exists(!_.isNullAt(2)), "sketch path never engaged")
    // forcing K above the vocabulary exercises the fallback everywhere
    val fb = Sketch.kmvDistinctQuery(spark, sf0001, k = 4096).collect()
    fb.foreach(r => assert(r.isNullAt(2) && r.getDouble(3) == r.getLong(1).toDouble))
  }

  test("dd16: no false negatives; exact branch agrees with dd08") {
    val rows = Sketch.bloomDecontaminateQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bloom, exact, fp) = (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))
      if (exact) assert(bloom, s"doc ${r.getLong(0)}: Bloom false NEGATIVE")
      assert(fp == (bloom && !exact), s"doc ${r.getLong(0)}: fp flag")
    }
    val dd08 = Dedup.decontaminate(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // dd16's exact branch must equal dd08's verdict on every probed doc
    // (dd16 probes docs with >= 1 span; dd08 also lists span-less docs)
    rows.foreach { r =>
      assert(dd08(r.getLong(0)) == r.getBoolean(2),
        s"doc ${r.getLong(0)}: exact branch disagrees with dd08")
    }
  }

  test("dd16/sk01 plans: bit set and bench spans broadcast; bottom-K group-limits") {
    val p1 = Sketch.bloomDecontaminateQuery(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastHashJoin"), p1)
    val p2 = Sketch.kmvDistinctQuery(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p2.contains("WindowGroupLimit"), p2)
  }
}
