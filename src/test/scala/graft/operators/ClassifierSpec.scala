package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, sf0001}

/** cl01 model-based quality filtering: the distributed GD loop must agree
  * with a plain-Scala recompute of the same math on the collected feature
  * frame, and the scoring pass must stay a cache-read with no keyed
  * exchange. */
class ClassifierSpec extends AnyFunSuite {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cl01: distributed GD equals the local recompute on collected features") {
    val f = Classifier.features(spark, sf0001, "src0")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        Array(1.0, r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    val w = Array.fill(5)(0.0)
    for (_ <- 1 to 8) {
      val g = Array.fill(5)(0.0)
      for ((_, y, x) <- f) {
        val z = (0 until 5).map(j => w(j) * x(j)).sum
        val e = 1.0 / (1.0 + math.exp(-z)) - y
        for (j <- 0 until 5) g(j) += e * x(j)
      }
      for (j <- 0 until 5) w(j) -= round6(g(j) / f.length)
    }
    val expected = f.map { case (id, y, x) =>
      val z = (0 until 5).map(j => w(j) * x(j)).sum
      (id, y.toLong, round6(1.0 / (1.0 + math.exp(-z))))
    }.sortBy(_._1)
    val got = Classifier.qualityClassifierQuery(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === expected.length)
    // summation order differs (local fold vs partial aggs), so compare at
    // the rounding granularity the operator itself guarantees
    for (((gi, gy, gs), (ei, ey, es)) <- got.zip(expected)) {
      assert(gi === ei)
      assert(gy === ey)
      assert(math.abs(gs - es) < 2e-6, s"doc $gi: got $gs expected $es")
    }
  }

  test("cl01: scores are probabilities, labels match the trusted source, " +
    "predicted is the 0.5 cut") {
    val rows = Classifier.qualityClassifierQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val score = r.getDouble(2)
      assert(score > 0.0 && score < 1.0)
      assert(r.getBoolean(3) === (score >= 0.5))
    }
    // base-rate sanity: with near-uninformative features the learned bias
    // pulls scores toward the trusted-source prevalence, far from 0.5
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(mean > 0.0 && mean < 0.6, s"mean score $mean")
  }

  test("cl03: above-budget IVF routing reproduces the exact predictions") {
    val exact = Classifier.knnPredictions(spark, sf0001, 5)
      .collect().map(_.toSeq).toSet
    // budget 0 forces the IVF branch through the same routing guard the
    // production path uses — the size-guarded hybrid, actually exercised;
    // the default full-probe routing is EXACT, so equality is bit-for-bit
    val routed = Classifier.knnPredictions(spark, sf0001, 5,
      maxTrainBroadcastBytes = 0L).collect().map(_.toSeq).toSet
    assert(routed.nonEmpty)
    assert(routed == exact,
      s"IVF-routed predictions drifted: ${(routed diff exact).take(5)} vs ${(exact diff routed).take(5)}")
  }

  test("cl03: pruned-probe IVF mode stays well-formed (one prediction per test vector)") {
    // nProbe < nCentroids is the approximate knob: predictions may drift
    // on an isotropic corpus (no cluster structure), but every test vector
    // must still get exactly one majority verdict from its probed lists
    val emb = graft.core.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v", "label")
      .withColumn("h",
        Curation.md5Prefix32(org.apache.spark.sql.functions.col("vec_id"))
          .cast("long") % 10)
    val train = emb.filter("h < 8")
      .selectExpr("vec_id AS cand_id", "v AS cv", "label AS cand_label")
    val test = emb.filter("h >= 8")
      .selectExpr("vec_id", "v AS qv", "label AS true_label")
    val scored = Classifier.knnScoredIvf(train, test, nCentroids = 16, nProbe = 4)
    val nTest = test.count()
    val perQuery = scored.groupBy("vec_id").count().count()
    assert(perQuery == nTest, s"pruned scan lost test vectors: $perQuery of $nTest")
  }

  test("cl03 round-12: above-budget routing derives an approximate IVF; recall@k is sampled and sane") {
    // default route on the test corpus is EXACT (far under KnnScoreBudget)
    // and the query's recall column is exactly 1.0 with no probe work
    val defRoute = Classifier.knnRoute(spark, sf0001)
    assert(defRoute.exact)
    assert(Classifier.knnRecallAtK(spark, sf0001, 5) == 1.0)
    val rows = Classifier.knnClassifierQuery(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.forall(
      _.getAs[Double]("recall_at_k") == 1.0))
    // a tiny budget forces the approximate derivation: nProbe must come
    // out strictly under nCentroids (the approximation actually engages)
    // and scale with the budget
    val r1 = Classifier.knnRoute(spark, sf0001, budget = 1000L)
    assert(!r1.exact && r1.nProbe >= 1 && r1.nProbe < r1.nCentroids)
    val halfWork = r1.nTest * r1.nTrain / 2
    val r2 = Classifier.knnRoute(spark, sf0001, budget = halfWork)
    assert(!r2.exact && r2.nProbe >= r1.nProbe)
    // the sampled recall probe runs the ROUTED derivation end to end on
    // the sample and lands in (0, 1]; determinism: same budget → same value
    val rec = Classifier.knnRecallAtK(spark, sf0001, 5, budget = 1000L)
    assert(rec > 0.0 && rec <= 1.0, s"recall out of range: $rec")
    assert(rec == Classifier.knnRecallAtK(spark, sf0001, 5, budget = 1000L))
  }
}
