package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sf0001, spark}

/** gr01 — duplication-hub PageRank: backend equality (driver fold vs
  * distributed loop) and the power-method invariants. */
class GraphSpec extends AnyFunSuite {

  test("gr01: driver fold equals the distributed loop") {
    val (rawPairs, caches) = Dedup.minhashLshPairsTracked(spark, sf0001)
    val pairs = rawPairs.select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    caches.foreach(_.unpersist(blocking = false))
    try {
      val local = Graph.localRanks(spark, pairs, Graph.DefaultIters)
        .orderBy(col("doc_id")).collect().map(_.toSeq)
      val dist = Graph.distributedRanks(pairs, Graph.DefaultIters)
        .orderBy(col("doc_id")).collect().map(_.toSeq)
      assert(local.length == dist.length && local.length > 0)
      assert(local.sameElements(dist))
    } finally () // pair frame is the session memo's checkpoint - never unpersist
  }

  test("gr02: driver triangle fold equals the distributed wedge join") {
    val (pairs, _) = Dedup.materializedVerifiedPairs(spark, sf0001)
    try {
      import spark.implicits._
      val local = Graph.localTriangles(spark,
          pairs.select(col("doc_a"), col("doc_b")).as[(Long, Long)]
            .collect().toSeq)
        .orderBy(col("doc_id")).collect().map(_.toSeq)
      val dist = Graph.distributedTriangles(pairs)
        .orderBy(col("doc_id")).collect().map(_.toSeq)
      assert(local.length == dist.length && local.length > 0)
      assert(local.sameElements(dist))
      // non-vacuity: the graph must actually close some triangle
      assert(dist.exists(r => r(2).asInstanceOf[Long] > 0L))
    } finally () // pair frame is the session memo's checkpoint - never unpersist
  }

  test("gr01: degrees match the pair multiset; total rank is conserved") {
    val rows = Graph.dupHubRankQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val pairs = Dedup.minhashLshPairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val degs = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getLong(0)).toSet == degs.keySet, "node set = pair participants")
    rows.foreach { r =>
      assert(r.getLong(1) == degs(r.getLong(0)), s"degree of ${r.getLong(0)}")
      assert(r.getDouble(2) >= 0.15, "rank floor")
    }
    // the formulation conserves total rank: sum r' = 0.15 n + 0.85 sum r
    val n = rows.length
    assert(math.abs(rows.map(_.getDouble(2)).sum - n) < 1e-3 * n, "conservation")
  }
}
