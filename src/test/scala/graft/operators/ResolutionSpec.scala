package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sf0001, spark}

/** er01 — q-gram-blocked edit-distance matching: the pigeonhole
  * losslessness claim proven by brute force, and the plan shape. */
class ResolutionSpec extends AnyFunSuite {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("er01: blocked matching equals the brute-force quadratic (lossless)") {
    val got = Resolution.fuzzyMatchQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val keys = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        substring(graft.functions.Text.normText(col("text")), 1, 24).as("p"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val brute = (for {
      i <- keys.indices; j <- (i + 1) until keys.length
      d = lev(keys(i)._2, keys(j)._2) if d <= 4
    } yield (keys(i)._1, keys(j)._1, d.toLong)).toSet
    assert(brute.nonEmpty, "corpus must contain at least one fuzzy match")
    assert(got == brute,
      s"missing: ${brute -- got}; extra: ${got -- brute}")
  }

  test("er01: lossless-blocking precondition is enforced") {
    intercept[IllegalArgumentException] {
      Resolution.fuzzyMatchQuery(spark, sf0001, keyLen = 16, q = 4, maxDist = 4)
    }
  }

  test("er02: cluster labels equal a brute-force union-find over er01's pairs") {
    val pairs = Resolution.fuzzyMatchQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val expected = parent.keys.map(v => (v, find(v))).toSet
    val got = Resolution.fuzzyClustersQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty && got == expected,
      s"missing: ${expected -- got}; extra: ${got -- expected}")
  }

  test("er03: golden records recompute from the clusters by survivorship rules") {
    val clusters = Resolution.fuzzyClustersQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val rows = Resolution.goldenRecordQuery(spark, sf0001).collect()
    val byCluster = clusters.groupBy(_._2)
    assert(rows.length == byCluster.size && rows.nonEmpty)
    rows.foreach { r =>
      val cid = r.getLong(0)
      val members = byCluster(cid).map(_._1)
      assert(r.getLong(1) == members.length.toLong, s"cluster $cid size")
      val canonical = members.maxBy(id => (docs(id)._2, -id))
      assert(r.getLong(2) == canonical, s"cluster $cid canonical")
      assert(r.getLong(3) == docs(canonical)._2, s"cluster $cid chars")
      assert(r.getLong(4) == members.min, s"cluster $cid first")
      assert(r.getString(5) == members.map(docs(_)._1).distinct.sorted.mkString(","),
        s"cluster $cid sources")
    }
  }

  test("er01: gram-keyed join, pruned scan, no cartesian") {
    // pinned on the UNMEMOIZED derivation — fuzzyMatchQuery itself now
    // returns the round-12 session memo's embedded/block scan
    val plan = Resolution.matchPairs(spark, sf0001, 24, 4, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
    // and the memoized consumers plan over the pair set with no re-scan
    Resolution.fuzzyMatchQuery(spark, sf0001).collect() // populate memo
    val p2 = Resolution.fuzzyClustersQuery(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("FileScan"), p2)
  }
}
