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
}
