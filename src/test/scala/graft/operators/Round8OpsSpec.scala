package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Invariant checks for the round-8 additions beyond their DuckDB oracles:
  * driver-side brute-force recomputes of dd17 (boilerplate strip) and sim10
  * (margin mining), independent of both the Spark plan and the oracle SQL. */
class Round8OpsSpec extends AnyFunSuite {

  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue

  test("dd17: strip recomputes from a driver-side segment census") {
    val width = 4
    val minDocs = 3
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    def segsOf(t: String): Seq[String] =
      t.toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ", -1).grouped(width).map(_.mkString(" ")).toSeq
    val census = docs.flatMap { case (id, t) =>
      t.toSeq.flatMap(x => segsOf(x).distinct.map(s => (s, id)))
    }.groupBy(_._1).view.mapValues(_.length).toMap
    val bp = census.filter(_._2 >= minDocs).keySet
    val expected = docs.map { case (id, t) =>
      t match {
        case None => (id, 0L, 0L, null: String)
        case Some(x) =>
          val segs = segsOf(x)
          val kept = segs.filterNot(bp)
          (id, segs.size.toLong, (segs.size - kept.size).toLong,
            kept.mkString(" "))
      }
    }.sortBy(_._1)
    val got = Dedup.boilerplateStrip(spark, sf0001, width, minDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(got.toSeq == expected.toSeq)
    // and the pass does real work on this corpus (or the test is vacuous)
    assert(expected.map(_._3).sum > 0, "no boilerplate removed at sf0.001")
  }

  test("dd18: verdicts recompute from a driver-side brute force") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      round6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val bench = emb.filter(_._3 == 0)
    val corpus = emb.filter(_._3 != 0)
    assert(bench.nonEmpty && corpus.nonEmpty)
    val byId = corpus.map { case (id, v, _) =>
      id -> bench.map { case (bid, bv, _) => (bid, cos(v, bv)) }
    }
    // pick a threshold from the recomputed data that guarantees BOTH
    // verdict classes exist on this corpus (the fixed default may yield
    // zero contaminated rows at sf0.001, making the flag untested)
    val maxes = byId.map(_._2.map(_._2).max).sorted
    val t = maxes(maxes.length / 2)
    val expected = byId.map { case (id, cs) =>
      val mx = cs.map(_._2).max
      (id, mx, cs.filter(_._2 == mx).map(_._1).min,
        cs.count(_._2 >= t).toLong, mx >= t)
    }.sortBy(_._1)
    val got = Dedup.semanticDecontaminate(spark, sf0001, 0, t).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == expected.toSeq)
    assert(expected.exists(_._5) && expected.exists(!_._5),
      "both verdict classes must occur")
  }

  test("sa10: E-S sample recomputes from a driver-side key sort") {
    val n = 64
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keyed = docs.map { case (id, src, t) =>
      val w = t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).length
      val h32 = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16)
      val key = round6(math.log((h32 + 1.0) / 4294967296.0) / w)
      (id, src, w.toLong, key)
    }
    val expected = keyed.sortBy { case (id, _, _, k) => (-k, id) }.take(n)
      .zipWithIndex.map { case ((id, src, w, k), i) =>
        (id, src, w, k, (i + 1).toLong)
      }
    val got = Curation.weightedSampleQuery(spark, sf0001, n).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.toSeq == expected.toSeq)
    // weights must matter: the E-S rank order must differ from the order
    // of the raw uniforms (otherwise w never influenced the draw)
    val byU = keyed.sortBy { case (id, _, _, _) =>
      (-java.lang.Long.parseLong(md5hex(id.toString).take(8), 16), id)
    }.map(_._1).take(expected.length)
    assert(expected.map(_._1).toSeq != byU.toSeq,
      "weighted order degenerated to the unweighted uniform order")
  }

  test("sim10: margins recompute from a driver-side brute force") {
    val k = 4
    val nQueries = 100
    val threshold = 1.02
    val emb = graft.core.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { // left-to-right folds, like CosineSim
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      round6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val xs = emb.filter(_._1 % 2 == 0)
    val ys = emb.filter(_._1 % 2 == 1)
    val qs = xs.filter(_._1 < 2L * nQueries)
    def topK(v: Array[Double], side: Array[(Long, Array[Double])]) =
      side.map { case (id, w) => (id, cos(v, w)) }
        .sortBy { case (id, c) => (-c, id) }.take(k)
    val fwd = qs.map { case (qid, qv) => qid -> topK(qv, ys) }.toMap
    val dx = fwd.view.mapValues(_.map(_._2).sum / k).toMap // rank order
    val candY = fwd.values.flatten.map(_._1).toSet
    val dy = ys.filter(y => candY(y._1))
      .map { case (yid, yv) => yid -> topK(yv, xs).map(_._2).sum / k }.toMap
    val expected = fwd.toSeq.flatMap { case (qid, cands) =>
      cands.map { case (cid, c) =>
        (qid, cid, c, round6(c * 2.0 / (dx(qid) + dy(cid))))
      }.sortBy { case (_, cid, _, m) => (-m, cid) }
        .zipWithIndex.map { case ((q, cid, c, m), i) =>
          (q, cid, c, m, (i + 1).toLong, m > threshold && i == 0)
        }
    }.sortBy(t => (t._1, t._5))
    val got = Similarity.marginMining(spark, sf0001, k, nQueries, threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == expected)
    // hubness normalization must actually reorder at least one query's
    // candidates relative to raw cosine (otherwise margin = monotone of cos
    // on this corpus and the op is untested)
    val reordered = expected.groupBy(_._1).values.exists { rows =>
      rows.sortBy(_._5).map(_._2) !=
        rows.sortBy(r => (-r._3, r._2)).map(_._2)
    }
    assert(reordered, "margin rank never diverged from cosine rank")
  }
}
