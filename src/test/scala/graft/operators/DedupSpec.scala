package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.functions.SimHash64.simhash64

class DedupSpec extends AnyFunSuite {

  test("minhash-LSH pairs == brute-force jaccard pairs (exact recall at 0.8)") {
    val brute = Dedup.ngramJaccardPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus should contain injected near-dup pairs")
    assert(lsh == brute)
  }

  test("minhash-LSH jaccard values equal brute-force values") {
    val brute = Dedup.ngramJaccardPairs(spark, sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Dedup.minhashLshPairs(spark, sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(lsh == brute)
  }

  test("simhash: identical token arrays hash identically; near texts are near") {
    import spark.implicits._
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog and runs far away home"),
      ("b", "the quick brown fox jumps over the lazy dog and runs far away house"),
      ("c", "completely different words about spark catalyst optimizer and shuffles")
    ).toDF("id", "text")
      .withColumn("sh", simhash64(split(col("text"), " ")))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(m("a"), m("b")) < hamming(m("a"), m("c")))
    // determinism across evaluations
    val again = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m == again)
  }

  test("simhash pair query finds near-dup docs and only plausible ones") {
    val pairs = Dedup.simhashPairs(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getLong(2) <= 3))
    // SimHash measures bag-of-words similarity (order-free), so on a
    // shared-vocabulary corpus it legitimately flags some pairs the
    // char-shingle jaccard doesn't. Assert high precision, not identity.
    val trueDups = Dedup.ngramJaccardPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sPairs = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val precision = (sPairs & trueDups).size.toDouble / sPairs.size
    info(s"simhash precision vs char-jaccard truth = $precision (${sPairs.size} pairs)")
    assert(precision >= 0.5, s"simhash precision too low: $precision")
  }

  test("exact dedup groups every doc exactly once") {
    val total = Dedup.exactDedup(spark, sf0001)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    val docs = graft.core.Tables.documents(spark, sf0001).count()
    assert(total == docs)
  }
}
