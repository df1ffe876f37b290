package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

class SkewJoinSpec extends AnyFunSuite {
  import spark.implicits._

  test("salted join == plain join, with hot key spread over buckets") {
    // heavily skewed left side: 10k rows of one key + a tail
    val left = (Seq.fill(10000)("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "row_id")
    val right = ("hot" +: (1 to 100).map(i => s"k$i")).zipWithIndex
      .toDF("rk", "payload")

    val plain = left.join(right, col("k") === col("rk"))
      .select(col("row_id"), col("payload"))
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", "rk",
      uniquifier = col("row_id"), buckets = 8)
      .select(col("row_id"), col("payload"))

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)

    // the hot key's rows really do land in multiple salt buckets
    val spread = left.filter(col("k") === "hot")
      .withColumn("salt", pmod(xxhash64(col("k"), col("row_id")), lit(8)))
      .select(countDistinct(col("salt"))).as[Long].head()
    assert(spread == 8)
  }
}
