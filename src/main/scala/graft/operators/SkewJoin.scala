package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * At 100 TB a handful of hot keys (the null customer, the default user id,
  * the empty document) can put an entire shuffle partition on one executor.
  * AQE's skew-join handles many cases (`spark.sql.adaptive.skewJoin.*`), but
  * only for sort-merge joins after the fact; salting is the declarative fix
  * that also works for aggregations and is deterministic at plan time.
  *
  * Left (large, skewed) rows get a random-but-deterministic salt in
  * [0, buckets); right (smaller) rows are replicated `buckets` times. The
  * join key becomes (key, salt) — hot keys spread over `buckets` reducers.
  */
object SkewJoin {

  /** Deterministic per-row salt: hash of the whole left row spread over
    * buckets (xxhash64 of the key + a per-row uniquifier column). */
  def saltedEquiJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      uniquifier: Column,
      buckets: Int = 16): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(leftKey), uniquifier), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
