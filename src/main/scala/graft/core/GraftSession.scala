package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftBridge
import graft.functions._

/** Engine entrypoint: a tuned SparkSession builder plus SQL registration of
  * graft's native expressions, so the whole surface is reachable from
  * `spark.sql(...)` as well as the Scala API. */
object GraftSession {

  /** Recommended session for local[N]; on a cluster the same confs apply
    * with shuffle partitions sized to ~2-3x total cores. */
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // cache-heavy pipelines (the session memos hold pairs-scale
      // checkpoint blocks while graph loops aggregate): shrink the
      // UNEVICTABLE storage region so execution can push cached blocks to
      // disk instead of failing allocation — every block this engine
      // caches is MEMORY_AND_DISK, so eviction is a spill, never a loss
      // (measured: the 100x er rehearsal's label loop hit
      // AGGREGATE_OUT_OF_MEMORY at the default 0.5 with the 29M-pair memo
      // resident; green at 0.3)
      .config("spark.memory.storageFraction", "0.3")

  /** Register graft's native expressions as SQL functions:
    * graft_minhash(text, n, k), graft_shingles(text, n),
    * graft_sig_overlap(a, b), graft_simhash64(tokens),
    * graft_cosine(a, b), graft_sq_dist(a, b),
    * graft_pq_adc(codes, lut, k), graft_lsh_bucket(v, planes),
    * graft_token_ngrams(text, n). */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def lit(e: org.apache.spark.sql.catalyst.expressions.Expression): Any =
      e.eval(null)
    reg.createOrReplaceTempFunction("graft_minhash", exprs =>
      MinHashFromText(exprs(0),
        lit(exprs(1)).asInstanceOf[Int], lit(exprs(2)).asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingles", exprs =>
      CharShingles(exprs(0), lit(exprs(1)).asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("graft_sig_overlap", exprs =>
      SigOverlap(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash64", exprs =>
      SimHash64(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine", exprs =>
      CosineSim(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_sq_dist", exprs =>
      SqDist(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_pq_adc", exprs =>
      PqAdc(exprs(0), exprs(1), lit(exprs(2)).asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("graft_lsh_bucket", exprs =>
      SignLshBucket(exprs(0), lit(exprs(1)).asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("graft_token_ngrams", exprs =>
      TokenNgrams(exprs(0), lit(exprs(1)).asInstanceOf[Int]), "scala_udf")
  }
}
