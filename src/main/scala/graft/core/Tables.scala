package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical loaders for the TPC-H-ish test corpus (TESTDATA.md).
  *
  * All relational operators take the scale-factor directory as a parameter so
  * the same code runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1+
  * (bench) — and, unchanged, against a 100 TB lake: the loaders are plain
  * `spark.read.parquet`, so partition pruning / predicate pushdown / column
  * pruning all reach the scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Historical testdata layouts stored events.ts as TIMESTAMP(NANOS), which
    // the vectorized reader rejects; reading it as long (epoch nanos) keeps
    // those files loadable. Current layouts store micros TIMESTAMP with
    // isAdjustedToUTC=false — disable NTZ inference so it arrives as plain
    // TimestampType (the stored micros taken verbatim as the UTC instant,
    // matching how DuckDB's epoch_us(ts) reads the same file).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Epoch nanos (long) → TimestampType, exact.
    * `(c / 1000L).cast("long")` would divide in DOUBLE, whose 2^53 mantissa
    * cannot represent epoch nanos (~1.7e18) — values within ~128 ns of a
    * microsecond boundary would round to the wrong microsecond. Subtracting
    * the remainder first makes the decimal division exact. */
  def nanosToTimestamp(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    timestamp_micros(nanosToMicros(c))
  }

  /** Epoch nanos (long) → epoch micros (long), exact integer truncation
    * (see [[nanosToTimestamp]] for why plain division is not exact). */
  def nanosToMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    ((c - pmod(c, lit(1000L))).cast("decimal(25,0)") / lit(1000)).cast("long")
  }

  /** Spread a NARROW scan across all cores before CPU-heavy per-row work
    * (hashing, regex, vector math). A 100 TB input arrives as thousands of
    * row-groups and already parallelizes at the scan — repartitioning it
    * would shuffle every byte for nothing (and could even REDUCE parallelism
    * below the scan's natural partition count), so the widen only happens
    * when the plan's partitioning is narrower than the cluster: the
    * single-small-file case, where one task would serialize the expensive
    * map stage.
    *
    * Contract: call this on SCAN-SHAPED inputs only (a parquet scan plus
    * optional filter/project). The partition probe reads
    * `queryExecution.toRdd` — for an exchange-free plan that builds the RDD
    * lineage without running jobs or spawning the extra
    * deserialize-to-Row plan that `df.rdd` would; a shuffle-producing input
    * would both trigger AQE execution here and report post-shuffle counts,
    * which is not what this helper is for. */
  def parallel(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The events feed, normalized to a canonical timestamp layout regardless
    * of which parquet encoding the testdata generation used:
    *
    *   - `ts`    — TimestampType (micros precision, UTC instant)
    *   - `ts_us` — long epoch MICROS, the exact cross-engine sort/window key
    *               (DuckDB's `epoch_us(ts)` yields the identical value)
    *
    * Accepted source layouts: micros TIMESTAMP (current testdata; read
    * verbatim), legacy TIMESTAMP(NANOS) surfaced as epoch-nanos long by
    * `nanosAsLong` (exact-truncated to micros — DuckDB also truncates nanos
    * parquet to micros on read, so micros IS the cross-engine resolution),
    * and TIMESTAMP_NTZ (defensive: value-preserving under the session's UTC
    * timezone). A schema change in regenerated testdata lands HERE, not in
    * nine scattered operator analysis errors (FixturesSpec pins the rest). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => // legacy nanos layout
        df.withColumn("ts_us", nanosToMicros(col("ts")))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case TimestampType =>
        df.withColumn("ts_us", unix_micros(col("ts")))
      case _: TimestampNTZType => // session tz is UTC → cast preserves micros
        df.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_us", unix_micros(col("ts")))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — update Tables.events")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
