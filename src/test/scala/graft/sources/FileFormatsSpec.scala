package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.core.Tables

/** S5 — file-format breadth: the same relation roundtrips through
  * parquet (the corpus), csv (header+schema) and json, with identical
  * query results over each. */
class FileFormatsSpec extends AnyFunSuite {

  test("csv and json roundtrips preserve query results") {
    val base = Tables.nation(spark, sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    base.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    base.write.mode("overwrite").json(s"$tmp/nation_json")

    val fromCsv = spark.read.option("header", "true")
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .csv(s"$tmp/nation_csv")
    val fromJson = spark.read
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .json(s"$tmp/nation_json")

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("n_regionkey")).collect().toSeq

    assert(agg(fromCsv) == agg(base))
    assert(agg(fromJson) == agg(base))
  }

  test("orc roundtrip preserves query results and pushes filters") {
    val base = Tables.orders(spark, sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    base.write.mode("overwrite").orc(s"$tmp/orders_orc")
    val fromOrc = spark.read.orc(s"$tmp/orders_orc")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("o_totalprice") > 100000.0)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus")).collect().toSeq
    assert(agg(fromOrc) == agg(base))
    // predicate pushdown reaches the ORC scan too
    val plan = fromOrc.filter(col("o_totalprice") > 100000.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
  }
}
