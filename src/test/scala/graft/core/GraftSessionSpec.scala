package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

class GraftSessionSpec extends AnyFunSuite {

  test("custom expressions are callable from SQL after registration") {
    GraftSession.registerFunctions(spark)
    val row = spark.sql("""
      SELECT graft_simhash64(split('the quick brown fox', ' ')) AS sh,
             graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
             size(graft_shingles('abcdefgh', 5)) AS nsh,
             graft_sig_overlap(graft_minhash('hello world text', 5, 16),
                               graft_minhash('hello world text', 5, 16)) AS self
    """).collect()(0)
    assert(row.getLong(0) != 0L)
    assert(row.getDouble(1) == 1.0)
    assert(row.getInt(2) == 4) // 8 chars -> 4 distinct 5-gram windows
    assert(row.getDouble(3) == 1.0)
  }

  test("SQL and Scala-API expressions agree") {
    GraftSession.registerFunctions(spark)
    import org.apache.spark.sql.functions._
    val bad = Tables.documents(spark, graft.SparkTestSession.sf0001).limit(20)
      .select(
        graft.functions.MinHashFromText.minhashFromText(col("text"), 5, 32).as("api"),
        expr("graft_minhash(text, 5, 32)").as("sql"))
      .filter(col("api") =!= col("sql"))
    assert(bad.count() == 0)
  }
}
