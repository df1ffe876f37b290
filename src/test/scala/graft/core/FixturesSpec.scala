package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Schema-drift tripwire for the driver-provided parquet corpus
  * (FIXTURES.md §5). When the driver regenerates `/root/testdata` with a
  * different physical encoding — as happened in round 5, when `events.ts`
  * moved from TIMESTAMP(NANOS) to micros TIMESTAMP and nine queries failed
  * analysis with nine scattered errors — THIS spec fails first, with one
  * message naming the table and column that moved.
  *
  * The pinned types are the SPARK-LOADED types after `Tables` normalization
  * (e.g. events gains the canonical `ts_us` long and a TimestampType `ts`
  * regardless of the file encoding), because that loaded schema is the
  * contract every operator in the library compiles against.
  */
class FixturesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf0001

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string", "ts_us" -> "bigint"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int")
  )

  private def loaded(name: String) = name match {
    case "events" => Tables.events(spark, sf)
    case t        => Tables.load(spark, sf, t)
  }

  expected.foreach { case (table, cols) =>
    test(s"testdata schema pin: $table") {
      val got = loaded(table).schema.map(f => f.name -> f.dataType.simpleString)
      assert(got == cols,
        s"\nSchema drift in $table.parquet — the driver's testdata layout " +
        s"changed.\n  loaded:   $got\n  expected: $cols\n" +
        "Fix at the Tables loader boundary (core/Tables.scala), NOT in " +
        "individual operators; then update this pin and FIXTURES.md §5.")
    }
  }

  test("events.ts_us is exact epoch micros (matches DuckDB epoch_us)") {
    import org.apache.spark.sql.functions._
    // ts_us must equal unix_micros of the normalized timestamp — one
    // canonical value both engines derive from the same stored micros
    val bad = Tables.events(spark, sf)
      .filter(unix_micros(col("ts")) =!= col("ts_us")).count()
    assert(bad == 0L)
  }
}
