package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Data-quality validation — the profiling and constraint layer a
  * production pipeline runs on every ingested batch before it reaches
  * training (the role deequ/great-expectations play): column profiles and
  * declarative constraint checks, as plain aggregation plans.
  */
object DataQuality {

  /** Column profile of the orders table, long-form (one row per column):
    * row count, null count, exact distinct count, numeric min/max
    * (timestamps as epoch seconds; non-numeric columns carry nulls).
    *
    * Plan shape for 100 TB: ONE pass — all per-column statistics are
    * computed in a single aggregate (nulls/min/max are plain map-side
    * partials; the distinct counts expand the input once, Spark's standard
    * multi-count-distinct plan), then the 1-row wide result is unpivoted
    * with stack(). Six separate per-column scans would read the table six
    * times; at scale the sketch form (approx_count_distinct, see q31)
    * removes the expand too. */
  def profileOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.parallel(Tables.orders(s, dir))
    case class Col(name: String, num: Column)
    val cols = Seq(
      Col("o_orderkey", col("o_orderkey").cast("double")),
      Col("o_custkey", col("o_custkey").cast("double")),
      Col("o_orderstatus", lit(null).cast("double")),
      Col("o_totalprice", col("o_totalprice")),
      Col("o_orderdate", unix_timestamp(col("o_orderdate")).cast("double")),
      Col("o_orderpriority", lit(null).cast("double")))
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c.name).isNull, 1L).otherwise(0L)).as(s"nulls_${c.name}"),
        countDistinct(col(c.name)).as(s"dist_${c.name}"),
        min(c.num).as(s"min_${c.name}"),
        max(c.num).as(s"max_${c.name}"))
    }
    val wide = o.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'${c.name}', nulls_${c.name}, dist_${c.name}, min_${c.name}, max_${c.name}")
      .mkString(", ")
    wide.select(col("n_rows"),
      expr(s"stack(${cols.length}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy(col("col_name"))
  }

  /** DuckDB SQL replicating [[profileOrders]] exactly. */
  val profileOracleSql: String = {
    def block(name: String, num: String) = s"""
      SELECT '$name' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             CAST(count(DISTINCT $name) AS BIGINT) AS n_distinct,
             $num AS min_val,
             ${num.replace("min(", "max(")} AS max_val
      FROM orders"""
    Seq(
      block("o_orderkey", "min(CAST(o_orderkey AS DOUBLE))"),
      block("o_custkey", "min(CAST(o_custkey AS DOUBLE))"),
      block("o_orderstatus", "min(CAST(NULL AS DOUBLE))"),
      block("o_totalprice", "min(o_totalprice)"),
      block("o_orderdate", "min(CAST(epoch(o_orderdate) AS DOUBLE))"),
      block("o_orderpriority", "min(CAST(NULL AS DOUBLE))"))
      .mkString("", " UNION ALL ", " ORDER BY col_name")
  }

  /** Declarative constraint checks across the warehouse, long-form (one
    * row per constraint): domain bounds, date windows, and referential
    * integrity. `passed` is n_violations == 0.
    *
    * Plan shape for 100 TB: bound checks are map-side-combined conditional
    * counts (one narrow pass per table, fused where they share a scan);
    * the FK checks are left-anti joins whose probe side carries only the
    * key column — the canonical "orphan detection" plan, shuffle keyed by
    * the FK with AQE free to broadcast the smaller distinct key set. */
  def constraintChecks(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.parallel(Tables.orders(s, dir))
    val li = Tables.parallel(Tables.lineitem(s, dir))
    // bound checks sharing one scan per table
    val oChecks = o.agg(
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("o_totalprice_positive"),
      sum(when(col("o_orderdate") < "1990-01-01" ||
        col("o_orderdate") >= "2010-01-01", 1L).otherwise(0L)).as("o_orderdate_in_range"))
    val liChecks = li.agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L))
        .as("l_quantity_in_range"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L))
        .as("l_discount_in_range"))
    // referential integrity: orphaned foreign keys
    val custFk = o.join(Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("orders_custkey_fk"))
    val ordFk = li.join(o.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("lineitem_orderkey_fk"))
    def longForm(df: DataFrame): DataFrame = {
      val names = df.columns
      val stackArgs = names.map(n => s"'$n', $n").mkString(", ")
      df.select(expr(s"stack(${names.length}, $stackArgs) AS (check_name, n_violations)"))
    }
    Seq(oChecks, liChecks, custFk, ordFk).map(longForm)
      .reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("check_name"))
  }

  /** DuckDB SQL replicating [[constraintChecks]] exactly. */
  val constraintsOracleSql: String = """
      SELECT check_name, n_violations, n_violations = 0 AS passed FROM (
        SELECT 'o_totalprice_positive' AS check_name,
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'o_orderdate_in_range',
               CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                             OR o_orderdate >= TIMESTAMP '2010-01-01' THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'l_quantity_in_range',
               CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount_in_range',
               CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        -- NOT EXISTS, not NOT IN: a NULL key must COUNT as an orphan (the
        -- anti-join keeps it), while NOT IN would yield NULL and drop it
        SELECT 'orders_custkey_fk',
               CAST(count(*) AS BIGINT)
        FROM orders o WHERE NOT EXISTS
          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'lineitem_orderkey_fk',
               CAST(count(*) AS BIGINT)
        FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o2 WHERE o2.o_orderkey = l.l_orderkey)
      ) z ORDER BY check_name"""
}
