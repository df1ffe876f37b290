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

  /** Distribution-drift report (PSI) between two corpus snapshots — the
    * check a production pipeline runs before admitting a new crawl batch:
    * for each monitored feature (document-length bucket, language, source)
    * and each observed bucket, the reference/current counts and the
    * bucket's Population-Stability-Index contribution
    * (p - q) * ln(p / q), with add-one smoothing over the feature's
    * observed bucket set so an empty side never divides by zero. Snapshots
    * here are the deterministic doc_id-parity split (a caller with real
    * snapshot columns passes those instead). Per-bucket terms are emitted
    * (the headline PSI is their sum) so the output has NO cross-row float
    * summation — every value is exact-integer arithmetic plus a fixed IEEE
    * op sequence, rounded 6dp only where ln's last ulp could wobble.
    *
    * Plan shape for 100 TB: ONE corpus scan (narrow: three columns) fans
    * into the long form via stack(), reduced by a map-side-combined count
    * keyed by (feature, bucket); the smoothing totals ride a window over
    * the SAME feature-keyed data — bucket-scale rows only, the corpus never
    * shuffles. */
  def driftPsiQuery(s: SparkSession, dir: String): DataFrame = {
    val wf = org.apache.spark.sql.expressions.Window.partitionBy(col("feature"))
    val long = Tables.parallel(Tables.documents(s, dir))
      .select((col("doc_id") % 2 === 1).as("is_cur"),
        expr("stack(3, 'len', CAST(n_chars div 100 AS STRING), " +
          "'lang', lang, 'source', source) AS (feature, bucket)"))
    long
      .groupBy(col("feature"), col("bucket"))
      .agg(
        sum(when(!col("is_cur"), 1L).otherwise(0L)).as("ref_n"),
        sum(when(col("is_cur"), 1L).otherwise(0L)).as("cur_n"))
      .withColumn("ref_tot", sum(col("ref_n")).over(wf))
      .withColumn("cur_tot", sum(col("cur_n")).over(wf))
      .withColumn("n_buckets", count(lit(1)).over(wf))
      .withColumn("p", (col("ref_n") + 1L).cast("double") /
        (col("ref_tot") + col("n_buckets")).cast("double"))
      .withColumn("q", (col("cur_n") + 1L).cast("double") /
        (col("cur_tot") + col("n_buckets")).cast("double"))
      .select(col("feature"), col("bucket"), col("ref_n"), col("cur_n"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 6)
          .as("psi_term"))
      .orderBy(col("feature"), col("bucket"))
  }

  /** DuckDB SQL replicating [[driftPsiQuery]] exactly (same parity split,
    * same smoothing, same association order in the PSI arithmetic). */
  val driftPsiOracleSql: String = """
      WITH long AS (
        SELECT doc_id % 2 = 1 AS is_cur, 'len' AS feature,
               CAST(n_chars // 100 AS VARCHAR) AS bucket FROM documents
        UNION ALL
        SELECT doc_id % 2 = 1, 'lang', lang FROM documents
        UNION ALL
        SELECT doc_id % 2 = 1, 'source', source FROM documents),
      c AS (SELECT feature, bucket,
              CAST(sum(CASE WHEN NOT is_cur THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
              CAST(sum(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT) AS cur_n
            FROM long GROUP BY feature, bucket),
      w AS (SELECT feature, bucket, ref_n, cur_n,
              CAST(sum(ref_n) OVER f AS BIGINT) AS ref_tot,
              CAST(sum(cur_n) OVER f AS BIGINT) AS cur_tot,
              CAST(count(*) OVER f AS BIGINT) AS n_buckets
            FROM c WINDOW f AS (PARTITION BY feature)),
      pq AS (SELECT feature, bucket, ref_n, cur_n,
               CAST(ref_n + 1 AS DOUBLE) / CAST(ref_tot + n_buckets AS DOUBLE) AS p,
               CAST(cur_n + 1 AS DOUBLE) / CAST(cur_tot + n_buckets AS DOUBLE) AS q
             FROM w)
      SELECT feature, bucket, ref_n, cur_n,
             round((p - q) * ln(p / q), 6) AS psi_term
      FROM pq ORDER BY feature, bucket"""

  /** Ingest-volume anomaly detection (the ops check every event pipeline
    * pages on): daily event counts per event type, each day z-scored
    * against THAT TYPE's own distribution across all observed days, with
    * |z| > 2 flagged. Days are exact integer micros-div-86400e6 (no
    * calendar arithmetic); the moments come from exact integer sums
    * (Σc, Σc², n over the per-type day counts) converted by a fixed IEEE op
    * sequence — the [[Windows.rollingZscoreQuery]] determinism recipe, so no
    * rounding is needed anywhere.
    *
    * Plan shape for 100 TB: the raw event stream collapses to the
    * (type, day) count matrix via ONE map-side-combined aggregate — at most
    * |types| x |days| rows regardless of event volume; the per-type moment
    * sums ride a window over that tiny matrix. Nothing downstream of the
    * first aggregate scales with the input. */
  def volumeAnomalyQuery(s: SparkSession, dir: String): DataFrame = {
    val wf = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    Tables.events(s, dir)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", count(lit(1)).over(wf))
      .withColumn("sc", sum(col("c")).over(wf))
      .withColumn("sc2", sum(col("c") * col("c")).over(wf))
      .withColumn("mu", col("sc").cast("double") / col("n").cast("double"))
      .withColumn("sd",
        when(col("n") > 1,
          sqrt((col("n") * col("sc2") - col("sc") * col("sc")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double"))))
      .withColumn("z",
        when(col("sd") > 0,
          (col("c").cast("double") - col("mu")) / col("sd")))
      .select(col("event_type"), col("day"), col("c").as("n_events"),
        col("mu"), col("z"),
        (col("z").isNotNull && abs(col("z")) > 2.0).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** DuckDB SQL replicating [[volumeAnomalyQuery]] exactly (same integer
    * moment sums, same IEEE conversion sequence — no rounding). */
  val volumeAnomalyOracleSql: String = """
      WITH c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                        CAST(count(*) AS BIGINT) AS c
                 FROM events GROUP BY event_type, day),
      m AS (SELECT event_type, day, c,
              CAST(count(*) OVER f AS BIGINT) AS n,
              CAST(sum(c) OVER f AS BIGINT) AS sc,
              CAST(sum(c * c) OVER f AS BIGINT) AS sc2
            FROM c WINDOW f AS (PARTITION BY event_type)),
      r AS (SELECT event_type, day, c,
              CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
              CASE WHEN n > 1
                   THEN sqrt(CAST(n * sc2 - sc * sc AS DOUBLE) /
                             CAST(n * (n - 1) AS DOUBLE)) END AS sd
            FROM m)
      SELECT event_type, day, c AS n_events, mu,
             CASE WHEN sd > 0 THEN (CAST(c AS DOUBLE) - mu) / sd END AS z,
             CASE WHEN sd > 0 THEN abs((CAST(c AS DOUBLE) - mu) / sd) > 2.0
                  ELSE FALSE END AS is_anomaly
      FROM r ORDER BY event_type, day"""

  /** The foreign-key topology of the TPC-H-ish star — (child table, FK
    * column, parent table, PK column). ONE declaration drives both the
    * query and the oracle, so a relationship cannot be audited on one
    * side only. */
  val ForeignKeys: Seq[(String, String, String, String)] = Seq(
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** dq06 — referential-integrity audit: for every declared FK
    * relationship, the child row count, NULL-FK count and ORPHAN count
    * (FK values with no matching parent key) — the join-safety report a
    * warehouse runs before trusting any query that assumes the star is
    * closed (an orphan silently drops rows from every inner join built
    * on it).
    *
    * Determinism: all counts are exact integers; output ordering is the
    * declared relationship order (by child, fk).
    *
    * Plan shape for 100 TB: each relationship is one aggregate over the
    * child keyed by nothing (three counts fused map-side) plus one
    * LEFT ANTI join against the DISTINCT parent keys — dimension parents
    * broadcast; the one fact-to-fact edge (lineitem→orders) shuffles
    * ids-only on the join key. Child fact tables are scanned once per
    * relationship with ONLY the FK column read (column pruning). */
  def refIntegrityQuery(s: SparkSession, dir: String): DataFrame = {
    val rows = ForeignKeys.map { case (child, fk, parent, pk) =>
      val c = Tables.load(s, dir, child).select(col(fk))
      val p = Tables.load(s, dir, parent).select(col(pk)).distinct()
      val orphans = c.filter(col(fk).isNotNull)
        .join(p, c(fk) === p(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val base = c.agg(count(lit(1)).as("n_rows"),
        sum(when(col(fk).isNull, 1L).otherwise(0L)).as("n_null_fk"))
      base.crossJoin(orphans)
        .select(lit(child).as("child"), lit(fk).as("fk"),
          lit(parent).as("parent"),
          col("n_rows"), col("n_null_fk"), col("n_orphans"))
    }
    rows.reduce(_ unionByName _).orderBy(col("child"), col("fk"))
  }

  /** DuckDB SQL replicating [[refIntegrityQuery]] exactly — generated from
    * the same [[ForeignKeys]] declaration. */
  def refIntegrityOracleSql: String = {
    val blocks = ForeignKeys.map { case (child, fk, parent, pk) =>
      s"""SELECT '$child' AS child, '$fk' AS fk, '$parent' AS parent,
             CAST((SELECT count(*) FROM $child) AS BIGINT) AS n_rows,
             CAST((SELECT count(*) FROM $child WHERE $fk IS NULL) AS BIGINT) AS n_null_fk,
             CAST((SELECT count(*) FROM $child c
                   WHERE c.$fk IS NOT NULL
                     AND NOT EXISTS (SELECT 1 FROM $parent p
                                     WHERE p.$pk = c.$fk)) AS BIGINT) AS n_orphans"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
      SELECT * FROM (
      $blocks
      ) z ORDER BY child, fk"""
  }

  /** dq05 — per-source completeness/consistency audit of the document
    * corpus (the per-feed ingest gate a crawl pipeline runs before a feed's
    * batch is admitted): row count, empty/whitespace-only text count, null
    * language count, declared-vs-actual length mismatches
    * (`n_chars != length(text)`), distinct language count and the n_chars
    * range, with a per-source pass verdict (all defect counts zero).
    *
    * Determinism: every column is an exact integer or a boolean of exact
    * integers; output ordered by source.
    *
    * Plan shape for 100 TB: ONE corpus pass — all defect counters are
    * map-side partial sums fused into a single source-keyed aggregate
    * (source cardinality is feed-count, thousands at most, so the final
    * exchange is tiny); the distinct-language count rides the same
    * aggregate (bounded expansion: languages-per-source). No joins, no
    * second scan. */
  def completenessQuery(s: SparkSession, dir: String): DataFrame = {
    Tables.parallel(Tables.documents(s, dir))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("text").isNull || trim(col("text")) === "", 1L)
          .otherwise(0L)).as("n_empty_text"),
        sum(when(col("lang").isNull || col("lang") === "", 1L)
          .otherwise(0L)).as("n_null_lang"),
        sum(when(col("n_chars") =!= length(col("text")), 1L)
          .otherwise(0L)).as("n_len_mismatch"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .withColumn("passed",
        col("n_empty_text") === 0L && col("n_null_lang") === 0L &&
          col("n_len_mismatch") === 0L)
      .orderBy(col("source"))
  }

  /** DuckDB SQL replicating [[completenessQuery]] exactly. */
  val completenessOracleSql: String = """
      WITH a AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1
                             ELSE 0 END) AS BIGINT) AS n_empty_text,
               CAST(sum(CASE WHEN lang IS NULL OR lang = '' THEN 1
                             ELSE 0 END) AS BIGINT) AS n_null_lang,
               CAST(sum(CASE WHEN n_chars != length(text) THEN 1
                             ELSE 0 END) AS BIGINT) AS n_len_mismatch,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents GROUP BY source)
      SELECT source, n_rows, n_empty_text, n_null_lang, n_len_mismatch,
             n_langs, min_chars, max_chars,
             (n_empty_text = 0 AND n_null_lang = 0 AND n_len_mismatch = 0)
               AS passed
      FROM a ORDER BY source"""

  /** Snapshot watermarks for [[snapshotDiffQuery]] — two cutoffs inside
    * the synthetic order-date range (1995-01 .. 2001-08), placed so all
    * three change classes are populated at every scale factor. */
  val SnapOld = "1998-01-01"
  val SnapNew = "2000-01-01"

  /** dq07 — derived-state snapshot diff (the CDC/SCD reconciliation
    * audit): per customer, compare the order-count/spend state as of
    * [[SnapOld]] against the state as of [[SnapNew]] and classify
    * `added` (customer first appears between the watermarks), `changed`
    * (existing customer gained orders) or `unchanged`. This is the audit
    * a changelog pipeline runs to certify that an incremental refresh of
    * a state table equals a from-scratch rebuild — q38 materializes the
    * latest snapshot, this RECONCILES two of them.
    *
    * Determinism: counts are exact integers; change classification uses
    * ONLY the integer counts (orders are append-only, so spend changed ⟺
    * count changed — no float compare gates a row); the spend sums are
    * informational, round-2 like every order-dependent money sum (q01).
    *
    * Plan shape for 100 TB: NO join — both snapshots are conditional
    * aggregates fused into ONE map-side-combined custkey exchange over
    * one pruned scan (o_custkey, o_orderdate, o_totalprice). The
    * two-sided compare never materializes two tables. */
  def snapshotDiffQuery(s: SparkSession, dir: String): DataFrame = {
    val oldP = col("o_orderdate") < SnapOld
    val newP = col("o_orderdate") < SnapNew
    Tables.orders(s, dir)
      .filter(newP)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        sum(when(oldP, 1L).otherwise(0L)).as("n_orders_old"),
        count(lit(1)).as("n_orders_new"),
        round(sum(when(oldP, col("o_totalprice")).otherwise(0.0)), 2)
          .as("spend_old"),
        round(sum(col("o_totalprice")), 2).as("spend_new"))
      .withColumn("change_type",
        when(col("n_orders_old") === 0L, "added")
          .when(col("n_orders_new") > col("n_orders_old"), "changed")
          .otherwise("unchanged"))
      .select(col("custkey"), col("change_type"), col("n_orders_old"),
        col("n_orders_new"), col("spend_old"), col("spend_new"))
      .orderBy(col("custkey"))
  }

  /** DuckDB SQL replicating [[snapshotDiffQuery]] exactly (same fused
    * conditional aggregates, same integer-only classification, same
    * round-2 money sums). */
  def snapshotDiffOracleSql: String = s"""
      WITH a AS (
        SELECT o_custkey AS custkey,
               CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '$SnapOld'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orders_old,
               CAST(count(*) AS BIGINT) AS n_orders_new,
               round(sum(CASE WHEN o_orderdate < TIMESTAMP '$SnapOld'
                              THEN o_totalprice ELSE 0.0 END), 2) AS spend_old,
               round(sum(o_totalprice), 2) AS spend_new
        FROM orders WHERE o_orderdate < TIMESTAMP '$SnapNew'
        GROUP BY o_custkey)
      SELECT custkey,
             CASE WHEN n_orders_old = 0 THEN 'added'
                  WHEN n_orders_new > n_orders_old THEN 'changed'
                  ELSE 'unchanged' END AS change_type,
             n_orders_old, n_orders_new, spend_old, spend_new
      FROM a ORDER BY custkey"""

  /** Declared key per audited table — ONE declaration drives both the
    * Spark audit and its oracle (the dq06 FK-topology move), so the two
    * sides cannot silently diverge on which key a table is supposed to be
    * unique on. Lineitem's key is composite. */
  val KeyTopology: Seq[(String, Seq[String])] = Seq(
    "customer" -> Seq("c_custkey"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "orders" -> Seq("o_orderkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"))

  /** dq08 — key-uniqueness audit across the whole catalog: for every
    * table in [[KeyTopology]], row count, distinct declared-key count,
    * duplicated-key count and the worst multiplicity, plus the pass/fail
    * verdict. The ingest gate that catches a double-loaded partition or a
    * broken upsert BEFORE joins silently fan out downstream — dq06 audits
    * edges between tables, this audits each table's own identity.
    *
    * Determinism: pure integer censuses.
    *
    * Plan shape for 100 TB: per table, ONE map-side-combined key-grouped
    * aggregate (duplicate keys collapse before the exchange) reduced to a
    * single stats row — scans prune to the key columns; the union is
    * |tables| rows. */
  def keyUniquenessQuery(s: SparkSession, dir: String): DataFrame = {
    val perTable = KeyTopology.map { case (t, keys) =>
      val kc = Tables.load(s, dir, t)
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      kc.agg(sum(col("n")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
          max(col("n")).as("max_multiplicity"))
        .select(lit(t).as("table_name"),
          lit(keys.mkString(",")).as("key_cols"),
          col("n_rows"), col("n_keys"), col("n_dup_keys"),
          col("max_multiplicity"),
          (col("n_dup_keys") === 0L).as("is_unique"))
    }
    perTable.reduce(_ unionByName _).orderBy(col("table_name"))
  }

  /** DuckDB SQL replicating [[keyUniquenessQuery]] exactly — generated
    * from the same [[KeyTopology]] declaration. */
  def keyUniquenessOracleSql: String = {
    val blocks = KeyTopology.map { case (t, keys) =>
      val kl = keys.mkString(", ")
      s"""SELECT '$t' AS table_name, '${keys.mkString(",")}' AS key_cols,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
             CAST(max(n) AS BIGINT) AS max_multiplicity,
             sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) = 0 AS is_unique
      FROM (SELECT $kl, count(*) AS n FROM $t GROUP BY $kl) k_$t"""
    }.mkString("\n      UNION ALL ")
    s"""
      $blocks
      ORDER BY table_name"""
  }
}
