package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}

/** Runtime Bloom-filter join injection — the Spark-first answer to
  * hand-rolled Bloom prefilters: Catalyst's InjectRuntimeFilter plants a
  * `bloom_filter_agg` on the selective (small) side of a shuffle join and a
  * `might_contain` probe on the big side, so the big scan drops non-joining
  * rows BEFORE the exchange. At 100 TB this is the dd09-style "probe the
  * fingerprint store with a daily batch" pattern: the batch side builds the
  * bloom, the petabyte store side shuffles only likely matches.
  *
  * The thresholds here are production defaults scaled down to the test SF
  * (creation side <= 10 MB is the default; the application-side scan
  * threshold defaults to 10 GB and is floored to 0 so the tiny test scan
  * qualifies). The assertion pins that our join shapes REMAIN eligible —
  * a refactor that makes the store probe bloom-ineligible (e.g. wrapping
  * the join key in an expression Catalyst cannot push) fails here. */
class RuntimeFilterSpec extends AnyFunSuite {

  private def bloomSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // force the shuffle-join path: broadcasts bypass runtime filters
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  test("a selective dim filter injects a bloom probe into the fact scan side") {
    val s = bloomSession
    val li = graft.core.Tables.lineitem(s, sf0001)
    val ord = graft.core.Tables.orders(s, sf0001)
      .filter(col("o_orderstatus") === "P")
    val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("l_orderkey"), col("o_totalprice"))
    val opt = j.queryExecution.optimizedPlan.toString
    assert(opt.contains("bloom_filter_agg") || opt.contains("might_contain"),
      s"runtime bloom filter not injected:\n$opt")
    // and the filtered join still returns the right rows
    val expected = graft.core.Tables.orders(s, sf0001)
      .filter(col("o_orderstatus") === "P").count()
    assert(j.select(col("o_totalprice")).distinct().count() > 0 || expected == 0)
  }

  test("dd09's store probe is bloom-eligible once the store is materialized") {
    val s = bloomSession
    // A COMPUTED join key (md5 over the text) defeats InjectRuntimeFilter —
    // the probe must attach to a scan attribute to prune the big side. The
    // production shape materializes the fingerprint store (that is what a
    // "store" is), making fp a scan column; this test pins that contract.
    // fixed path under target/: overwritten per run, removed by sbt clean
    val dir = "target/tmp-bloomstore"
    graft.core.Tables.documents(s, sf0001)
      .select(col("doc_id"),
        substring(col("source"), 4, 10).cast("long").as("src_idx"),
        md5(graft.functions.Text.normText(col("text"))).as("fp"))
      .write.mode("overwrite").parquet(s"$dir/fps.parquet")
    val fps = s.read.parquet(s"$dir/fps.parquet")
    val store = fps.filter(col("src_idx") < 10).select(col("fp"))
    val batch = fps.filter(col("src_idx") === 19L) // one daily batch
    val j = store.join(batch, "fp")
    val opt = j.queryExecution.optimizedPlan.toString
    assert(opt.contains("bloom_filter_agg") || opt.contains("might_contain"),
      s"store probe no longer bloom-eligible:\n$opt")
  }
}
