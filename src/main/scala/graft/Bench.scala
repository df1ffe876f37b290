package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout, per the driver contract.
  *
  * Runs the HEADLINE queries: the scalable path for every operator family
  * (agg, join, window, as-of, dedup-LSH, text analysis, similarity). The
  * quadratic brute-force oracles (dd02, sim03) are correctness baselines,
  * not plans anyone would run at scale, so they are excluded here the same
  * way a 100 TB deployment would exclude them.
  *
  * Results are forced through the "noop" sink so select-only queries
  * cannot be short-circuited by count()-style column pruning.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q36_tpch_q5",
    "q04_window_rank",
    "q06_running_balance",
    "q09_semi_join",
    "q11_outer_join_agg",
    "q12_theta_join",
    "q13_asof_join",
    "q17_date_funcs",
    "q21_count_distinct",
    "q24_custom_udaf",
    "q27_pivot",
    "q28_percentiles",
    "q29_correlated_subq",
    "q31_approx_stats",
    "q32_range_frame",
    "st01_stateful_balance",
    "w01_tumbling_window",
    "w02_session_window",
    "ev01_funnel",
    "ev02_retention",
    "ev03_transitions",
    "ev04_rolling_zscore",
    "mm01_media_features",
    "mm03_media_embed_topk",
    "mm04_image_neardup",
    "dd01_exact_dedup",
    "dd03_minhash_lsh",
    "dd04_simhash",
    "dd07_repeated_spans",
    "dd08_decontaminate",
    "dd09_incremental_dedup",
    "dd10_dup_source_matrix",
    "dd11_substring_dedup",
    "dd12_streaming_neardup",
    "ta01_langid",
    "ta02_quality",
    "ta03_token_stats",
    "ta05_rolling_hash",
    "ta06_curation",
    "ta07_unigram_logprob",
    "ta12_bigram_logprob",
    "ta13_bpe_pairs",
    "ta08_vocab_encode",
    "ta09_repetition",
    "ta10_chunking",
    "ta11_pack_windows",
    "ta14_source_overlap",
    "ta15_pii",
    "sa01_stratified_sample",
    "sa02_domain_reweight",
    "sa03_hash_sample",
    "sa04_mixture_sample",
    "sa05_shard_assign",
    "sa06_dsir_weight",
    "pl01_pipeline",
    "cl01_quality_classifier",
    "ir01_bm25_topk",
    "ir02_inverted_index",
    "ir03_tfidf_terms",
    "dq01_profile",
    "dq02_constraints",
    "sim06_kmeans",
    // dd13 composes sim06's trainer with the within-cluster verify pass;
    // its pairwise work is cluster-confined (see semDedup's plan notes)
    "dd13_semdedup",
    // sim02 (bucketed ANN) and sim04 (IVF) are the scalable similarity
    // representatives; sim01 broadcasts the whole candidate set — an exact
    // oracle baseline like dd02/sim03, excluded here for the same reason
    "sim02_ann_lsh",
    "sim04_ivf_ann",
    "sim05_embed_neardup_lsh",
    "sim07_pq_ann",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // AMBIENT load, sampled before this JVM does any work: the bench itself
    // spikes loadavg, so only a pre-run sample distinguishes "machine was
    // busy" from "bench was running". Above cpus/8 the run is flagged
    // contended in the artifact and each query gets an extra timed attempt
    // (min over attempts — contention only ever adds time).
    def loadavg1: Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val ambientLoad = loadavg1
    val contended = ambientLoad > cpus.toDouble / 8.0
    if (contended)
      System.err.println(f"[bench] WARNING: ambient loadavg $ambientLoad%.2f > " +
        f"${cpus.toDouble / 8.0}%.1f (cpus/8) - machine is contended; timings " +
        "will be inflated. Flagging \"contended\":true and using min-of-3.")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // JVM/codegen warm-up on the smallest sf so measured times are the
    // steady-state engine, not janino compilation. A warm-up failure is
    // LOGGED (stderr; stdout stays the one JSON line) — silently skipping
    // it would charge janino compile time to the query's timed run.
    val warmDir = "/root/testdata/sf0.001"
    headline.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case t: Throwable =>
        System.err.println(s"[bench] WARM-UP FAILED for $n: ${t.getClass.getName}: ${t.getMessage}")
      }
    }

    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(",")
      catch { case _: Throwable => "" }
    val loadBefore = loadavg

    // two timed runs per query (three when contended), report the min —
    // damps GC/JIT noise so the number reflects the plan, not the weather
    // in this JVM. The cache is cleared before every attempt so intra-query
    // persist() stages are honestly recomputed each time; a query failing
    // ANY attempt reports -1 (a flaky query must not be certified with its
    // lucky run's time).
    val attempts = if (contended) 3 else 2
    val results = headline.map { name =>
      val times = (1 to attempts).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok = try { force(name); true } catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      (name, if (times.forall(_ >= 0)) times.min else -1.0, times)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-run spread + machine load: a contended sandbox shows up as a wide
    // run1/run2 gap and a high loadavg, so an inflated total is auditable
    // from the artifact itself instead of needing an idle-machine rerun
    val runs = results.map { case (k, _, ts) => "\"" + k + "\":[" + ts.mkString(",") + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"contended":$contended,"loadavg_ambient":$ambientLoad,"loadavg_start":"$loadBefore","loadavg_end":"$loadavg","sf":"$sfDir"}""")
    spark.stop()
  }
}
