package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import graft.SparkTestSession.{spark, sf0001}

/** Physical-plan regression tests: every 100 TB design claim made in the
  * operator scaladocs is pinned here, so a refactor that silently
  * de-optimizes a plan (adds an exchange, loses a broadcast, drops a
  * group-limit) fails CI instead of surfacing at cluster scale. */
class PlanAuditSpec extends AnyFunSuite {

  private def planOf(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  /** Every physical node reachable from `p`, descending through AQE
    * wrappers, cached-relation inner plans, and subquery plans — a tree
    * walk, so it stays sound even when the plan STRING is truncated by
    * `spark.sql.maxPlanStringLength`. */
  private def allPhysicalNodes(p: SparkPlan): Iterator[SparkPlan] = {
    val inner: Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq(s.relation.cachedPlan)
      case _ => Nil
    }
    Iterator(p) ++
      (p.children ++ p.subqueries ++ inner).iterator.flatMap(allPhysicalNodes)
  }
  private def count(plan: String, op: String): Int =
    op.r.findAllMatchIn(plan).length

  test("ta01/ta02/ta04: columnar text passes have ZERO exchanges") {
    for (df <- Seq(TextAnalysis.langIdQuery(spark, sf0001),
        TextAnalysis.qualityQuery(spark, sf0001),
        TextAnalysis.fingerprintQuery(spark, sf0001))) {
      val plan = planOf(df.limit(1))
      // the only allowed exchange is the final singlePartition for the
      // global orderBy/limit — none keyed by data
      assert(!plan.contains("hashpartitioning"),
        s"unexpected keyed exchange:\n$plan")
    }
  }

  test("sa01: stratified sample plans a WindowGroupLimit before the shuffle") {
    val plan = planOf(Curation.stratifiedSampleQuery(spark, sf0001))
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("ir01: bm25 top-k is TakeOrderedAndProject, stats join is broadcast") {
    val plan = planOf(Search.bm25TopK(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("dd08: decontamination joins the benchmark span set by broadcast") {
    // the pin targets the DERIVATION plan (what the xm06 memo build runs);
    // the consumer-facing decontaminate() reads the memo — pinned below
    val plan = planOf(Dedup.computeDecontam(spark, sf0001, "src0", 8))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the corpus span stream must NOT be exchanged for the bench join —
    // only per-doc aggregation and the final doc_id joins may shuffle
    assert(!plan.contains("SortMergeJoin"), plan)
    // the declared query consumes the session memo: its plan must be a
    // checkpoint scan + presentation sort, never a silent chain re-run
    Dedup.clearDecontamCache()
    try {
      val consumer = planOf(Dedup.decontaminate(spark, sf0001))
      assert(consumer.contains("Scan ExistingRDD"), consumer)
      assert(!consumer.contains("Generate"), consumer)
    } finally Dedup.clearDecontamCache()
  }

  test("q30: filters reach the parquet scan (PushedFilters)") {
    val plan = planOf(Relational.pushdownShowcase(spark, sf0001))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("IsNotNull") || plan.contains("GreaterThan"), plan)
  }

  test("q02: global top-k is TakeOrderedAndProject, not a full sort") {
    val plan = planOf(Relational.topOrders(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("blanket: no query in the whole inventory plans a CartesianProduct") {
    // every non-equi join must carry a broadcastable side (BNLJ) — an
    // unhinted cross product is never the plan we mean, in ANY query.
    // Some query builders persist intermediates (the LSH chain) — clear
    // the cache before AND after so this sweep neither reads another
    // test's cache nor leaks InMemoryRelations into later plan pins.
    spark.catalog.clearCache()
    try {
      val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
        .flatMap { case (name, f) =>
          try {
            val cartesian = allPhysicalNodes(f(spark, sf0001).queryExecution.executedPlan)
              .exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])
            if (cartesian) Some(name) else None
          } catch {
            case t: Throwable => Some(s"$name (plan failed: ${t.getMessage})")
          }
        }
      assert(offenders.isEmpty, s"cartesian plans: ${offenders.mkString(", ")}")
    } finally spark.catalog.clearCache()
  }

  test("q42: median window partitions by returnflag — no global sort before it") {
    val plan = planOf(Relational.exactStats(spark, sf0001))
    assert(plan.contains("hashpartitioning(l_returnflag"), plan)
    // exactly ONE range exchange: the final 3-row output orderBy — the
    // per-group median sort must ride the hash-partitioned window
    assert(count(plan, "rangepartitioning") == 1, plan)
  }

  test("q31: ONE ranked pass serves median + both bound quantiles") {
    // the audit's three order statistics must ride a single per-group
    // window sort (round-13 fusion) — the naive form derived three ranked
    // frames (6 Window nodes); a regression re-inflates this count
    val plan = planOf(Relational.approxStats(spark, sf0001))
    assert(count(plan, "Window ") <= 2, plan) // rn + per-group n
    assert(plan.contains("hashpartitioning(l_returnflag"), plan)
  }

  test("dd03: canonicalization groups fingerprints with map-side combine") {
    // the canonicalize-first exchange must carry PARTIAL aggregates (one
    // row per distinct text per map partition), so an exact-copy flood
    // collapses before it ever reaches the wire. Pinned on the UNMEMOIZED
    // derivation — minhashLshPairs itself now returns the session memo's
    // block scan (see the round-12 memo pin below).
    val plan = planOf(Dedup.minhashLshPairsTracked(spark, sf0001)._1.limit(1))
    assert(plan.contains("partial_min(doc_id"), plan)
  }

  test("sim01/sim08: only the query set is broadcast — the corpus streams") {
    for (df <- Seq(Similarity.bruteForceTopK(spark, sf0001, nQueries = 10),
        Similarity.mipsTopK(spark, sf0001, nQueries = 10))) {
      val plan = planOf(df)
      assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
      // the broadcast subtree must be the vec_id<10 QUERY slice, never the
      // full candidate table (the round-7 scale-killer this pin outlaws)
      val bx = plan.indexOf("BroadcastExchange")
      assert(bx >= 0 && plan.substring(bx).contains("LessThan(vec_id,10)"),
        s"broadcast subtree is not the filtered query set:\n$plan")
    }
  }

  test("sim09: bucket equi-join candidates, ids-only distinct, no cartesian") {
    val plan = planOf(Similarity.mipsLshTopK(spark, sf0001, nQueries = 10))
    assert(!plan.contains("CartesianProduct"), plan)
    // final scoring re-joins the query vectors by broadcast hash join
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("sim06: kmeans centroids are broadcast every iteration") {
    val plan = planOf(Similarity.kmeansAssign(spark, sf0001))
    // 3 assignment passes (2 iterations + final) — each broadcasts the
    // centroid table; none may degrade to a sort-merge or shuffled join
    assert(count(plan, "BroadcastNestedLoopJoin") >= 3, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("ta10: chunking is a pure flatMap — zero keyed exchanges") {
    // drop the harness-only orderBy: the operator itself must not shuffle
    val plan = planOf(TextAnalysis.chunkQuery(spark, sf0001).limit(1))
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("ta11: packing never plans a single-partition window over the docs") {
    val df = Curation.packWindowsQuery(spark, sf0001)
    val plan = planOf(df)
    // the unpartitioned window (cumsum in ONE task) may only appear over
    // the tiny BUCKET table; the document-side cumsum must be partitioned
    // by bucket. Physical form: `Window [exprs], [partition], [order]`.
    val docWindows = "Window \\[[^\\n]*\\], \\[bucket#\\d+L\\], \\[doc_id".r
      .findAllMatchIn(plan).length
    assert(docWindows == 1, s"$docWindows bucket-partitioned windows:\n$plan")
    // exactly one single-partition exchange — the bucket-offset prefix sum
    // — and it must consume the per-bucket AGGREGATE (tiny), not documents
    val singles = count(plan, "Exchange SinglePartition")
    assert(singles == 1, s"$singles single-partition exchanges:\n$plan")
    val afterSingle = plan.substring(plan.indexOf("Exchange SinglePartition"))
    assert(afterSingle.contains("HashAggregate(keys=[bucket"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ta08: vocab rank is distributed — no single-task window over words") {
    val plan = planOf(TextAnalysis.vocabEncodeQuery(spark, sf0001))
    assert(plan.contains("rangepartitioning(c#"), plan)
    // the only single-partition exchange may be the tiny per-chunk offset
    // table (aggregated by pid), never the word-level vocab itself
    val singles = count(plan, "Exchange SinglePartition")
    assert(singles == 1, s"$singles single-partition exchanges:\n$plan")
    val afterSingle = plan.substring(plan.indexOf("Exchange SinglePartition"))
    assert(afterSingle.contains("HashAggregate(keys=[pid"), plan)
  }

  test("sim07: PQ scan joins codes x broadcast LUTs; codebook never SMJs") {
    val plan = planOf(Similarity.pqTopK(spark, sf0001))
    // encode pass: corpus x broadcast codebook; scan pass: codes x
    // broadcast query LUTs — no sort-merge join may appear anywhere
    assert(count(plan, "BroadcastNestedLoopJoin") >= 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("sa03: hash sampling is a pure map filter — only the output sort exchanges") {
    val plan = planOf(Curation.hashSampleQuery(spark, sf0001))
    assert(count(plan, "Exchange") == 1, plan) // the harness orderBy only
    assert(plan.contains("rangepartitioning(doc_id"), plan)
  }

  test("ev02: retention aggregates raw events before any join; no windows") {
    val plan = planOf(Windows.retentionQuery(spark, sf0001))
    assert(!plan.contains("Window ["), plan)
    // the (user, day) distinct must sit directly on the scan side — the
    // raw event stream is never joined or re-shuffled unaggregated
    assert(plan.contains("HashAggregate(keys=[user_id"), plan)
  }

  test("sa04: mixture sampling broadcasts the rate table; corpus never SMJs") {
    val plan = planOf(Curation.mixtureSampleQuery(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the corpus probe side must not be exchanged before the rate join —
    // the only keyed exchange is the tiny per-source count aggregation
    assert(count(plan, "hashpartitioning\\(source") <= 1, plan)
  }

  test("sa05: shard assignment shuffles by shard only — no global sort window") {
    val plan = planOf(Curation.shardAssignQuery(spark, sf0001))
    assert(plan.contains("hashpartitioning(shard"), plan)
    // exactly one KEYED exchange (by shard) + the output range sort; the
    // round-robin widen from Tables.parallel carries no key
    assert(count(plan, "hashpartitioning") == 1, plan)
    assert(count(plan, "rangepartitioning") == 1, plan)
    assert(!plan.contains("SinglePartition, Window"), plan)
  }

  test("ev03: transitions shuffle the events once, keyed by user") {
    val plan = planOf(Windows.transitionsQuery(spark, sf0001))
    assert(plan.contains("hashpartitioning(user_id"), plan)
    assert(count(plan, "hashpartitioning\\(user_id") == 1, plan)
  }

  test("q36: six-table Q5 pushes the date filter and broadcasts every dim") {
    val plan = planOf(Relational.localSupplierRevenue(spark, sf0001))
    // the date window must reach the orders parquet scan
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), plan)
    // supplier/customer/nation/region all broadcast (at test SF the
    // filtered orders side broadcasts too); the only join EVER allowed to
    // shuffle is lineitem x orders on the order key
    assert(count(plan, "BroadcastHashJoin") >= 4, plan)
    assert(count(plan, "SortMergeJoin|ShuffledHashJoin") <= 1, plan)
  }

  test("ir03: tf-idf top-k plans a WindowGroupLimit; stats row broadcasts") {
    val plan = planOf(Search.tfIdfTopTerms(spark, sf0001))
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("q03: dimension joins are broadcast at dimension scale") {
    val plan = planOf(Relational.revenueByNation(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("dd12: candidate stage shuffles once on the bucket key; verdict joins broadcast") {
    import graft.state.NearDupStream
    val cands = NearDupStream.candidates(
      NearDupStream.bandedDocs(graft.core.Tables.documents(spark, sf0001)))
    val cPlan = planOf(cands.toDF())
    // exactly ONE keyed exchange: the groupByKey on (band, bh) feeding the
    // stateful fold — the corpus is never shuffled a second time and never
    // self-joined
    assert(count(cPlan, "hashpartitioning") == 1, cPlan)
    assert(!cPlan.contains("SortMergeJoin") && !cPlan.contains("Cartesian"), cPlan)
    // verdict: the candidate-id set broadcasts into the shingle probe and
    // the per-doc verdict joins — the corpus-sized side never SMJs
    val vPlan = planOf(NearDupStream.streamingNearDup(spark, sf0001))
    assert(vPlan.contains("BroadcastHashJoin"), vPlan)
    assert(!vPlan.contains("CartesianProduct"), vPlan)
  }

  test("ta14: the fused tagged stream is one corpus scan, one keyed exchange") {
    // the builder's own plan — the full query reads it through a cache, so
    // string-counting scans there would double-count the cached subtree.
    // An earlier suite may have left that cache entry behind (same logical
    // plan → CacheManager substitution, whose executed-AQE printout repeats
    // the exchange in Initial/Final sections) — drop it first
    TextAnalysis.taggedSourceCounts(spark, sf0001).unpersist(blocking = true)
    val plan = planOf(TextAnalysis.taggedSourceCounts(spark, sf0001))
    // the tagged-union explode feeds one aggregation — a second documents
    // scan would mean the words/bigrams fusion regressed to two passes
    assert(count(plan, "documents\\.parquet") == 1, plan)
    assert(count(plan, "hashpartitioning") == 1, plan)
    val full = planOf(TextAnalysis.sourceOverlapQuery(spark, sf0001))
    assert(!full.contains("CartesianProduct"), full)
  }

  test("dd13: pair join is salted hash equi; verdict join broadcasts") {
    val plan = planOf(Similarity.semDedup(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // the within-cluster pair pass must be a HASH equi-join keyed by
    // (cluster, salt) — the kmeans assign stage inside legitimately uses a
    // BroadcastNestedLoopJoin (every vector x k broadcast centroids), so
    // the pin targets the pair join's keys, not join types globally
    assert("Join \\[ca#\\d+L?, sa#\\d+".r.findFirstIn(plan).isDefined, plan)
    // the drop set joins back as a broadcast anti-side, like dd06
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ta15: the PII scrub is a zero-exchange columnar pass") {
    val plan = planOf(TextAnalysis.piiQuery(spark, sf0001).limit(1))
    // like ta01/ta02: regex extraction, Luhn filter, redaction and md5 are
    // all per-row — any keyed exchange means the scrub stopped being an
    // embarrassingly parallel map
    assert(!plan.contains("hashpartitioning"), s"unexpected keyed exchange:\n$plan")
  }

  test("sa06: scoring join is word-keyed, totals broadcast, no cartesian blowup") {
    // drop any word-stats cache entry an earlier suite left (same
    // executed-AQE printout problem as ta14's tagged stream)
    Curation.dsirWordStats(spark, sf0001).unpersist(blocking = true)
    val plan = planOf(Curation.dsirWeightQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // the one-row totals frame must ride a broadcast, never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    // the uncached plan tokenizes the corpus at most three times (word
    // stats, totals, doc-word side); in production the persisted word-stats
    // cache collapses the first two — the pin guards against any FURTHER
    // re-scan creeping in (e.g. a per-total or per-join corpus pass)
    assert(count(plan, "documents\\.parquet") <= 3, plan)
  }

  test("pl01: manifest joins only, bench spans broadcast, shard window partitioned") {
    val plan = planOf(Pipeline.pipelineQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // the verdict/decontam manifests join the base scan by broadcast (the
    // round-14 memos hand the composition doc-keyed manifests; dd08's
    // benchmark-span broadcast is pinned on the xm06 build plan instead)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the shard/pos window is partitioned on the synthetic pk (kept rows by
    // shard, dropped rows by spread keys) — a global (unpartitioned) window
    // over the manifest would serialize the corpus
    assert(plan.matches("(?s).*Window \\[row_number\\(\\) windowspecdefinition\\(pk#.*"), plan)
    // the staged manifest is computed exactly ONCE in-plan (the r5 shape
    // computed it twice behind a persist whose cache entry outlived the
    // query): the stage-cascade CASE appears in one Project only
    assert(count(plan, "ELSE kept END AS stage#") == 1, plan)
  }

  test("mm04: hamming cut sits under the pair distinct's exchange") {
    val plan = planOf(Multimodal.imageNearDupQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // filter-before-distinct: the distinct's hashpartitioning exchange must
    // see only hamming-surviving pairs, so bit_count appears BELOW the
    // first keyed exchange over (media_a, media_b)
    val iFilter = plan.indexOf("bit_count")
    val iDistinct = plan.indexOf("hashpartitioning(media_a")
    assert(iFilter >= 0 && iDistinct >= 0 && iFilter > iDistinct,
      s"hamming cut not below the distinct exchange:\n$plan")
  }

  test("cl01: no keyed exchange in scoring; training cache does not leak") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Classifier.qualityClassifierQuery(spark, sf0001)
    // the training cache must be dropped by the time the query returns —
    // no RDD blocks outlive the call (r5 review item)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
    val plan = planOf(df)
    // scoring is a recomputed columnar scan with embedded weight literals —
    // no cache read, zero shuffles except the harness orderBy
    assert(!plan.contains("InMemoryTableScan"), plan)
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("ev05: ONE user-keyed exchange serves lag, running sum and the session agg") {
    val plan = planOf(Windows.sessionizeQuery(spark, sf0001))
    assert(plan.contains("hashpartitioning(user_id"), plan)
    // the (user_id, session_idx) aggregate must REUSE the window's user_id
    // partitioning (subset-key clustering) — a second keyed exchange would
    // re-shuffle every event
    assert(count(plan, "hashpartitioning") == 1, plan)
  }

  test("ir04: boolean retrieval is a zero-shuffle scan + TakeOrderedAndProject") {
    val plan = planOf(Search.booleanRetrieval(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("Join"), plan) // no index, no stats join — one pass
  }

  test("dq03: corpus never shuffles — only bucket-scale keyed exchanges") {
    val plan = planOf(DataQuality.driftPsiQuery(spark, sf0001))
    // (feature, bucket) count + feature window: exactly two keyed exchanges,
    // both over bucket-scale rows (the stack() long form collapses map-side)
    assert(count(plan, "hashpartitioning") == 2, plan)
    assert(plan.contains("hashpartitioning(feature"), plan)
  }

  test("sa07: ONE corpus scan; normalizers are windows over the count table") {
    val plan = planOf(Curation.temperatureMixQuery(spark, sf0001))
    // no join at all — totals ride single-partition windows over 20 rows
    assert(!plan.contains("Join"), plan)
    assert(count(plan, "FileScan") == 1, plan)
    // one keyed exchange: the per-source count
    assert(count(plan, "hashpartitioning") == 1, plan)
  }

  test("ta16: token stream reduces map-side; two vocabulary-scale exchanges only") {
    val plan = planOf(TextAnalysis.lexicalStatsQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning") == 2, plan)
    assert(plan.contains("hashpartitioning(source, word") ||
      plan.contains("hashpartitioning(source#"), plan)
  }

  test("mm05: frame signals shuffle once, keyed by media; payload never exchanges") {
    val plan = planOf(Multimodal.sceneCutQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning\\(media_id") == 1, plan)
    assert(count(plan, "hashpartitioning") == 1, plan)
    // the lag window reads (media_id, frame_idx, f) — raw bytes stay map-side
    assert(!plan.contains("frame_bytes"), plan)
  }

  test("dd14/dd15: cluster consumers read a text-pruned corpus scan") {
    // (the cached LSH lineage legitimately reads text — the claim here is
    // that the CONSUMER-side corpus scan is pruned to ids + n_chars)
    val p14 = planOf(Dedup.canonicalSelect(spark, sf0001))
    // both window functions (row_number + member count) share ONE
    // cluster-keyed exchange
    assert(count(p14, "hashpartitioning\\(cluster_id") == 1, p14)
    assert(p14.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), p14)
    val p15 = planOf(Dedup.softDedup(spark, sf0001))
    assert(p15.contains("ReadSchema: struct<doc_id:bigint>"), p15)
  }

  test("pl03: composition joins manifests only; boost table broadcasts") {
    val plan = planOf(Pipeline.trainingWeightsQuery(spark, sf0001))
    // the tiny per-source boost table joins by broadcast, never SMJ
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin [source"), plan)
    // the composition's own corpus read is pruned to (doc_id, source) —
    // text is only read inside the sub-operators' audited passes
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"), plan)
  }

  test("ev06: ONE user-keyed exchange, no join; type filter reaches the scan") {
    val plan = planOf(Windows.attributionQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning") == 1, plan)
    assert(plan.contains("hashpartitioning(user_id"), plan)
    assert(!plan.contains("Join"), plan)
    // the 3-type IN filter pushes to the parquet scan — at 100 TB the
    // non-participating event types never leave the reader
    assert(plan.contains("PushedFilters: [In(event_type"), plan)
  }

  test("dq04: event stream collapses to the (type, day) matrix before any window") {
    val plan = planOf(DataQuality.volumeAnomalyQuery(spark, sf0001))
    // count shuffle keyed (event_type, day) + moment window keyed
    // event_type — both over matrix-scale rows, map-side partials first
    assert(count(plan, "hashpartitioning") == 2, plan)
    assert(plan.contains("partial_count"), plan)
  }

  test("ir05: posting lists filter before the join; corpus scan is two columns") {
    val plan = planOf(Search.phraseSearch(spark, sf0001))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the phrase-term filter sits under the Generate's consumer side —
    // the join never sees the full token stream
    assert(plan.contains("w#") || plan.contains("IN (table,scan)") ||
      plan.contains("w IN"), plan)
  }

  test("sa08: ONE corpus scan, ONE keyed exchange; planner math is windows") {
    val plan = planOf(Curation.epochPlanQuery(spark, sf0001))
    assert(!plan.contains("Join"), plan)
    assert(count(plan, "FileScan") == 1, plan)
    assert(count(plan, "hashpartitioning") == 1, plan)
  }

  test("mm06: zero exchanges — decode, framing and stats all map-side") {
    val plan = planOf(Multimodal.audioFramesQuery(spark, sf0001))
    assert(!plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("cl02: lang stats broadcast; no text in any exchange") {
    val plan = planOf(Classifier.naiveBayesLangQuery(spark, sf0001))
    // the |langs|-row stats and totals join by broadcast, never SMJ
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin [cand_lang"), plan)
    // exchanges carry token/count rows, never the document text
    assert(!plan.contains("hashpartitioning(text"), plan)
  }

  test("dd17: linear segment stream — key exchanges only, no pair work") {
    val plan = planOf(Dedup.boilerplateStrip(spark, sf0001).limit(1))
    assert(!plan.contains("CartesianProduct"), plan)
    // the boilerplate vote collapses map-side BEFORE the wire (distinct
    // (seg, doc) partial agg), and no exchange ever carries document text
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      plan)
    assert(!plan.contains("hashpartitioning(clean_text"), plan)
    assert(!plan.contains("hashpartitioning(text"), plan)
  }

  test("dd18: bench set broadcasts; argmax combines map-side, no window") {
    val plan = planOf(Dedup.semanticDecontaminate(spark, sf0001).limit(1))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
    // the per-vector argmax is an aggregate (one struct of state per
    // vector, partial-combined before the exchange) — never a window sort
    assert(plan.contains("partial_max") || plan.contains("partial max"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("sa10: key pass is columnar; selection is a top-n, never a global sort") {
    val plan = planOf(Curation.weightedSampleQuery(spark, sf0001))
    // per-partition heaps + one n-row assembly — no corpus-scale exchange
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("sim10: both corpus passes broadcast only bounded sets") {
    val plan = planOf(Similarity.marginMining(spark, sf0001, nQueries = 10))
    assert(!plan.contains("CartesianProduct"), plan)
    // forward pass: query slice broadcast; reverse pass: k*|Q| candidate
    // set broadcast — two BNLJs, corpus side streaming in both
    assert(count(plan, "BroadcastNestedLoopJoin BuildRight") >= 2, plan)
    // the broadcast subtrees are the vec_id<20 slice / the fwd-derived
    // candidate set — never an unfiltered embeddings scan (the filter
    // renders as a parquet PushedFilter or, when a sibling test's persist
    // substitutes a cached relation, as an InMemoryTableScan predicate)
    assert(plan.contains("LessThan(vec_id,20)") ||
      """vec_id#\d+L? < 20""".r.findFirstIn(plan).nonEmpty, plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("sim08: MIPS scan broadcasts the queries; per-query top-k group-limits") {
    val plan = planOf(Similarity.mipsTopK(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("mm03: only the query slice is broadcast — the decoded corpus streams") {
    val plan = planOf(Multimodal.mediaEmbedTopK(spark, sf0001, nQueries = 20))
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
    // the broadcast subtree must be the media_id<20 QUERY slice, never the
    // full embedded corpus (the sim08 scale-killer shape, outlawed here too)
    val bx = plan.indexOf("BroadcastExchange")
    assert(bx >= 0 && plan.substring(bx).contains("(media_id#") &&
      plan.substring(bx).contains("< 20"),
      s"broadcast subtree is not the filtered query slice:\n$plan")
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("ev07: counts collapse map-side; top-k is a WindowGroupLimit") {
    val plan = planOf(Windows.heavyHittersQuery(spark, sf0001))
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("ta18: ONE vocab-scale shuffle; rank cut to topN before the source exchange") {
    val plan = planOf(TextAnalysis.zipfFitQuery(spark, sf0001))
    assert(plan.contains("WindowGroupLimit"), plan)
    assert("hashpartitioning\\(source#\\d+, word#".r.findFirstIn(plan).nonEmpty, plan)
  }

  test("q38: latest-wins is a map-side-combined aggregate, not a window") {
    val plan = planOf(Relational.latestSnapshot(spark, sf0001))
    assert(plan.contains("partial_max") || plan.contains("partial max"), plan)
    assert(!plan.contains("Window"), s"latest-wins must not be a window:\n$plan")
    assert(count(plan, "hashpartitioning\\(user_id") == 1, plan)
  }

  test("ev08: ONE user-keyed exchange serves all windows; top-k is TakeOrdered") {
    val plan = planOf(Windows.pathNgramsQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning\\(user_id") == 1,
      s"all windows must share the user_id exchange:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("partial_count"), plan)
  }

  test("ir06: df band joins back by broadcast; pair top-k is TakeOrdered") {
    val plan = planOf(Search.pmiCooccurQuery(spark, sf0001))
    assert(count(plan, "BroadcastHashJoin") >= 1, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the doc-keyed self-join must be an equi-join, never a cartesian
    assert(!plan.contains("CartesianProduct"), plan)
    // round-15: per-doc presence comes from array_distinct (partition-
    // local), never a corpus-scale (doc_id, term) distinct exchange
    assert(plan.contains("array_distinct"), plan)
    assert(count(plan, "hashpartitioning\\(doc_id[#,][^\\n]*term") == 0,
      s"presence dedup must not shuffle (doc_id, term):\n$plan")
  }

  test("sk02: counter build combines map-side; probe joins by broadcast") {
    val plan = planOf(Sketch.cmsHeavyQuery(spark, sf0001))
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("cl03: train side broadcasts; neighbor cut is a WindowGroupLimit") {
    // the scoring plan lives in the UNMEMOIZED derivation — consumers get
    // the session-memoized checkpoint (next pin)
    val plan = planOf(Classifier.knnNeighborsUncached(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("cl03/cl04/cl07: consumers read the memoized neighbor cut — no embedding rescan (round-11)") {
    // the 100× rehearsal measured cl04 at 1197 s ≈ 2× cl03's 598 s: the
    // confusion report re-paid the whole test×train scoring. Consumers
    // must now plan over the |test|×maxK checkpoint: a FileScan of the
    // embeddings table reappearing here means the memo regressed.
    Classifier.knnClassifierQuery(spark, sf0001).collect() // populate memo
    for (df <- Seq(Classifier.knnClassifierQuery(spark, sf0001),
        Classifier.confusionReportQuery(spark, sf0001))) {
      val plan = planOf(df)
      assert(!plan.contains("FileScan"), plan)
      assert(plan.contains("Scan ExistingRDD") || plan.contains("LogicalRDD") ||
        plan.contains("ExistingRDD"), plan)
    }
  }

  test("dd03/dd05/dd06: consumers read the session-memoized pair set — no LSH re-derivation (round-12)") {
    // the 100× rehearsal measured sk03 re-paying dd03's full 240 s chain
    // and pl04's remaining 322 s was mostly the same re-pay: every
    // graph-shaped consumer must now plan over the checkpointed pair
    // blocks. A documents-table FileScan reappearing in the PAIR-only
    // plans below means the memo regressed.
    Dedup.minhashLshPairs(spark, sf0001).collect() // populate the memo
    val p1 = planOf(Dedup.minhashLshPairs(spark, sf0001))
    assert(!p1.contains("FileScan"), p1)
    assert(p1.contains("ExistingRDD") || p1.contains("LocalTableScan") ||
      p1.contains("InMemoryTableScan"), p1)
    // a cluster consumer: labels derive from the memo (LocalTableScan on
    // the driver path at this sf), never the shingle chain
    val p2 = planOf(Dedup.dupClusters(spark, sf0001))
    assert(!p2.contains("FileScan"), p2)
    // an apply consumer: its only corpus work is the retained-corpus
    // anti-join — exactly ONE documents FileScan, zero shingle work
    val p3 = planOf(Dedup.dedupApply(spark, sf0001))
    assert(count(p3, "FileScan") == 1, p3)
    assert(!p3.contains("minhash") && !p3.contains("shingle"), p3)
  }

  test("cl03: forced-IVF routing joins inverted lists keyed by centroid") {
    val plan = planOf(Classifier.knnNeighborsUncached(spark, sf0001,
      maxTrainBroadcastBytes = 0L))
    assert(plan.contains("WindowGroupLimit"), plan)
    // the candidate scan is an equi-join keyed by centroid id — the train
    // table is never on the build side of a nested-loop broadcast
    assert(plan.contains("hashpartitioning(cid"), plan)
  }

  test("sa09: cluster labels broadcast onto an id-pruned corpus scan") {
    val plan = planOf(Curation.clusterSplitQuery(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"), plan)
  }

  test("sk03: pair joins + doc prefilter broadcast; signatures never exchange") {
    val plan = planOf(Sketch.minhashEstimateQuery(spark, sf0001))
    assert(count(plan, "BroadcastHashJoin") == 4, plan) // semi per side + two key joins
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ev09: events collapse to the (type, day) matrix before the window") {
    val plan = planOf(Windows.ewmaAnomalyQuery(spark, sf0001))
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("hashpartitioning(user_id"), plan)
  }

  test("cl04: the report adds only label-scale work over the kNN core") {
    // since the round-11 memo the kNN core is a checkpointed block scan —
    // the report is two label-scale aggregates + a |labels|-row full
    // outer join over it, and must NOT re-derive the scoring (FileScan)
    val plan = planOf(Classifier.confusionReportQuery(spark, sf0001))
    assert(!plan.contains("FileScan"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q39: melt expands AFTER the aggregate, never the corpus") {
    val plan = planOf(Relational.unpivotLineitem(spark, sf0001))
    assert(plan.contains("Expand"), plan)
    // Expand must sit above the final aggregate, i.e. the scan-side
    // partial aggregation is still present below it
    assert(plan.contains("partial_count"), plan)
  }

  test("q40: ONE orderkey aggregate; lambdas add no exchange") {
    val plan = planOf(Relational.arrayHofQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning") == 1, plan)
    assert(plan.contains("partial_collect_list") ||
      plan.contains("partial_sort_array"), plan)
  }

  test("ir07: KWIC is a zero-exchange columnar pass") {
    val plan = planOf(Search.kwicQuery(spark, sf0001).limit(1))
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("gr02: oriented triangle joins broadcast; no cartesian (distributed path)") {
    // sf0.001's pair count routes through the driver fold, so pin the
    // distributed internals directly (the gr01 convention)
    val (pairs, _) = Dedup.materializedVerifiedPairs(spark, sf0001)
    try {
      val plan = planOf(Graph.distributedTriangles(pairs))
      assert(!plan.contains("CartesianProduct"), plan)
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally () // pair frame is the session memo's checkpoint - never unpersist
  }

  test("q41: multiset ops plan as count aggregates, no pairwise join blowup") {
    val plan = planOf(Relational.setOpsAllQuery(spark, sf0001))
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the priority filter reaches the scan
    assert(plan.contains("PushedFilters"), plan)
  }

  test("er03: labels broadcast onto a text-pruned scan; merge combines map-side") {
    val plan = planOf(Resolution.goldenRecordQuery(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"), plan)
  }

  test("sk04: each branch is ONE type-keyed exchange; the agg rides the window sort") {
    val plan = planOf(Sketch.sampleQuantilesQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning\\(event_type") == 2, plan)
  }

  test("pl04: labels broadcast; the card aggregate combines map-side; no text exchanges") {
    val plan = planOf(Pipeline.datasetCardQuery(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("hashpartitioning(text"), plan)
  }

  test("ev10: ONE user-keyed exchange feeds the session aggregate") {
    val plan = planOf(Windows.sessionBounceQuery(spark, sf0001))
    // exactly ONE single-key user exchange (the window); the session
    // aggregate rides its sort as an exchange-free SortAggregate
    assert(count(plan, "hashpartitioning\\(user_id#\\d+L?, \\d+\\)") == 1, plan)
    assert(plan.contains("partial_count"), plan)
  }

  test("ir08: LM top-k is TakeOrderedAndProject; the stats row broadcasts") {
    val plan = planOf(Search.lmDirichletTopK(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("cl05: the centroid grid broadcasts; the test stream never SMJs") {
    val plan = planOf(Classifier.centroidClassifierQuery(spark, sf0001))
    // |labels| x dim centroid rows join the test vectors by broadcast —
    // the embedding stream itself must never be the build side
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("cl06: the min/max row broadcasts; bins aggregate map-side") {
    val plan = planOf(Classifier.calibrationReportQuery(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("ev11: the |types|-row prediction table joins by broadcast") {
    val plan = planOf(Windows.markovNextQuery(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // both branches key their window exchange on user_id; the final join
    // must never shuffle the user stream against the tiny argmax table
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("sim11: only the query bag is broadcast — the candidate vectors stream") {
    val plan = planOf(Similarity.maxSimTopK(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
    // the broadcast subtree is the bounded vec_id slice, never the corpus
    val bx = plan.indexOf("BroadcastExchange")
    assert(bx >= 0 && plan.substring(bx).contains("LessThan(vec_id,50)"),
      s"broadcast subtree is not the bounded query bag:\n$plan")
  }

  test("gr03: wedges enumerate via a center-keyed equi-join, ids only") {
    val plan = planOf(Graph.adamicAdarQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // the operator never touches the corpus — no text column anywhere
    assert(!plan.contains("text#"), plan)
  }

  test("ta19: char entropy is a zero-exchange columnar pass") {
    val plan = planOf(TextAnalysis.charEntropyQuery(spark, sf0001).limit(1))
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("sk05: ONE term-keyed exchange; counters combine map-side") {
    val plan = planOf(Sketch.amsF2Query(spark, sf0001))
    assert(count(plan, "hashpartitioning") == 1, plan)
    assert(plan.contains("partial_sum"), plan)
  }

  test("ev12: ONE user-keyed exchange serves lag and the gap aggregate") {
    val plan = planOf(Windows.cadenceQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning\\(user_id#\\d+L?, \\d+\\)") == 1, plan)
  }

  test("mm07: frame bytes never reach an exchange — sigs only") {
    val plan = planOf(Multimodal.videoNearDupQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("hashpartitioning(frame_bytes"), plan)
    assert(!plan.contains("hashpartitioning(bytes"), plan)
  }

  test("ir09: the eval composes the audited retrieval plans — no cartesian") {
    val plan = planOf(Similarity.annRecallQuery(spark, sf0001, nQueries = 10))
    assert(!plan.contains("CartesianProduct"), plan)
    // the sim01 broadcast-direction contract must survive the composition
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
  }

  test("dq06: child scans read ONLY the FK column; dims join broadcast") {
    val plan = planOf(DataQuality.refIntegrityQuery(spark, sf0001))
    // column pruning: the lineitem scans must not read beyond the FK
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint>"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("dq05: one fused source-keyed aggregate — no joins, no second scan") {
    val plan = planOf(DataQuality.completenessQuery(spark, sf0001))
    assert(!plan.contains("Join"), plan)
    // exactly one source-only exchange (the distinct-lang expand adds a
    // (source, lang)-keyed one, which the source-only pattern must not count)
    assert(count(plan, "hashpartitioning\\(source#\\d+, \\d+\\)") == 1, plan)
    assert(count(plan, "FileScan parquet") == 1, plan)
  }

  test("ev13: conditional firsts ride ONE user exchange — no window") {
    val plan = planOf(Windows.conversionLagQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning\\(user_id#\\d+L?, \\d+\\)") == 1, plan)
    assert(!plan.contains("Window"), plan.take(4000))
  }

  test("ir10: fusion runs on top-k results — the corpus is never joined") {
    val plan = planOf(Search.rrfFusionTopK(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // both base rankings keep their TakeOrderedAndProject top-k shape
    assert(count(plan, "TakeOrderedAndProject") >= 2, plan)
  }

  test("ir11: feedback ids broadcast onto the ONE vocabulary-scale pass") {
    val plan = planOf(Search.queryExpansionTerms(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // the feedback set joins broadcast; the (term, doc) aggregate is the
    // only corpus-keyed exchange family
    assert(count(plan, "BroadcastHashJoin") >= 1, plan)
    assert(count(plan, "TakeOrderedAndProject") >= 2, plan)
  }

  test("ta20: reference grams broadcast — no corpus shuffle keyed on gram alone") {
    val plan = planOf(TextAnalysis.rougeQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // heads, refc and reftot are all per-source-bounded: broadcast joins
    assert(count(plan, "BroadcastHashJoin") >= 3, plan)
    assert(count(plan, "hashpartitioning\\(gram#\\d+, \\d+\\)") == 0, plan)
  }

  test("ta21: readability is a zero-exchange columnar pass") {
    val plan = planOf(TextAnalysis.readabilityQuery(spark, sf0001).limit(1))
    assert(!plan.contains("Join"), plan)
    assert(count(plan, "FileScan parquet") == 1, plan)
    // the only allowed exchange family is the output sort, never a hash
    assert(count(plan, "hashpartitioning") == 0, plan)
  }

  test("ev14: decay terms ride ONE user exchange; reference time broadcasts") {
    val plan = planOf(Windows.decayEngagementQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning\\(user_id#\\d+L?, \\d+\\)") == 1, plan)
    // the 1-row max joins back as a broadcast, never a shuffle of events
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("gr04: k-core peels run on ids only — the corpus never joins") {
    val plan = planOf(Graph.kcoreQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("text#"), plan)
  }

  test("sk06: pairwise set ops run on sketch rows; merged bottom-K broadcasts") {
    val plan = planOf(Sketch.kmvSetOpsQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // the OR-membership expansion against the K-per-source sketch table is
    // the broadcast nested loop the scaladoc promises — sketch-scale rows
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ir12: NDCG folds run on top-k rows — corpus cost is the two base scans") {
    val plan = planOf(Search.ndcgEvalQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(count(plan, "TakeOrderedAndProject") >= 2, plan)
    // gold is consumed twice (grade join + ideal fold) and each base
    // ranking pays its stats+scoring double scan, so the STATIC plan shows
    // 6 scans; at runtime AQE's exchange reuse collapses the duplicated
    // subtrees (measured: 4 ReusedExchange nodes in the executed plan)
    assert(count(plan, "FileScan parquet") <= 6, plan)
  }

  test("dd19: containment joins on tokens of DISTINCT texts — no cartesian") {
    val plan = planOf(Dedup.containmentPairs(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the intersection count is a token-keyed EQUI-join (Σ df²/2), never a
    // pairwise doc join — broadcast at tiny SF, shuffle at scale
    assert(count(plan,
      "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[w#\\d+") >= 1, plan)
  }

  test("ta22: one gram-keyed corpus exchange; the restore join prunes to doc_id") {
    val plan = planOf(TextAnalysis.noveltyQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning\\(gram#\\d+, \\d+\\)") == 1, plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"), plan)
  }

  test("dq07: snapshot diff is ONE fused custkey aggregate — no join, pruned scan") {
    val plan = planOf(DataQuality.snapshotDiffQuery(spark, sf0001))
    assert(!plan.contains("Join"), plan)
    assert(count(plan, "FileScan parquet") == 1, plan)
    // both snapshots read the same pruned columns; no status/priority
    assert(!plan.contains("o_orderstatus") && !plan.contains("o_orderpriority"),
      plan)
  }

  test("ev15: corpus collapses at the (type, day) aggregate; windows run day-grain") {
    val plan = planOf(Windows.cusumQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning") == 2, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("ir13: BM25F keeps ir01's columnar shape — no explode, stats broadcast, top-k") {
    val plan = planOf(Search.bm25fTopK(spark, sf0001))
    assert(!plan.contains("Generate"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("ev16: per-user flags ride ONE user exchange — no join anywhere") {
    val plan = planOf(Windows.abTestQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning\\(user_id#\\d+L?, \\d+\\)") == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("cl07: the ensemble composes embedding-side plans — never the corpus") {
    val plan = planOf(Classifier.ensembleQuery(spark, sf0001))
    assert(!plan.contains("text#"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the kNN voters keep their WindowGroupLimit neighbor cut
    assert(count(plan, "WindowGroupLimit") >= 2, plan)
  }

  test("dd20: the sweep never recomputes dedup per radius — grid joins broadcast") {
    val plan = planOf(Dedup.hammingSweepQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // the radius comparisons are broadcast nested loops against a 4-row grid
    assert(count(plan, "BroadcastNestedLoopJoin") >= 2, plan)
  }

  test("ir14: snippet scoring is confined to the broadcast top-k docs") {
    val plan = planOf(Search.snippetQuery(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(count(plan, "BroadcastHashJoin") >= 1, plan)
    // window scoring is HOF arithmetic, not an explode of the corpus
    assert(!plan.contains("Generate"), plan)
  }

  test("ta23: merge rounds run on the persisted vocabulary, best pairs top-1") {
    val plan = planOf(TextAnalysis.bpeMergesQuery(spark, sf0001))
    // the corpus word-count aggregate is cached once; rounds re-read the
    // cache, never the parquet
    assert(plan.contains("InMemoryTableScan"), plan)
    assert(count(plan, "TakeOrderedAndProject") >= 3, plan)
  }

  test("dq08: per-table audits are join-free and prune to the key columns") {
    val plan = planOf(DataQuality.keyUniquenessQuery(spark, sf0001))
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint>"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>"),
      plan)
  }

  test("q43: the salt is in the plan — hashed spread left, replicated right") {
    val plan = planOf(Relational.saltedJoinQuery(spark, sf0001))
    assert(plan.contains("xxhash64"), plan)
    // the right side replicates via explode (sequence(0, buckets-1) may be
    // constant-folded to an array literal), and the join key carries the salt
    assert(plan.contains("explode("), plan)
    assert(plan.contains("__salt"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("mm08: payloads reduce to signatures before any join; sig equi-join only") {
    val plan = planOf(Multimodal.audioNearDupQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("md5"), plan)
  }

  test("cl08: the agreement join is doc-keyed ids+labels — no cartesian") {
    val plan = planOf(Classifier.langAgreementQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("sa11: assignment rides ONE user exchange — no join anywhere") {
    val plan = planOf(Curation.temporalSplitQuery(spark, sf0001))
    assert(count(plan, "hashpartitioning\\(user_id#\\d+L?, \\d+\\)") == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("dd21: fused sampled containment — one token equi-join, no window, no re-expansion") {
    val plan = planOf(Dedup.containmentPairsSampled(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // fused candidate+verify: dd19's prefix-ranking window is GONE — the
    // pair count IS the intersection census
    assert(!plan.contains("row_number"), plan)
    // under the size guard the sampled tokens broadcast, so the container
    // token table reaches the census without a keyed exchange of its own
    assert(count(plan,
      "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[w#\\d+") >= 1,
      plan)
  }

  test("dd21: above the size guard the container side salts — hash spread + replicate") {
    val plan = planOf(
      Dedup.containmentPairsSampled(spark, sf0001, broadcastMaxTokens = 0L))
    assert(plan.contains("xxhash64"), plan)
    assert(plan.contains("__salt"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dd22: sketch screen — bottom-k group-limit cut, refs broadcast, no corpus pairing") {
    val plan = planOf(Dedup.sketchContainmentQuery(spark, sf0001))
    // the per-doc bottom-k is cut to k rows per map task BEFORE the doc
    // exchange (sk01's InferWindowGroupLimit shape)
    assert(plan.contains("WindowGroupLimit"), plan)
    // reference sketches ride a broadcast; the corpus is never paired
    // with itself
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("sa12: budgets broadcast; admission rides source-keyed exchanges; no text, no pairing") {
    val plan = planOf(Curation.tokenBudgetQuery(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the admission window and the census are the only source-keyed
    // exchanges — corpus text never shuffles
    val k = count(plan, "hashpartitioning\\(source#\\d+, \\d+\\)")
    assert(k >= 1 && k <= 2, s"source exchanges = $k\n$plan")
    assert(!plan.contains("Generate"), plan)
  }

  test("sa13: gates ride the scan; only 4 narrow columns reach the budget exchange") {
    val plan = planOf(graft.state.AdmissionStream
      .streamingAdmission(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Join"), plan)
    // exactly one source-keyed exchange (the budget fold's groupByKey);
    // the text column must be projected away before it — a `t#` or
    // `text#` attribute in the AppendColumns output means the corpus
    // string is riding the shuffle
    assert(count(plan, "hashpartitioning") == 1, plan)
    val append = plan.linesIterator.filter(_.contains("AppendColumns")).mkString
    assert(append.nonEmpty && !append.contains("text#") && !append.contains(" t#"),
      s"corpus text enters the budget exchange:\n$plan")
  }

  test("cl09: the sweep grid joins the tiny bin histogram — never the corpus") {
    val plan = planOf(Classifier.thresholdSweepQuery(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // dd20's discipline: threshold comparisons are broadcast nested loops
    // against the ≤42-row (bin, label) histogram
    assert(count(plan, "BroadcastNestedLoopJoin") >= 1, plan)
    // round-11 pin: the histogram is a collected-and-reemitted
    // LocalRelation (bounded at 42 rows by construction), so the RETURNED
    // plan never rescans the corpus — the one scoring scan ran inside the
    // query builder. A FileScan reappearing here means the sweep went back
    // to re-deriving cl01 per consumer.
    assert(plan.contains("LocalTableScan"), plan)
    assert(!plan.contains("FileScan"), plan)
    assert(!plan.contains("parquet"), plan)
  }

  test("dd23: screen cached before the exact verify; verify scans confined to survivors") {
    val exec = Dedup.containmentFunnelQuery(spark, sf0001)
      .queryExecution.executedPlan
    try {
      // node walk that STOPS at the cache boundary: the cached screen's
      // build plan (which legitimately holds dd22's bounded-ref
      // BroadcastNestedLoopJoin, pinned in its own test) prints once per
      // InMemoryTableScan in the STRING, so string-counting would see it
      // 4× — the verify-stage claims below are about the outer plan only
      def outer(p: SparkPlan): Iterator[SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          outer(a.executedPlan)
        case _ => Iterator(p) ++
          (p.children ++ p.subqueries).iterator.flatMap(outer)
      }
      val names = outer(exec).map(_.nodeName).toSeq
      // the dd22 screen ran ONCE (materialized by the size-guard count)
      // and the verify consumes the cache — a vanished InMemoryTableScan
      // means the whole sketch chain re-executes per downstream join
      assert(names.exists(_.contains("InMemoryTableScan")), names.mkString("\n"))
      // both verify token scans are survivor-confined BEFORE the explode:
      // the semi-joins are what keep 100 TB of text out of the shingler;
      // survivor pairs and ref tokens broadcast; nothing corpus×corpus
      // in the verify stage
      val s = exec.toString
      assert(count(s, "LeftSemi") >= 2, s)
      assert(names.exists(_.contains("BroadcastHashJoin")), names.mkString("\n"))
      assert(!names.exists(_.contains("CartesianProduct")), names.mkString("\n"))
      assert(!names.exists(_.contains("BroadcastNestedLoop")), names.mkString("\n"))
    } finally spark.sharedState.cacheManager.clearCache()
  }

  test("iterative loops keep their localCheckpoints: result plans stay bounded (round-10 verdict #9)") {
    // gr01 (distributed PageRank), gr04 (k-core peel) and dd05 (cluster
    // label propagation) all iterate plan-on-plan; round 10 added
    // localCheckpoint()s so lineage resets each round. This sweep pins
    // them: if a loop drops its checkpoint, the analyzed plan of the
    // RESULT frame grows with the iteration count and blows this bound
    // (measured with checkpoints: every one of these stays well under
    // 64 KB at test scale; without them gr01's plan alone is megabytes).
    for (name <- Seq("gr01_dup_hub_rank", "gr04_kcore", "dd05_dup_clusters")) {
      val df = graft.SparkEntry.queries(name)(spark, sf0001)
      val size = df.queryExecution.analyzed.toString.length
      assert(size < 65536,
        s"$name analyzed plan is $size chars — an iterative loop lost its localCheckpoint")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("distributedLabels: result plan is checkpoint-truncated (round-11 pl04 lesson)") {
    // the sf-scale loop guard above never enters the DISTRIBUTED label
    // path (test corpora stay under DriverCcMaxPairs), which is exactly
    // where the 100× rehearsal measured 387M-char plan strings: edges
    // was persisted (data cached, PLAN kept) and every iteration nested
    // the LSH chain's plan. Force the path directly on a synthetic pair
    // frame whose own plan is made deliberately bulky, and pin that the
    // RESULT plan no longer contains it.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a 3-chain plus a 2-chain; bulk up the input plan with stacked
    // projections so a lost checkpoint is unmissable in the size bound
    var pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    for (_ <- 1 to 50)
      pairs = pairs.select(col("doc_a"), col("doc_b"),
        (col("doc_a") + col("doc_b")).as("pad")).drop("pad")
    val labels = Dedup.distributedLabels(pairs)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val size = labels.queryExecution.analyzed.toString.length
    assert(size < 16384,
      s"distributedLabels result plan is $size chars — the edges/labels localCheckpoints regressed")
  }

  test("window audit: every unpartitioned Window sits above a bounded-cardinality input") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // Queries ALLOWED an unpartitioned window, each with the bound that
    // makes the single-partition sort safe at 100 TB. Anything else that
    // plans a WindowExec/WindowGroupLimit with an empty partitionSpec
    // fails this sweep — the one-task global sort is the classic silent
    // scale-killer. (Spark still logs its "No Partition Defined" warning
    // for the exempted ones; this names and bounds each.)
    val exempt: Map[String, String] = Map(
      "ir10_rank_fusion" ->
        "row_number over the two top-k ranking tables (TakeOrderedAndProject, k rows each)",
      "ir12_ndcg_eval" ->
        "ideal-DCG rank over the gold top-k grade set (k rows)",
      "ir14_snippets" ->
        "ranking over the broadcast top-k snippet candidates (k rows)",
      "pl03_training_weights" ->
        "temperature-share windows over the |sources|-row count table (sa07's shape)",
      "sa07_temperature_mix" ->
        "total/normalizer windows over the |sources|-row count table",
      "sa08_epoch_plan" ->
        "same |sources|-row temperature-share table as sa07",
      "sa10_weighted_sample" ->
        "row_number over the n-row E-S winner set (limit n precedes the window)",
      "sa12_token_budget" ->
        "temperature-share windows over the |sources|-row census (sa07's shape); admission itself is source-partitioned",
      "ta08_vocab_encode" ->
        "prefix-sum over the per-range-partition count table (<= shuffle-partition-count rows)",
      "ta11_pack_windows" ->
        "prefix-sum over the bucket-offset table (corpus/docsPerBucket rows, sized to stay broadcastable)")
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, q) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = q(spark, sf0001).queryExecution.executedPlan
      val unpartitioned = allPhysicalNodes(plan).exists {
        case w: WindowExec           => w.partitionSpec.isEmpty
        case w: WindowGroupLimitExec => w.partitionSpec.isEmpty
        case _                       => false
      }
      if (unpartitioned && !exempt.contains(name)) offenders += name
      spark.sharedState.cacheManager.clearCache()
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window in: ${offenders.mkString(", ")} — " +
        "bound the input and exempt it with a reason, or partition the window")
  }

  test("pl05: application is ONE word-keyed equi-join vs the cached vocab") {
    val plan = planOf(TextAnalysis.tokenizerApplyQuery(spark, sf0001))
    assert(plan.contains("InMemoryTableScan"), plan)
    assert(count(plan,
      "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[w#\\d+") >= 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
