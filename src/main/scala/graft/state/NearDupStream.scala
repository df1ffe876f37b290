package graft.state

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import graft.core.Tables
import graft.functions.Text
import graft.operators.Dedup

/** Continuous (streaming) MinHash near-dup dedup — the composition of the
  * engine's two halves: the keyed-state pattern of the reference's table
  * apps (reference: fluvii/apps/transactions/transaction.py:180-192, the
  * read-state/update-state-per-message loop) carrying the LSH fingerprint
  * store of [[graft.operators.Dedup.incrementalDedup]] as a
  * `transformWithState` stream, so near-dup filtering runs continuously as
  * documents arrive instead of per batch rebuild.
  *
  * MIGRATION.md pins `dropDuplicatesWithinWatermark` as the EXACT-dedup
  * streaming twin; this operator is the NEAR-dup analog. Same parameters
  * and same three-stage shape as the batch [[Dedup.minhashLshPairs]] plan,
  * lifted onto keyed state:
  *
  *   1. signature pass: text -> MinHash signature -> 32 band hashes
  *      (one columnar pass, no shuffle);
  *   2. candidate generation: keyed state PER LSH BUCKET (band, bandhash)
  *      holds the (doc_id, signature) list of that bucket's earlier
  *      arrivals; each new arrival emits candidate pairs against stored
  *      members passing the [[Dedup.SigPrefilter]] signature-agreement
  *      prefilter, then joins the store itself. This is the band equi-join
  *      turned inside out: the shuffle key is the bucket, state size is the
  *      bucket population, and work per arrival scales with true
  *      collisions — never corpus^2;
  *   3. verification: candidates (tiny) join the corpus for shingles, exact
  *      Jaccard >= [[Dedup.JaccardThreshold]] — cost scales with survivors,
  *      exactly like the batch path.
  *
  * Drop semantics: a document is a duplicate iff some EARLIER document
  * (smaller doc_id = earlier arrival) is a verified near-dup; every
  * arrival enters the store regardless of its own verdict (the standard
  * streaming-LSH-store discipline: state insertion must not depend on a
  * verdict that other buckets are still computing). With the dd03
  * parameters (recall 1 - 5e-8 at the 0.8 threshold) the kept set equals
  * brute force over the prefix order, which is how the oracle checks it.
  *
  * Hot-bucket guard (the stateful form of [[Dedup.HotBucketCap]]'s star
  * contract): once a bucket's store reaches `cap` members, later arrivals
  * compare against the bucket's FIRST member only and are not stored —
  * state per key is bounded, and the boilerplate-bucket case still marks
  * every later member as a candidate duplicate of the first. The time axis
  * is bounded too: a retention TTL ([[TTLConfig]], wired through
  * [[candidatesStream]]'s `ttl` parameter) ages bucket members out, so a
  * long-running 100 TB deployment holds only the retention window's
  * fingerprints. The spec pins both the cap and the TTL eviction.
  */
object NearDupStream {

  /** One document's membership in one LSH bucket, the processor's input:
    * key = (band, bh), payload = (doc_id, signature). */
  case class BandedDoc(band: Int, bh: Long, doc_id: Long, sig: Array[Long])

  /** One arrival for the canonicalization stage (stage 0): key = fp
    * (md5 of the raw text — the same key [[Dedup.minhashLshPairs]]
    * canonicalizes on, and for the same reason: only raw equality
    * guarantees equal shingle sets). */
  case class DocArrival(fp: String, doc_id: Long, text: String)

  /** Canonicalized document: `rep` = the FIRST (smallest-id) doc with
    * bytewise-identical text; `text` is carried only on the representative
    * row (null elsewhere — members never re-ship their text). */
  case class CanonDoc(doc_id: Long, rep: Long, text: String)

  /** A bucket store entry — what the keyed state holds per earlier doc. */
  case class SeenDoc(doc_id: Long, sig: Array[Long])

  /** Candidate near-dup pair, doc_a earlier (smaller id) than doc_b. */
  case class CandidatePair(doc_a: Long, doc_b: Long)

  /** Fraction of equal signature entries — the plain-Scala twin of
    * [[graft.functions.SigOverlap]] for in-processor prefiltering. */
  private[state] def sigOverlap(a: Array[Long], b: Array[Long]): Double = {
    val n = math.min(a.length, b.length)
    var eq = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  /** The canonicalization fold of the streaming stage-0 processor: fold
    * one microbatch of a fingerprint group's arrivals into the `rep0`
    * store, returning (canonicalized rows, the store after). The
    * representative is the FIRST ARRIVAL — the stream contract (ascending
    * doc_id replay across microbatches) makes that the minimum id; the
    * bounded in-batch sort is defense for arrival jitter WITHIN one
    * microbatch, and past the bound the fold trusts the contract order
    * (the batch correctness form does not go through this fold at all —
    * see [[canonical]] — so an adversarial group larger than the buffer
    * cannot flip batch verdicts). */
  private[state] def processFpGroup(rep0: Option[Long],
      rows: Iterator[DocArrival], sortBound: Int = SortBound)
      : (Vector[CanonDoc], Option[Long]) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[DocArrival]
    while (rows.hasNext && buf.length < sortBound) buf += rows.next()
    buf.sortInPlaceBy(_.doc_id)
    var rep = rep0
    val out = Vector.newBuilder[CanonDoc]
    def step(d: DocArrival): Unit = rep match {
      case None    => rep = Some(d.doc_id); out += CanonDoc(d.doc_id, d.doc_id, d.text)
      case Some(r) => out += CanonDoc(d.doc_id, r, null)
    }
    buf.foreach(step)
    rows.foreach(step)
    (out.result(), rep)
  }

  /** Stage 0, batch backend: CANONICALIZE FIRST — identical raw texts
    * collapse to their MINIMUM-id representative before any shingling, so
    * exact copies never enter the LSH store (the batch twin of the
    * [[Dedup.minhashLshPairs]] canonicalize-first pass, and the same
    * relational shape: a min/max aggregate with map-side combine, correct
    * for a group of ANY size — a flatMapGroups fold here would depend on
    * shuffle arrival order once a group outgrew a sort buffer). Texts
    * within a group are bytewise equal, so max(text) is deterministic;
    * the rep row carries it, members carry null (never re-shipping
    * payloads). */
  def canonical(docs: DataFrame): Dataset[CanonDoc] = {
    import docs.sparkSession.implicits._
    val fp = docs.select(md5(col("text")).as("fp"), col("doc_id"), col("text"))
    // null text ⇒ null fingerprint: such docs are SINGLETONS (rep = self),
    // never grouped — matching both the brute-force oracle (a null text
    // has no shingles, so it can never be anyone's duplicate) and the
    // pre-relational fold. An inner join on fp would silently drop them
    // from the verdict's membership instead.
    val nullDocs = fp.filter(col("fp").isNull)
      .select(col("doc_id"), col("doc_id").as("rep"), col("text"))
    val typed = fp.filter(col("fp").isNotNull)
    val groups = typed.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep"), max(col("text")).as("rep_text"))
    typed.select(col("fp"), col("doc_id"))
      .join(groups, "fp")
      .select(col("doc_id"), col("rep"),
        when(col("doc_id") === col("rep"), col("rep_text"))
          .otherwise(lit(null)).as("text"))
      .unionByName(nullDocs)
      .as[CanonDoc]
  }

  /** Stage 0, streaming backend: the same fold over a durable per-
    * fingerprint ValueState — in a deployment this stage emits the canon
    * stream to its own topic; stage 1 consumes the representative rows and
    * the verdict join consumes the membership. `ttl` ages fingerprint
    * memory out with the retention window, matching the bucket store's. */
  def canonicalStream(docs: DataFrame,
      ttl: Option[java.time.Duration] = None): Dataset[CanonDoc] = {
    import docs.sparkSession.implicits._
    val ttlConfig = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    docs.select(md5(col("text")).as("fp"), col("doc_id"), col("text"))
      .as[DocArrival]
      .groupByKey(_.fp)
      .transformWithState(new CanonFpProcessor(ttlConfig), timeMode,
        OutputMode.Append())
  }

  /** Documents -> banded signature rows (stage 1). Pure columnar pass:
    * MinHashFromText + band hashes + explode, no exchange. */
  def bandedDocs(docs: DataFrame): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"),
        graft.functions.MinHashFromText.minhashFromText(
          col("text"), Dedup.ShingleSize, Dedup.SigK).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(Text.lshBands(col("sig"), Dedup.SigK, Dedup.Bands)).as("b"))
      .select(col("b.band").as("band"), col("b.bh").as("bh"),
        col("doc_id"), col("sig"))
      .as[BandedDoc]
  }

  /** Rows buffered (for the doc_id ordering sort) per bucket per batch.
    * Beyond this bound arrivals stream UNSORTED: the bound is clamped to
    * >= cap, so by the time the sorted prefix is consumed the store is at
    * capacity and ordering can no longer affect state — only the (order-
    * independent) per-arrival star comparisons remain. One pathological
    * bucket therefore costs bounded heap (~sortBound x row size), never a
    * whole bucket materialized — the same hazard Table.sortedBounded
    * bounds for the table paths, resolved here by graceful degradation
    * instead of an error because hot buckets are EXPECTED input
    * (boilerplate floods), not a modeling bug. */
  val SortBound: Int = 1 << 16

  /** The store-update step both backends share: fold one batch of a
    * bucket's arrivals into the store `seen0`, returning (emitted
    * candidates, entries to append). Sorts by doc_id within the bounded
    * buffer (see [[SortBound]]). Having ONE definition is what makes the
    * batch/stream equality structural rather than coincidental — the spec
    * then proves it empirically too. */
  private[state] def processBucket(seen0: Vector[SeenDoc],
      rows: Iterator[BandedDoc], cap: Int, prefilter: Double,
      sortBound: Int = SortBound): (Vector[CandidatePair], Vector[SeenDoc]) = {
    val bound = math.max(sortBound, cap)
    val buf = scala.collection.mutable.ArrayBuffer.empty[BandedDoc]
    while (rows.hasNext && buf.length < bound) buf += rows.next()
    buf.sortInPlaceBy(_.doc_id)
    var seen = seen0
    val appended = Vector.newBuilder[SeenDoc]
    val out = Vector.newBuilder[CandidatePair]
    def step(d: BandedDoc): Unit = {
      // full-store compare below the cap; star compare (first member only)
      // above it — state stops growing, the group stays connected
      val against = if (seen.size >= cap) seen.take(1) else seen
      against.foreach { e =>
        if (e.doc_id != d.doc_id && sigOverlap(e.sig, d.sig) >= prefilter)
          out += CandidatePair(e.doc_id, d.doc_id)
      }
      if (seen.size < cap) {
        seen = seen :+ SeenDoc(d.doc_id, d.sig)
        appended += SeenDoc(d.doc_id, d.sig)
      }
    }
    buf.foreach(step)
    rows.foreach(step) // tail past the sort bound: store is at cap by now
    (out.result(), appended.result())
  }

  /** Stage 2, batch backend (the CORRECTNESS form): each bucket's whole
    * history is one group, so the fold runs with an empty initial store and
    * plain flatMapGroups carries it — no state store machinery needed. The
    * shuffle key is the bucket, identical to the streaming plan. */
  def candidates(banded: Dataset[BandedDoc],
      cap: Int = Dedup.HotBucketCap): Dataset[CandidatePair] = {
    import banded.sparkSession.implicits._
    banded
      .groupByKey(d => (d.band, d.bh))
      .flatMapGroups { (_: (Int, Long), rows: Iterator[BandedDoc]) =>
        processBucket(Vector.empty, rows, cap, Dedup.SigPrefilter)._1.iterator
      }
  }

  /** Stage 2, streaming backend: the same fold as a transformWithState
    * stream over the durable per-bucket ListState — near-dup filtering as a
    * continuously-running service. Arrival order across microbatches is the
    * replay order (ascending doc_id); within a microbatch the processor
    * sorts. NearDupSpec proves output equality with [[candidates]] on the
    * same increments.
    *
    * `ttl` bounds the store's GROWTH IN TIME, the axis the cap alone does
    * not: at 100 TB a long-running deployment ages bucket members out with
    * the retention window (documents older than the window can no longer be
    * named `dup_of`, matching how batch re-runs would only scan the
    * window). TTL requires processing-time semantics, so the stream runs in
    * TimeMode.ProcessingTime when a retention is set; NearDupSpec proves
    * aged-out members stop matching. */
  def candidatesStream(banded: Dataset[BandedDoc],
      cap: Int = Dedup.HotBucketCap,
      ttl: Option[java.time.Duration] = None): Dataset[CandidatePair] = {
    import banded.sparkSession.implicits._
    val ttlConfig = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    banded
      .groupByKey(d => (d.band, d.bh))
      .transformWithState(
        new NearDupBucketProcessor(cap, Dedup.SigPrefilter, ttlConfig),
        timeMode, OutputMode.Append())
  }

  /** Stage 3: exact verification + per-doc verdict, batch relational ops
    * (in the streaming deployment this is the downstream job over the
    * emitted candidate + canon topics — both tiny relative to the corpus).
    * Candidates are REPRESENTATIVE pairs; shingles are computed only for
    * reps named by a candidate, and the verdict expands through the canon
    * membership: a member b of rep r (b ≠ r) is a duplicate of
    * coalesce(dup_of(r), r) — identical texts make every near-dup of r a
    * near-dup of b, and r itself (earlier, identical) is always one, so
    * the earliest ancestor is r's own or r. NearDupSpec proves this equals
    * the brute-force prefix verdict. Output: (doc_id, keep, dup_of) for
    * every document, dup_of = earliest verified near-dup ancestor, ordered
    * by doc_id. */
  def verdict(s: SparkSession, dir: String, canon: DataFrame,
      cands: DataFrame): DataFrame = {
    val candSet = cands.select(col("doc_a"), col("doc_b")).distinct()
    val neededIds = candSet
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val sh = Tables.documents(s, dir)
      .join(broadcast(neededIds), "doc_id")
      .select(col("doc_id"),
        graft.functions.CharShingles.charShingles(col("text"), Dedup.ShingleSize).as("sh"))
      .withColumn("n", size(col("sh")))
    val repDropped = candSet
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b")), "doc_b")
      .filter(Text.jaccardWithSizes(col("sh_a"), col("sh_b"), col("n_a"), col("n_b"))
        >= Dedup.JaccardThreshold)
      .groupBy(col("doc_b"))
      .agg(min(col("doc_a")).as("rep_dup"))
      .withColumnRenamed("doc_b", "rep")
    canon.select(col("doc_id"), col("rep"))
      .join(broadcast(repDropped), Seq("rep"), "left")
      .select(col("doc_id"),
        when(col("doc_id") === col("rep"), col("rep_dup"))
          .otherwise(coalesce(col("rep_dup"), col("rep"))).as("dup_of"))
      .select(col("doc_id"), col("dup_of").isNull.as("keep"), col("dup_of"))
      .orderBy(col("doc_id"))
  }

  /** dd12 — the full operator in batch mode (the CORRECTNESS form): same
    * processors, same state discipline, state starting empty, every
    * fingerprint group and bucket history replayed in one group call. The
    * streaming twin (NearDupSpec) replays the same corpus in increments
    * through the same processors and must produce the identical kept set.
    * Canonicalize-first means the LSH store only ever holds DISTINCT
    * texts — an exact-copy flood grows the (cheap) fingerprint state, not
    * the signature store, and never hot-buckets. */
  def streamingNearDup(s: SparkSession, dir: String): DataFrame = {
    val canon = canonical(Tables.parallel(Tables.documents(s, dir))).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reps = canon.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("text"))
    val cands = candidates(bandedDocs(reps))
    verdict(s, dir, canon, cands.toDF())
  }

  /** DuckDB SQL replicating [[streamingNearDup]] exactly: brute-force
    * prefix-ordered near-dup (keep a doc iff no earlier doc has exact
    * 5-gram Jaccard >= 0.8) — valid as ground truth for the LSH-store path
    * by the same recall argument that lets dd03 use the brute-force pair
    * oracle, plus the insert-regardless-of-verdict store semantics
    * documented above. Pairs come from the token-join intersection form
    * (Σ df(tok)² work, verified bit-identical to the list_intersect form
    * on DuckDB 1.0.0 — the same rewrite the dd03/dd05 oracles carry). */
  val oracleSql: String = """
      WITH psh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-3, 2)),
                   i -> substr(text, CAST(i AS INT), 5))) AS s FROM documents),
      ptok AS (SELECT doc_id, unnest(s) AS tok FROM psh),
      pix AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ix
              FROM ptok a JOIN ptok b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      plen AS (SELECT doc_id, len(s) AS n FROM psh),
      p AS (SELECT doc_a, doc_b FROM pix i
            JOIN plen la ON la.doc_id = i.doc_a JOIN plen lb ON lb.doc_id = i.doc_b
            WHERE CAST(ix AS DOUBLE) / (la.n + lb.n - ix) >= 0.8),
      dr AS (SELECT doc_b AS doc_id, min(doc_a) AS dup_of FROM p GROUP BY doc_b)
      SELECT d.doc_id, dr.dup_of IS NULL AS keep, dr.dup_of
      FROM documents d LEFT JOIN dr ON d.doc_id = dr.doc_id
      ORDER BY d.doc_id"""
}

/** The per-bucket fingerprint store as a [[StatefulProcessor]]: ListState
  * of (doc_id, signature), append-ordered (ascending doc_id given ordered
  * replay), bounded by `cap` with first-member star fallback — the
  * stateful twin of [[graft.operators.Dedup.HotBucketCap]]'s contract.
  * `ttl` (TTLConfig) ages members out of the store after the retention
  * window — the state store filters expired entries on read, so an aged
  * bucket behaves exactly like an empty one. */
/** The per-fingerprint first-arrival store as a [[StatefulProcessor]]:
  * ValueState holding the representative doc_id of each distinct text —
  * the stateful twin of [[NearDupStream.canonical]]'s batch fold. `ttl`
  * ages fingerprint memory out with the retention window (an exact copy
  * of an expired text re-canonicalizes as a fresh representative, exactly
  * as a batch over the retention window would). */
private[state] final class CanonFpProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[String, NearDupStream.DocArrival, NearDupStream.CanonDoc] {
  import NearDupStream.{CanonDoc, DocArrival}

  @transient private var rep: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    rep = getHandle.getValueState[Long]("fp_rep", Encoders.scalaLong, ttl)

  override def handleInputRows(key: String, rows: Iterator[DocArrival],
      timers: TimerValues): Iterator[CanonDoc] = {
    val rep0 = if (rep.exists()) Some(rep.get()) else None
    val (out, repAfter) = NearDupStream.processFpGroup(rep0, rows)
    repAfter.filter(r => !rep0.contains(r)).foreach(rep.update)
    out.iterator
  }
}

private[state] final class NearDupBucketProcessor(cap: Int, prefilter: Double,
    ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[(Int, Long), NearDupStream.BandedDoc, NearDupStream.CandidatePair] {
  import NearDupStream.{BandedDoc, CandidatePair, SeenDoc, sigOverlap}

  @transient private var store: ListState[SeenDoc] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    store = getHandle.getListState[SeenDoc]("bucket_docs",
      Encoders.product[SeenDoc], ttl)

  override def handleInputRows(key: (Int, Long), rows: Iterator[BandedDoc],
      timers: TimerValues): Iterator[CandidatePair] = {
    // arrival order within a batch = doc_id order (the stream contract;
    // sorted inside processBucket's bounded buffer); across batches the
    // store is already ascending by construction
    val seen0: Vector[SeenDoc] =
      if (store.exists()) store.get().toVector else Vector.empty
    val (out, appended) = NearDupStream.processBucket(
      seen0, rows, cap, prefilter)
    appended.foreach(store.appendValue)
    out.iterator
  }
}
