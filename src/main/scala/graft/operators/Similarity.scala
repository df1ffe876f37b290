package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths, same semantics:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     The candidate side is broadcast when small; the plan is a single
  *     pass over the query side (no shuffle of the big table).
  *   - [[lshTopK]]: random-hyperplane (sign) LSH — queries only compare
  *     against candidates sharing a bucket (multi-probe over 1-bit flips),
  *     turning O(N*M) into bucket-equi-joins. This is the 100 TB path; its
  *     recall vs brute force is asserted in ScalaTest.
  *
  * All dot products run as aggregate() over zipped arrays — codegen'd
  * built-ins, left-to-right summation (deterministic, engine-portable).
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays (deterministic order).
    * HOF formulation kept as the executable spec for [[cosine]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Native-expression cosine (bit-identical to the HOF spec, ~20x faster —
    * see [[graft.functions.CosineSim]]). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosineSim(a, b)

  /** The interpreted HOF cosine, for cross-validation in tests. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact cosine top-k: for each query vector (vec_id < nQueries), the k
    * nearest other vectors. Cosine is rounded to 6 dp at the OUTPUT (rank
    * uses the rounded value + id tie-break => fully deterministic).
    *
    * Plan shape for 100 TB: the tiny QUERY set is broadcast over ONE pass
    * of the candidate stream — the corpus is never shuffled or broadcast;
    * candidate-side partitioning is the parallelism, and the only exchange
    * is the per-query top-k. The sublinear twin is [[lshTopK]]. */
  def bruteForceTopK(s: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 100): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val c = Tables.parallel(emb)
      .select(col("vec_id").as("cand_id"), asDouble(col("embedding")).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Deterministic pseudo-random hyperplane component h in {-1,+1} for
    * (plane p, dimension d): +1 iff the first hex digit of md5("p:d") is
    * even. No RNG state (same buckets on every executor of every run) AND
    * engine-portable (md5 is identical everywhere), which is what lets the
    * DuckDB oracles re-derive the bucket structure for sim02/sim05. */
  private def signComponent(p: Int, d: Column): Column =
    when(conv(substring(md5(concat(lit(s"$p:"), d.cast("string"))), 1, 1),
      16, 10).cast("int") % 2 === 0, lit(1.0d)).otherwise(lit(-1.0d))

  /** Sign-LSH bucket id from `planes` random hyperplanes (one bit each):
    * the interpreted HOF formulation, kept as the executable spec for
    * [[lshBucket]] (cross-validated bit-for-bit in ExpressionParitySpec). */
  def lshBucketHof(v: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1).cast("array<bigint>"),
          (x, i) => x * signComponent(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Sign-LSH bucket id — native-expression form (bit-identical to
    * [[lshBucketHof]], one primitive loop per row instead of planes
    * interpreted aggregate/zip_with chains — see
    * [[graft.functions.SignLshBucket]]). */
  def lshBucket(v: Column, planes: Int): Column =
    graft.functions.SignLshBucket.signLshBucket(v, planes)

  /** ANN top-k via sign-LSH with multi-probe (flip each single bit):
    * a query lands in its own bucket plus `planes` neighboring buckets;
    * candidates are met with equi-joins on bucket id only. */
  def lshTopK(s: SparkSession, dir: String, k: Int = 5, planes: Int = 8,
      nQueries: Int = 100): DataFrame = {
    val emb = Tables.parallel(Tables.embeddings(s, dir))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val cands = emb.select(col("vec_id").as("cand_id"), col("v").as("cv"),
      col("bucket").as("cbucket"))

    // probe buckets: identity + all 1-bit flips
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(array(
          (col("bucket") +: (0 until planes).map(p =>
            col("bucket").bitwiseXOR(lit(1L << p)))): _*)).as("probe"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))

    probes
      .join(cands, col("probe") === col("cbucket") &&
        col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("qv"), col("cand_id"), col("cv")).distinct()
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** DuckDB SQL replicating [[bruteForceTopK]] exactly (formerly inline in
    * SparkEntry; a method here so ir09's recall oracle composes the SAME
    * definition and cannot drift). */
  def bruteForceTopKOracleSql(k: Int = 5, nQueries: Int = 100): String = s"""
      WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < $nQueries),
      c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
      p AS (SELECT query_id, cand_id,
              round(${cosListSql("qv", "cv")}, 6) AS cos
            FROM q, c WHERE query_id <> cand_id)
      SELECT query_id, cand_id, cos, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rnk
        FROM p) t
      WHERE rnk <= $k ORDER BY query_id, rnk"""

  /** DuckDB list-cosine with the same left-to-right fold as
    * [[graft.functions.CosineSim]] (proven bit-exact by sim01). */
  private def cosListSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, len($a)+1), i -> $a[CAST(i AS INT)]*$b[CAST(i AS INT)])) /
       (sqrt(list_sum(list_transform(range(1, len($a)+1), i -> $a[CAST(i AS INT)]*$a[CAST(i AS INT)]))) *
        sqrt(list_sum(list_transform(range(1, len($b)+1), i -> $b[CAST(i AS INT)]*$b[CAST(i AS INT)])))))"""

  /** Shared oracle CTE block re-deriving the sign-LSH bucket of every
    * vector: the md5-parity sign table (planes x dim rows), per-(vector,
    * plane) projections as ORDERED folds (list(x ORDER BY i) => the same
    * left-to-right summation as the native expression), and the bucket bit
    * sum. Emits CTEs `e` and `bucket`. */
  private def bucketCtesSql(planes: Int, dim: Int): String = s"""
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      signs AS (SELECT p.p, i.i,
                  CASE WHEN CAST(concat('0x', substr(md5(concat(CAST(p.p AS VARCHAR), ':', CAST(i.i AS VARCHAR))), 1, 1)) AS INT) % 2 = 0
                       THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sg
                FROM range(0, $planes) p(p), range(0, $dim) i(i)),
      proj AS (SELECT e.vec_id, s.p,
                      list_sum(list(e.v[CAST(s.i + 1 AS INT)] * s.sg ORDER BY s.i)) AS pr
               FROM e CROSS JOIN signs s GROUP BY e.vec_id, s.p),
      bucket AS (SELECT vec_id,
                   CAST(sum(CASE WHEN pr >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
                 FROM proj GROUP BY vec_id)"""

  /** DuckDB SQL replicating [[lshTopK]] exactly — possible because the
    * hyperplane signs are md5-derived (engine-portable): same buckets, same
    * multi-probe set, same exact-cosine ranking. */
  def lshTopKOracleSql(k: Int = 5, planes: Int = 8, dim: Int = 64,
      nQueries: Int = 100): String = s"""
      WITH ${bucketCtesSql(planes, dim)},
      probes AS (SELECT vec_id AS query_id,
                   unnest(list_prepend(bucket,
                     list_transform(range(0, $planes), p -> xor(bucket, 1 << p)))) AS probe
                 FROM bucket WHERE vec_id < $nQueries),
      cand AS (SELECT DISTINCT p.query_id, c.vec_id AS cand_id
               FROM probes p JOIN bucket c
                 ON p.probe = c.bucket AND c.vec_id <> p.query_id),
      scored AS (SELECT c.query_id, c.cand_id,
                   round(${cosListSql("q.v", "x.v")}, 6) AS cos
                 FROM cand c JOIN e q ON c.query_id = q.vec_id
                 JOIN e x ON c.cand_id = x.vec_id)
      SELECT query_id, cand_id, cos, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, cand_id) AS rnk FROM scored) z
      WHERE rnk <= $k ORDER BY query_id, rnk"""

  /** DuckDB SQL replicating [[embeddingNearDupPairsBucketed]] exactly:
    * bucket-meeting candidate pairs (multi-probe, a < b), distinct, then
    * the same exact-cosine threshold verification. */
  def embedNearDupBucketedOracleSql(threshold: Double = 0.45,
      planes: Int = 4, dim: Int = 64): String = s"""
      WITH ${bucketCtesSql(planes, dim)},
      probes AS (SELECT vec_id,
                   unnest(list_prepend(bucket,
                     list_transform(range(0, $planes), p -> xor(bucket, 1 << p)))) AS probe
                 FROM bucket),
      cand AS (SELECT DISTINCT p.vec_id AS vec_a, c.vec_id AS vec_b
               FROM probes p JOIN bucket c
                 ON p.probe = c.bucket AND p.vec_id < c.vec_id)
      SELECT vec_a, vec_b, cos FROM (
        SELECT c.vec_a, c.vec_b, round(${cosListSql("a.v", "b.v")}, 6) AS cos
        FROM cand c JOIN e a ON c.vec_a = a.vec_id
        JOIN e b ON c.vec_b = b.vec_id) z
      WHERE cos >= $threshold ORDER BY vec_a, vec_b"""

  /** ANN top-k via IVF (inverted-file) coarse quantization — the other
    * classic ANN scale path next to sign-LSH ([[lshTopK]]), and fully
    * DETERMINISTIC, so unlike probabilistic LSH its output is
    * oracle-checkable end to end:
    *   - centroids: the first `nCentroids` vectors (a deterministic coarse
    *     quantizer — production would k-means these; the search structure
    *     is identical);
    *   - every vector is assigned to its nearest centroid by cosine
    *     (tie-break: smaller centroid id) — ONE broadcast join against the
    *     tiny centroid table + a map-side-combining argmax aggregation, no
    *     all-pairs anywhere;
    *   - a query probes its `nProbe` nearest centroids' inverted lists
    *     only: candidate cost scales with N*nProbe/nCentroids, not N^2;
    *   - exact cosine top-k over the probed candidates.
    * At 100 TB the assignment pass is embarrassingly parallel (centroids
    * broadcast), the inverted lists are just a shuffle on centroid id, and
    * recall tunes with nProbe/nCentroids (SimilaritySpec pins it vs brute
    * force). */
  def ivfTopK(s: SparkSession, dir: String, k: Int = 5, nCentroids: Int = 16,
      nProbe: Int = 4, nQueries: Int = 100): DataFrame = {
    val emb = Tables.parallel(Tables.embeddings(s, dir))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

    // vector x centroid cosines: broadcast the (tiny) centroid table
    val ac = emb.join(broadcast(cent))
      .withColumn("ccos", cosine(col("v"), col("cv")))
      .select(col("vec_id"), col("cid"), col("ccos"))

    // nearest centroid per vector: max_by over (ccos, -cid) — an argmax
    // aggregation with map-side partial combine (no N x nCentroids shuffle)
    val assign = ac
      .groupBy(col("vec_id").as("cand_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc"))).as("cid"))

    // each query's nProbe nearest centroids (same ordering, windowed top-n
    // over the small nQueries x nCentroids slice)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val probes = ac.filter(col("vec_id") < nQueries)
      .withColumn("r", row_number().over(wp))
      .filter(col("r") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cid"))

    // candidates: the probed inverted lists (each candidate is assigned to
    // exactly one centroid, so no duplicate pairs arise)
    val cands = probes.join(assign, "cid")
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"))

    val qv = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    cands
      .join(emb.select(col("vec_id").as("cand_id"), col("v").as("cv")), "cand_id")
      .join(broadcast(qv), "query_id")
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** ANN top-k via Product Quantization with asymmetric-distance scoring —
    * the compression-side ANN family next to hashing ([[lshTopK]]) and
    * partitioning ([[ivfTopK]]), and like IVF fully DETERMINISTIC, so the
    * whole structure (codebooks, codes, LUTs, ranking) is oracle-checkable:
    *   - the vector space is split into `m` subspaces; each subspace's
    *     codebook = the first `k` vectors' subvectors (deterministic; a
    *     production system k-means these — [[kmeansAssign]] is the trainer);
    *   - ENCODE: every vector becomes `m` small codes (argmin squared-L2
    *     codeword per subspace, tie-break smaller code) — the corpus
    *     representation shrinks from dim doubles to m bytes, the whole point
    *     of PQ at 100 TB: the scan reads codes, not vectors;
    *   - SCORE (ADC): a query precomputes one m x k distance LUT; each
    *     (query, candidate) score is m table lookups
    *     ([[graft.functions.PqAdc]], a native expression — this is the
    *     per-pair hot loop), no vector arithmetic in the scan;
    *   - exact top-`topK` per query by approximate distance.
    * Plan shape: codebook and query LUTs are tiny and broadcast; encode is
    * one broadcast join + argmin aggregation keyed by vec_id (map-side
    * combined); the scan is candidates-codes x broadcast LUTs with no
    * shuffle of the corpus beyond the per-query top-k. Recall vs brute
    * force is pinned in SimilaritySpec. */
  def pqTopK(s: SparkSession, dir: String, topK: Int = 5, m: Int = 8,
      k: Int = 16, nQueries: Int = 100, dim: Int = -1): DataFrame = {
    val emb = Tables.parallel(Tables.embeddings(s, dir))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // DEFAULT: probe the true dimensionality with a one-row driver job — a
    // wrong assumed dim would silently truncate every codebook/LUT, and the
    // dim-assuming oracle would agree with the identically-wrong result.
    // Callers that DECLARE the dim (sim07 passes the same literal its
    // oracle interpolates) skip the probe, so no job precedes the main PQ
    // scan in the declared path.
    val theDim =
      if (dim > 0) dim else emb.select(size(col("v"))).first().getInt(0)
    require(theDim % m == 0,
      s"PQ requires dim divisible by m: dim=$theDim, m=$m — the trailing " +
        s"${theDim % m} dimensions would be silently dropped from codebooks/LUTs")
    val subDim = theDim / m

    // codebook: (m, code, cv) — m*k rows, broadcast everywhere below
    val cb = emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("code"),
        explode(transform(sequence(lit(0), lit(m - 1)), mm =>
          struct(mm.cast("int").as("msub"),
            slice(col("v"), mm * subDim + 1, lit(subDim)).as("cv")))).as("e"))
      .select(col("e.msub").as("msub"), col("code"), col("e.cv").as("cv"))

    def subv = slice(col("v"), col("msub") * subDim + 1, lit(subDim))
    val d = graft.functions.SqDist.sqDist(subv, col("cv"))

    // encode: argmin codeword per (vector, subspace), reassembled in
    // subspace order — min_by over (dist, code) breaks ties on smaller code
    val codes = emb.join(broadcast(cb))
      .select(col("vec_id"), col("msub"), col("code"), d.as("d"))
      .groupBy(col("vec_id"), col("msub"))
      .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("msub"), col("code")))),
        e => e.getField("code")).as("codes"))

    // query LUTs: all m*k subspace distances, laid out subspace-major
    val lut = emb.filter(col("vec_id") < nQueries).join(broadcast(cb))
      .select(col("vec_id").as("query_id"), col("msub"), col("code"), d.as("d"))
      .groupBy(col("query_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("msub"), col("code"), col("d")))),
        e => e.getField("d")).as("lut"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adist"), col("cand_id"))
    codes.select(col("vec_id").as("cand_id"), col("codes"))
      .join(broadcast(lut), col("query_id") =!= col("cand_id"))
      .withColumn("adist",
        round(graft.functions.PqAdc.pqAdc(col("codes"), col("lut"), k), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("cand_id"), col("adist"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** DuckDB SQL replicating [[pqTopK]] exactly: same codebooks, same
    * argmin encode (identical doubles => identical comparisons), same
    * subspace-ordered ADC fold, same 6 dp output rounding. */
  def pqOracleSql(topK: Int = 5, m: Int = 8, k: Int = 16, dim: Int = 64,
      nQueries: Int = 100): String = {
    val subDim = dim / m
    def l2(a: String, b: String) =
      s"""list_sum(list_transform(range(1, ${subDim + 1}),
         i -> ($a[CAST(i AS INT)] - $b[CAST(i AS INT)]) * ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])))"""
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cb AS (SELECT CAST(t.m AS INT) AS msub, CAST(vec_id AS INT) AS code,
                    v[CAST(t.m*$subDim + 1 AS INT):CAST((t.m+1)*$subDim AS INT)] AS cv
             FROM e, range(0, $m) t(m) WHERE vec_id < $k),
      sub AS (SELECT e.vec_id, cb.msub, cb.code,
                     ${l2(s"e.v[CAST(cb.msub*$subDim + 1 AS INT):CAST((cb.msub+1)*$subDim AS INT)]", "cb.cv")} AS d
              FROM e CROSS JOIN cb),
      enc AS (SELECT vec_id, msub, code FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, msub
                  ORDER BY d, code) AS rn FROM sub) z WHERE rn = 1),
      codes AS (SELECT vec_id, list(code ORDER BY msub) AS codes
                FROM enc GROUP BY vec_id),
      lut AS (SELECT vec_id AS query_id, list(d ORDER BY msub, code) AS lut
              FROM sub WHERE vec_id < $nQueries GROUP BY vec_id),
      pair AS (SELECT l.query_id, c.vec_id AS cand_id,
                 round(list_sum(list_transform(range(1, ${m + 1}),
                   s -> l.lut[CAST((s-1)*$k AS INT) + c.codes[CAST(s AS INT)] + 1])), 6)
                   AS adist
               FROM lut l CROSS JOIN codes c WHERE c.vec_id <> l.query_id)
      SELECT query_id, cand_id, adist, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adist, cand_id) AS rnk FROM pair) z
      WHERE rnk <= $topK ORDER BY query_id, rnk"""
  }

  /** Scalable embedding near-dup: the LSH-bucketed form of
    * [[embeddingNearDupPairs]] — candidates are id pairs meeting in a
    * sign-LSH bucket (multi-probe over 1-bit flips), distinct'd as bare ids
    * (vectors re-joined only for surviving pairs), then exact-verified
    * against the cosine threshold. Every emitted pair is exact; recall is
    * the LSH tradeoff (deterministic for a given corpus — SimilaritySpec
    * pins it against the brute-force oracle), tuned by `planes`: fewer
    * planes = bigger buckets = higher recall and more verify work. */
  def embeddingNearDupPairsBucketed(s: SparkSession, dir: String,
      threshold: Double = 0.45, planes: Int = 4): DataFrame = {
    val emb = Tables.parallel(Tables.embeddings(s, dir))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = emb.select(col("vec_id").as("vec_a"),
      explode(array(
        (col("bucket") +: (0 until planes).map(p =>
          col("bucket").bitwiseXOR(lit(1L << p)))): _*)).as("probe"))
    val cands = probes
      .join(emb.select(col("vec_id").as("vec_b"), col("bucket").as("cbucket")),
        col("probe") === col("cbucket") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .distinct() // a pair can meet via several probes; ids only — no vectors
    cands
      .join(emb.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold (exact
    * all-pairs — the semantics oracle; at 100 TB you run
    * [[embeddingNearDupPairsBucketed]], the same verify step over
    * LSH-bucketed candidates, instead of the cross join). Cosine rounded
    * to 6 dp so the threshold test is engine-portable. */
  def embeddingNearDupPairs(s: SparkSession, dir: String,
      threshold: Double = 0.45): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val a = Tables.parallel(emb).select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Deterministic Lloyd k-means over the embedding corpus (the trainer for
    * the [[ivfTopK]] coarse quantizer): init centroids = vectors 0..k-1,
    * then `iters` rounds of (assign to nearest-by-cosine centroid, recompute
    * centroids as the element-wise member mean). Output = the assignment
    * under the final centroids.
    *
    * Plan shape per iteration at 100 TB: centroids are k x dim — always
    * broadcast; assignment is an embarrassingly parallel argmax aggregation
    * (map-side combined); the recompute explodes members positionally and
    * reduces (cluster, pos) partial sums — shuffle cardinality k x dim, not
    * the corpus. Iterations stack lineage linearly (iters is small and
    * fixed; cf. [[Dedup.dupClusters]] for the checkpointed unbounded form).
    *
    * Determinism for the oracle: ties in the argmax break on smaller
    * centroid id; centroid components are rounded to 6 dp each round so the
    * two engines' different partial-sum orders cannot drift. */
  def kmeansAssign(s: SparkSession, dir: String, k: Int = 8,
      iters: Int = 2): DataFrame = {
    val (asg, _) = kmeansFit(s, dir, k, iters)
    asg.select(col("vec_id"), col("cid").as("cluster"))
      .orderBy(col("vec_id"))
  }

  /** The Lloyd loop behind [[kmeansAssign]] and [[semDedup]]: returns the
    * final (vec_id, cid) assignment plus the persisted (vec_id, v) embedding
    * frame so callers can join vectors back without a second scan. */
  private[operators] def kmeansFit(s: SparkSession, dir: String, k: Int,
      iters: Int): (DataFrame, DataFrame) = {
    val emb = Tables.parallel(Tables.embeddings(s, dir))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def assign(cent: DataFrame): DataFrame = emb
      .join(broadcast(cent))
      .withColumn("ccos", cosine(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc"))).as("cid"))
    var cent = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      cent = assign(cent)
        .join(emb, "vec_id")
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(round(avg(col("x")), 6).as("cx"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          e => e.getField("cx")).as("cv"))
    }
    (assign(cent), emb)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup that
    * composes the [[kmeansFit]] trainer with the within-cluster form of
    * [[embeddingNearDupPairs]]'s verify step — cluster the embeddings, then
    * drop any vector whose cosine to a SMALLER-id vector in the SAME cluster
    * reaches `eps` (min-id representative, the same keep policy as the
    * MinHash dedup chain). Output: every vector with its cluster and keep
    * verdict.
    *
    * Plan shape for 100 TB: centroids stay broadcast (k x dim); the
    * pairwise pass is confined to within-cluster partitions — in production
    * k scales with the corpus (SemDeDup runs ~100k clusters on LAION) so
    * cluster populations stay bounded and nothing is globally quadratic.
    * The self-join is SALTED on hash(vec_b) so its parallelism is
    * k x `pairSalts` tasks, not k — with few clusters (this oracle-checked
    * setting, or any skewed clustering) a bare cluster-keyed join would
    * idle all but k cores; salting replicates only the probe side, changes
    * no semantics, and spreads each cluster's pair block evenly. The drop
    * set is a small broadcast anti-side, like dd06. Cosine is rounded to
    * 6 dp before the threshold test (engine-portable, same rule as sim03). */
  def semDedup(s: SparkSession, dir: String, k: Int = 8, iters: Int = 2,
      eps: Double = 0.45, pairSalts: Int = 8): DataFrame = {
    val (asg, emb) = kmeansFit(s, dir, k, iters)
    val m = asg.join(emb, "vec_id")
      .select(col("vec_id"), col("cid").as("cluster"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val drops = m.select(col("vec_id").as("vec_a"), col("cluster").as("ca"),
        col("v").as("va"))
      .withColumn("sa", explode(array((0 until pairSalts).map(lit): _*)))
      .join(m.select(col("vec_id").as("vec_b"), col("cluster").as("cb"),
          col("v").as("vb"))
          .withColumn("sb", pmod(hash(col("vec_b")), lit(pairSalts))),
        col("ca") === col("cb") && col("sa") === col("sb") &&
          col("vec_a") < col("vec_b"))
      .filter(round(cosine(col("va"), col("vb")), 6) >= eps)
      .select(col("vec_b").as("vec_id"))
      .distinct()
    m.join(broadcast(drops.withColumn("dropped", lit(true))), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dropped").isNull.as("is_kept"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB SQL replicating [[kmeansAssign]] exactly: the iteration loop is
    * unrolled into CTE blocks generated from the same (k, iters) spec, so
    * the operator and its oracle cannot drift. Assignment argmax is a
    * row_number window (ccos DESC, cid ASC — same tie-break); centroid
    * means are rounded 6 dp like the Spark side. */
  def kmeansOracleSql(k: Int = 8, iters: Int = 2): String =
    s"""
      ${kmeansOracleCtes(k, iters)}
      SELECT vec_id, cid AS cluster FROM af ORDER BY vec_id"""

  /** The shared WITH-chain of the k-means oracles: unrolled Lloyd iterations
    * ending in `af` (the final assignment) over `e` (the cast embeddings).
    * [[kmeansOracleSql]] and [[semDedupOracleSql]] both append to it, so the
    * trainer and its compositions cannot drift. */
  private def kmeansOracleCtes(k: Int, iters: Int): String = {
    def assignCte(name: String, cent: String) = s"""
      $name AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
        FROM e CROSS JOIN $cent c) z WHERE rn = 1)"""
    def centCte(name: String, asg: String) = s"""
      $name AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM (
        SELECT a.cid, t.i AS pos, round(avg(e.v[CAST(t.i AS INT)]), 6) AS cx
        FROM $asg a JOIN e USING (vec_id) CROSS JOIN range(1, 65) t(i)
        GROUP BY a.cid, t.i) z GROUP BY cid)"""
    val blocks = (1 to iters).flatMap { i =>
      Seq(assignCte(s"a$i", if (i == 1) "c0" else s"c${i - 1}"),
        centCte(s"c$i", s"a$i"))
    }.mkString(",")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $k),
      ${blocks.drop(1)},
      af AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
        FROM e CROSS JOIN c$iters c) z WHERE rn = 1)"""
  }

  /** DuckDB SQL replicating [[semDedup]]: the [[kmeansOracleCtes]] chain,
    * then within-cluster pairs through the SAME sequential-fold cosine the
    * sim01/sim03 oracles use (bit-identical to CosineSim — the assignment
    * CTEs only need cosine for ORDERING, the threshold test needs the exact
    * value), rounded 6 dp against `eps`, min-id keep policy. */
  def semDedupOracleSql(k: Int = 8, iters: Int = 2, eps: Double = 0.45): String = {
    def fold(a: String, b: String): String =
      s"""(list_sum(list_transform(range(1, len($a)+1), i -> $a[CAST(i AS INT)]*$b[CAST(i AS INT)])) /
         (sqrt(list_sum(list_transform(range(1, len($a)+1), i -> $a[CAST(i AS INT)]*$a[CAST(i AS INT)]))) *
          sqrt(list_sum(list_transform(range(1, len($b)+1), i -> $b[CAST(i AS INT)]*$b[CAST(i AS INT)])))))"""
    s"""
      ${kmeansOracleCtes(k, iters)},
      m AS (SELECT a.vec_id, a.cid AS cluster, e.v FROM af a JOIN e USING (vec_id)),
      drops AS (SELECT DISTINCT b.vec_id
                FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                WHERE round(${fold("a.v", "b.v")}, 6) >= $eps)
      SELECT m.vec_id, m.cluster, (d.vec_id IS NULL) AS is_kept
      FROM m LEFT JOIN drops d ON m.vec_id = d.vec_id
      ORDER BY m.vec_id"""
  }

  /** sim08 — maximum-inner-product search (MIPS): top-k candidates per
    * query by the UN-normalized dot product — the retrieval metric when
    * vector magnitude carries signal (recommender scores, learned
    * retrieval embeddings), where cosine (sim01) would be wrong. Scored by
    * the native codegen'd [[graft.functions.DotProduct]] kernel.
    *
    * Plan shape for 100 TB: identical to [[bruteForceTopK]]'s — broadcast
    * query set over ONE pass of the candidate stream, per-query
    * WindowGroupLimit top-k (PlanAuditSpec pins that the corpus side is
    * never broadcast). The sublinear scale path is [[mipsLshTopK]]
    * (sim09): the asymmetric transform (Shrivastava & Li 2014) — augment
    * candidates with sqrt(M² − ‖x‖²) and queries with 0, which makes
    * augmented-space cosine order = dot order, so the WHOLE sign-LSH
    * machinery of sim02 applies unchanged — Round6bOpsSpec proves the
    * transform's rank-equivalence on this corpus, making the reduction a
    * tested fact rather than a cited one. */
  def mipsTopK(s: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 100): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val c = Tables.parallel(emb)
      .select(col("vec_id").as("cand_id"), asDouble(col("embedding")).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("ip").desc, col("cand_id"))
    c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("ip",
        round(graft.functions.DotProduct.dotProduct(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("ip"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** DuckDB SQL replicating [[mipsTopK]] exactly (the sequential-fold dot
    * product — bit-identical to [[graft.functions.DotProduct]] — same
    * 6dp round before the rank, same tiebreaks). */
  def mipsTopKOracleSql(k: Int = 5, nQueries: Int = 100): String = s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   round(list_sum(list_transform(range(1, len(q.v)+1),
                     i -> q.v[CAST(i AS INT)] * c.v[CAST(i AS INT)])), 6) AS ip
                 FROM e q JOIN e c ON c.vec_id <> q.vec_id
                 WHERE q.vec_id < $nQueries)
      SELECT query_id, cand_id, ip, rnk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY ip DESC, cand_id) AS BIGINT) AS rnk
        FROM scored) z
      WHERE rnk <= $k ORDER BY query_id, rnk"""

  /** sim09 — sublinear MIPS: the asymmetric transform (Shrivastava & Li
    * 2014, "Asymmetric LSH for sublinear time MIPS") feeding the sign-LSH
    * machinery of [[lshTopK]]. Candidates are augmented with one extra
    * coordinate sqrt(M² − ‖x‖²) (M² = the corpus max squared norm) and
    * queries with 0 — in the augmented space every candidate has the SAME
    * norm M, so cosine order against a fixed query equals dot-product
    * order (rank-equivalence proven on this corpus in Round6bOpsSpec), and
    * random-hyperplane bucketing becomes a valid MIPS candidate filter.
    * Buckets meet by equi-join (multi-probe over 1-bit flips); surviving
    * id pairs are scored by the EXACT dot product, so every emitted row is
    * exact — recall is the LSH tradeoff, tuned by `planes`.
    *
    * Plan shape for 100 TB: ‖x‖² is one columnar pass; M² is a 1-row
    * aggregate joined back by broadcast (never collected to the driver);
    * bucketing is embarrassingly parallel; the candidate join is
    * bucket-equi (no all-pairs anywhere); the pair stream carries IDS ONLY
    * until the final per-pair scoring join, and the query-vector join is
    * broadcast. This is the sublinear twin [[mipsTopK]]'s scaladoc names.
    *
    * Oracle-checkable end to end because the hyperplanes are md5-derived:
    * DuckDB re-derives the identical augmented vectors (same left-to-right
    * norm fold, same max, same sqrt), hence identical buckets, candidates,
    * and ranking — see [[mipsLshOracleSql]]. */
  def mipsLshTopK(s: SparkSession, dir: String, k: Int = 5, planes: Int = 8,
      nQueries: Int = 100): DataFrame = {
    val emb = Tables.parallel(Tables.embeddings(s, dir))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n2",
        graft.functions.DotProduct.dotProduct(col("v"), col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mx = emb.agg(max(col("n2")).as("maxn2"))
    val cands = emb.crossJoin(broadcast(mx))
      .select(col("vec_id").as("cand_id"),
        lshBucket(concat(col("v"), array(sqrt(col("maxn2") - col("n2")))),
          planes).as("cbucket"))
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        lshBucket(concat(col("v"), array(lit(0.0d))), planes).as("bucket"))
      .select(col("query_id"),
        explode(array((col("bucket") +: (0 until planes).map(p =>
          col("bucket").bitwiseXOR(lit(1L << p)))): _*)).as("probe"))
    val candIds = probes
      .join(cands, col("probe") === col("cbucket") &&
        col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"))
      .distinct() // a pair can meet via several probes; ids only — no vectors
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("ip").desc, col("cand_id"))
    candIds
      .join(emb.select(col("vec_id").as("cand_id"), col("v").as("cv")),
        "cand_id")
      .join(broadcast(emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))), "query_id")
      .withColumn("ip",
        round(graft.functions.DotProduct.dotProduct(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("ip"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** DuckDB SQL replicating [[mipsLshTopK]] exactly: same left-to-right
    * squared-norm fold, same corpus max, same augmented vectors (so the
    * md5-parity sign projections agree bit for bit), same multi-probe set,
    * same exact-dot ranking. */
  def mipsLshOracleSql(k: Int = 5, planes: Int = 8, dim: Int = 64,
      nQueries: Int = 100): String = s"""
      WITH n AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               list_sum(list_transform(range(1, $dim + 1),
                 i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE) * CAST(embedding[CAST(i AS INT)] AS DOUBLE))) AS n2
        FROM embeddings),
      mx AS (SELECT max(n2) AS maxn2 FROM n),
      ca AS (SELECT vec_id, list_append(v, sqrt(mx.maxn2 - n2)) AS av
             FROM n, mx),
      qa AS (SELECT vec_id, list_append(v, CAST(0.0 AS DOUBLE)) AS av
             FROM n WHERE vec_id < $nQueries),
      signs AS (SELECT p.p, i.i,
                  CASE WHEN CAST(concat('0x', substr(md5(concat(CAST(p.p AS VARCHAR), ':', CAST(i.i AS VARCHAR))), 1, 1)) AS INT) % 2 = 0
                       THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sg
                FROM range(0, $planes) p(p), range(0, ${dim + 1}) i(i)),
      cb AS (SELECT vec_id,
               CAST(sum(CASE WHEN pr >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
             FROM (SELECT ca.vec_id, s.p,
                     list_sum(list(ca.av[CAST(s.i + 1 AS INT)] * s.sg ORDER BY s.i)) AS pr
                   FROM ca CROSS JOIN signs s GROUP BY ca.vec_id, s.p) z
             GROUP BY vec_id),
      qb AS (SELECT vec_id,
               CAST(sum(CASE WHEN pr >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
             FROM (SELECT qa.vec_id, s.p,
                     list_sum(list(qa.av[CAST(s.i + 1 AS INT)] * s.sg ORDER BY s.i)) AS pr
                   FROM qa CROSS JOIN signs s GROUP BY qa.vec_id, s.p) z
             GROUP BY vec_id),
      probes AS (SELECT vec_id AS query_id,
                   unnest(list_prepend(bucket,
                     list_transform(range(0, $planes), p -> xor(bucket, 1 << p)))) AS probe
                 FROM qb),
      cand AS (SELECT DISTINCT p.query_id, c.vec_id AS cand_id
               FROM probes p JOIN cb c
                 ON p.probe = c.bucket AND c.vec_id <> p.query_id),
      scored AS (SELECT c.query_id, c.cand_id,
                   round(list_sum(list_transform(range(1, $dim + 1),
                     i -> q.v[CAST(i AS INT)] * x.v[CAST(i AS INT)])), 6) AS ip
                 FROM cand c JOIN n q ON c.query_id = q.vec_id
                 JOIN n x ON c.cand_id = x.vec_id)
      SELECT query_id, cand_id, ip, rnk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY ip DESC, cand_id) AS BIGINT) AS rnk
        FROM scored) z
      WHERE rnk <= $k ORDER BY query_id, rnk"""

  /** sim10 — margin-based pair mining (the CCMatrix / LASER bitext-mining
    * criterion, Artetxe & Schwenk 2019): two embedding sets X (even vec_id,
    * the "source side") and Y (odd vec_id, the "target side"); a candidate
    * pair (x, y) is scored not by raw cosine but by the MARGIN
    * `2·cos(x,y) / (dx(x) + dy(y))` where dx/dy are the mean cosines of each
    * vector to its k nearest neighbors on the OTHER side — normalizing away
    * hubness (vectors that are close to everything score high raw cosine
    * against everything; dividing by their neighborhood density cancels it).
    * Emits each query's top-k forward candidates re-ranked by margin, with
    * `accepted` = (best candidate AND margin above threshold) — the mined
    * pair decision.
    *
    * Plan shape for 100 TB: the bounded query set broadcasts over ONE pass
    * of the Y side (forward kNN, per-query WindowGroupLimit top-k — the
    * corpus never shuffles); the surviving candidate set is ≤ k·|Q| rows, so
    * IT broadcasts over ONE pass of the X side for the reverse-kNN density
    * term. Two linear corpus passes, two bounded broadcasts, no all-pairs
    * anywhere. For unbounded |Q| the forward pass swaps in the sign-LSH
    * bucketing of [[lshTopK]] unchanged (cosine is the metric on both
    * sides). Determinism: cosines round to 6 dp before ranking (id
    * tie-break), each density mean folds its k addends in rank order
    * (k = 4 ⇒ the /k division is exact in IEEE), margin rounds to 6 dp
    * before the final rank. */
  def marginMining(s: SparkSession, dir: String, k: Int = 4,
      nQueries: Int = 100, threshold: Double = 1.02): DataFrame = {
    val emb = Tables.parallel(Tables.embeddings(s, dir))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val xs = emb.filter(col("vec_id") % 2 === 0)
    val ys = emb.filter(col("vec_id") % 2 === 1)
    val q = xs.filter(col("vec_id") < 2 * nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))

    // rank-ordered sequential fold of the k neighbor cosines => mean
    def densityOf(df: DataFrame, key: String, out: String): DataFrame =
      df.groupBy(col(key))
        .agg((aggregate(
          transform(
            array_sort(collect_list(struct(col("rnk"), col("cos")))),
            x => x.getField("cos")),
          lit(0.0d), (a, b) => a + b) / k).as(out))

    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    val fwd = ys.select(col("vec_id").as("cand_id"), col("v").as("cv"))
      .join(broadcast(q))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(wq).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rnk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dx = densityOf(fwd, "query_id", "dx")

    // reverse kNN for the bounded candidate set only (ids join their
    // vectors back y-keyed, then broadcast over one X pass)
    val candY = fwd.select(col("cand_id")).distinct()
      .join(ys.select(col("vec_id").as("cand_id"), col("v").as("yv")), "cand_id")
    val wy = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cand_id")).orderBy(col("cos").desc, col("x_id"))
    val rev = xs.select(col("vec_id").as("x_id"), col("v").as("xv"))
      .join(broadcast(candY))
      .withColumn("cos", round(cosine(col("yv"), col("xv")), 6))
      .withColumn("rnk", row_number().over(wy).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("cand_id"), col("cos"), col("rnk"))
    val dy = densityOf(rev, "cand_id", "dy")

    val wm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("margin").desc, col("cand_id"))
    fwd.join(dx, "query_id").join(dy, "cand_id")
      .withColumn("margin",
        round(col("cos") * 2.0d / (col("dx") + col("dy")), 6))
      .withColumn("mrnk", row_number().over(wm).cast("long"))
      .select(col("query_id"), col("cand_id"), col("cos"), col("margin"),
        col("mrnk"),
        (col("margin") > threshold && col("mrnk") === 1).as("accepted"))
      .orderBy(col("query_id"), col("mrnk"))
  }

  /** DuckDB SQL replicating [[marginMining]] exactly: same parity split,
    * same 6dp-rounded sequential-fold cosine, same rank-ordered density
    * folds (list(cos ORDER BY rnk) = the array_sort fold), same margin
    * arithmetic (cos*2 and /k are exact IEEE scalings), same tie-breaks. */
  def marginMiningOracleSql(k: Int = 4, nQueries: Int = 100,
      threshold: Double = 1.02): String = s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      xs AS (SELECT * FROM e WHERE vec_id % 2 = 0),
      ys AS (SELECT * FROM e WHERE vec_id % 2 = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM xs WHERE vec_id < ${2 * nQueries}),
      fscored AS (SELECT q.query_id, c.vec_id AS cand_id,
                    round(${cosListSql("q.qv", "c.v")}, 6) AS cos
                  FROM q CROSS JOIN ys c),
      fwd AS MATERIALIZED (SELECT query_id, cand_id, cos, rnk FROM (
               SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                           ORDER BY cos DESC, cand_id) AS BIGINT) AS rnk
               FROM fscored) z WHERE rnk <= $k),
      dx AS (SELECT query_id, list_sum(list(cos ORDER BY rnk)) / $k AS dx
             FROM fwd GROUP BY query_id),
      cy AS (SELECT c.cand_id, y.v AS yv
             FROM (SELECT DISTINCT cand_id FROM fwd) c
             JOIN ys y ON c.cand_id = y.vec_id),
      rscored AS (SELECT cy.cand_id, x.vec_id AS x_id,
                    round(${cosListSql("cy.yv", "x.v")}, 6) AS cos
                  FROM cy CROSS JOIN xs x),
      rev AS (SELECT cand_id, cos, rnk FROM (
               SELECT *, CAST(row_number() OVER (PARTITION BY cand_id
                           ORDER BY cos DESC, x_id) AS BIGINT) AS rnk
               FROM rscored) z WHERE rnk <= $k),
      dy AS (SELECT cand_id, list_sum(list(cos ORDER BY rnk)) / $k AS dy
             FROM rev GROUP BY cand_id)
      SELECT query_id, cand_id, cos, margin, mrnk,
             (margin > $threshold AND mrnk = 1) AS accepted
      FROM (SELECT f.query_id, f.cand_id, f.cos,
              round(f.cos * 2.0 / (dx.dx + dy.dy), 6) AS margin,
              CAST(row_number() OVER (PARTITION BY f.query_id
                ORDER BY round(f.cos * 2.0 / (dx.dx + dy.dy), 6) DESC,
                         f.cand_id) AS BIGINT) AS mrnk
            FROM fwd f JOIN dx USING (query_id) JOIN dy USING (cand_id)) z
      ORDER BY query_id, mrnk"""

  /** sim11 — multi-vector late-interaction retrieval (ColBERT's MaxSim,
    * Khattab & Zaharia 2020): entities are BAGS of vectors (here: document
    * i = the `vecsPerDoc` consecutive embeddings with vec_id div
    * vecsPerDoc = i — the passage-chunk layout a multi-vector store uses),
    * and the score of query doc Q against candidate doc D is
    * `sum_{q in Q} max_{d in D} cos(q, d)` — each query vector finds its
    * best-matching candidate vector and the evidence sums, which is what
    * lets one strongly-matching chunk pair dominate where a single pooled
    * vector (sim01) would average it away. Emits each query doc's top-k
    * candidate docs.
    *
    * Determinism: cosines round 6dp before the max; the per-(q-vector,
    * cand-doc) max is order-free; the sum over query vectors folds in
    * vec_id order (bounded addend count = vecsPerDoc) and rounds 6dp; the
    * final rank ties on cand doc id.
    *
    * Plan shape for 100 TB: the query doc set is bounded → its vector bag
    * broadcasts over ONE pass of the candidate vector stream (the corpus
    * never shuffles on anything but its own partitioning); the max and the
    * sum are two map-side-combinable aggregates whose keys shrink the
    * stream (vectors → q-vec x cand-doc → q-doc x cand-doc), then a
    * per-query-doc WindowGroupLimit top-k. For unbounded query sets the
    * forward pass swaps in [[lshTopK]]'s sign-LSH bucketing per query
    * vector (cosine is the metric), exactly the sim02 reduction. */
  def maxSimTopK(s: SparkSession, dir: String, vecsPerDoc: Int = 5,
      nQueryDocs: Int = 10, k: Int = 5): DataFrame = {
    val emb = Tables.parallel(Tables.embeddings(s, dir))
      .select((col("vec_id") / vecsPerDoc).cast("long").as("did"),
        col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") < vecsPerDoc.toLong * nQueryDocs)
      .select(col("did").as("qdid"), col("vec_id").as("qid"), col("v").as("qv"))
    val best = emb.select(col("did").as("ddid"), col("v").as("dv"))
      .join(broadcast(q), col("qdid") =!= col("ddid"))
      .withColumn("cos", round(cosine(col("qv"), col("dv")), 6))
      .groupBy(col("qdid"), col("qid"), col("ddid"))
      .agg(max(col("cos")).as("mx"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qdid")).orderBy(col("maxsim").desc, col("ddid"))
    best.groupBy(col("qdid"), col("ddid"))
      .agg(round(aggregate(
        transform(array_sort(collect_list(struct(col("qid"), col("mx")))),
          x => x.getField("mx")),
        lit(0.0d), (a, b) => a + b), 6).as("maxsim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qdid"), col("ddid"), col("maxsim"), col("rnk"))
      .orderBy(col("qdid"), col("rnk"))
  }

  /** DuckDB SQL replicating [[maxSimTopK]] exactly (same integer-division
    * doc grouping, same 6dp-rounded fold cosine, same vec_id-ordered
    * evidence fold, same tie-breaks). */
  def maxSimOracleSql(vecsPerDoc: Int = 5, nQueryDocs: Int = 10,
      k: Int = 5): String = s"""
      WITH e AS (SELECT CAST(vec_id // $vecsPerDoc AS BIGINT) AS did, vec_id,
                        CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      q AS (SELECT did AS qdid, vec_id AS qid, v AS qv FROM e
            WHERE vec_id < ${vecsPerDoc.toLong * nQueryDocs}),
      sc AS (SELECT q.qdid, q.qid, d.did AS ddid,
                    round(${cosListSql("q.qv", "d.v")}, 6) AS cos
             FROM q JOIN e d ON q.qdid <> d.did),
      best AS (SELECT qdid, qid, ddid, max(cos) AS mx
               FROM sc GROUP BY qdid, qid, ddid),
      agg AS (SELECT qdid, ddid,
                     round(list_sum(list(mx ORDER BY qid)), 6) AS maxsim
              FROM best GROUP BY qdid, ddid)
      SELECT qdid, ddid, maxsim, rnk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY qdid
                    ORDER BY maxsim DESC, ddid) AS BIGINT) AS rnk
        FROM agg) z
      WHERE rnk <= $k ORDER BY qdid, rnk"""

  /** ir09 — ANN recall report: per query, how much of the EXACT cosine
    * top-k ([[bruteForceTopK]]) the sign-LSH index ([[lshTopK]]) actually
    * returned — recall@k plus the reciprocal rank of the true nearest
    * neighbor in the ANN list. This is the eval harness every ANN
    * deployment runs before trusting an index: the bucketed path's recall
    * is corpus-dependent (SimilaritySpec asserts a floor; THIS op makes
    * the number a first-class, oracle-checked output a pipeline can gate
    * on).
    *
    * Determinism: overlap counts are exact integers; recall = n/k and
    * rr = 1/rank are single IEEE divisions of exact integers.
    *
    * Plan shape for 100 TB: composes the two audited retrieval plans
    * (their own pins apply) and then joins k-row-per-query result sets —
    * the evaluation itself is query-scale, never corpus-scale. */
  def annRecallQuery(s: SparkSession, dir: String, k: Int = 5,
      planes: Int = 8, nQueries: Int = 100): DataFrame = {
    val ex = bruteForceTopK(s, dir, k, nQueries)
    val ls = lshTopK(s, dir, k, planes, nQueries)
    val ov = ex.select(col("query_id"), col("cand_id"))
      .join(ls.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
    val nn = ex.filter(col("rnk") === 1)
      .select(col("query_id"), col("cand_id"))
      .join(ls.select(col("query_id"), col("cand_id"),
        col("rnk").as("nn_rnk")), Seq("query_id", "cand_id"), "left")
      .select(col("query_id"),
        coalesce(lit(1.0d) / col("nn_rnk").cast("double"), lit(0.0d)).as("rr"))
    ex.select(col("query_id")).distinct()
      .join(ov, Seq("query_id"), "left")
      .join(nn, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"),
        coalesce(col("rr"), lit(0.0d)).as("rr"))
      .orderBy(col("query_id"))
  }

  /** DuckDB SQL replicating [[annRecallQuery]] exactly — the sim01 and
    * sim02 oracles as subqueries (the SAME shared definitions those
    * queries check), then the identical overlap/rank arithmetic. */
  def annRecallOracleSql(k: Int = 5, planes: Int = 8, dim: Int = 64,
      nQueries: Int = 100): String = s"""
      WITH ex AS (${bruteForceTopKOracleSql(k, nQueries)}),
      ls AS (${lshTopKOracleSql(k, planes, dim, nQueries)}),
      ov AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_overlap
             FROM ex e JOIN ls l
               ON e.query_id = l.query_id AND e.cand_id = l.cand_id
             GROUP BY e.query_id),
      nn AS (SELECT e.query_id,
               CASE WHEN l.rnk IS NULL THEN 0.0
                    ELSE 1.0 / CAST(l.rnk AS DOUBLE) END AS rr
             FROM ex e LEFT JOIN ls l
               ON e.query_id = l.query_id AND e.cand_id = l.cand_id
             WHERE e.rnk = 1)
      SELECT q.query_id,
             coalesce(ov.n_overlap, 0) AS n_overlap,
             CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) / $k.0 AS recall,
             coalesce(nn.rr, 0.0) AS rr
      FROM (SELECT DISTINCT query_id FROM ex) q
      LEFT JOIN ov ON ov.query_id = q.query_id
      LEFT JOIN nn ON nn.query_id = q.query_id
      ORDER BY q.query_id"""
}
