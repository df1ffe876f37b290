package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Cosine similarity of two double arrays as a native Catalyst expression.
  *
  * Same result, bit for bit, as the HOF formulation
  * dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))) with left-to-right summation
  * (which is also how DuckDB's list_sum folds — keeping the DuckDB oracle
  * exact) — but a single primitive loop per pair instead of three
  * interpreted aggregate() lambdas, which is what makes brute-force and
  * LSH-bucketed similarity paths CPU-bound instead of boxing-bound.
  *
  * Real codegen (not CodegenFallback): the generated code calls the typed
  * [[compute]] through a plan reference — no InternalRow materialization
  * and no boxing per row, and the surrounding WholeStageCodegen pipeline
  * stays fused. The same pattern is applied to every expression below and
  * pinned compiled-vs-interpreted in CodegenParitySpec.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  def compute(a0: ArrayData, b0: ArrayData): Double = {
    val a = a0.toDoubleArray()
    val b = b0.toDoubleArray()
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i)
      na += a(i) * a(i)
      nb += b(i) * b(i)
      i += 1
    }
    // zero-norm guard: NaN would sort ABOVE every real cosine under Spark's
    // NaN-largest ordering, making a degenerate all-zero vector everyone's
    // "nearest neighbor"; similarity to a zero vector is defined as 0.
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** cosine_sim(a: array<double>, b: array<double>): double */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.toColumn(CosineSim(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}

/** Sign-LSH bucket id of a double vector under `planes` deterministic random
  * hyperplanes, as a native Catalyst expression.
  *
  * Bit-identical to the interpreted HOF spec in
  * [[graft.operators.Similarity.lshBucketHof]]: hyperplane component
  * (p, i) is +1 when the first hex digit of md5("p:i") is even, else -1 —
  * md5 rather than xxhash64 so the SAME buckets are derivable in ANY
  * engine (DuckDB has md5 but not Spark's xxhash64; this is what gives the
  * bucketed ANN queries full end-to-end oracles, the Md5SimHash60 trick).
  * The projection is a left-to-right sum of v(i) * sign, and bit p is set
  * when the projection is >= 0. The HOF form evaluates `planes`
  * interpreted aggregate(zip_with(..)) lambda chains per row —
  * O(planes x dim) boxed calls; this expression is one primitive loop over
  * a per-dimension sign table computed once per (partition, dim), which is
  * what keeps the ANN bucketing pass CPU-bound at corpus scale.
  */
case class SignLshBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  // (dim -> sign table) cache; one reference assignment keeps the benign
  // race safe if an instance is ever shared across threads
  @transient private var cached: (Int, Array[Double]) = _

  private def signsFor(dim: Int): Array[Double] = {
    val c = cached
    if (c != null && c._1 == dim) return c._2
    val md = java.security.MessageDigest.getInstance("MD5")
    val arr = new Array[Double](planes * dim)
    var p = 0
    while (p < planes) {
      var i = 0
      while (i < dim) {
        md.reset()
        val digest = md.digest(s"$p:$i".getBytes("UTF-8"))
        val firstHexDigit = (digest(0) >> 4) & 0xF
        arr(p * dim + i) = if (firstHexDigit % 2 == 0) 1.0 else -1.0
        i += 1
      }
      p += 1
    }
    cached = (dim, arr)
    arr
  }

  def compute(input: ArrayData): Long = {
    val v = input.toDoubleArray()
    val dim = v.length
    val sg = signsFor(dim)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      val base = p * dim
      var i = 0
      while (i < dim) { proj += v(i) * sg(base + i); i += 1 }
      if (proj >= 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference to THIS instance: generated code reuses the per-instance
    // sign-table cache across rows
    val ref = ctx.addReferenceObj("signLsh", this, classOf[SignLshBucket].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}

object SignLshBucket {
  /** sign_lsh_bucket(v: array<double>, planes): bigint */
  def signLshBucket(v: Column, planes: Int): Column =
    GraftBridge.toColumn(SignLshBucket(GraftBridge.toExpression(v), planes))
}

/** Squared L2 distance of two double arrays as a native Catalyst expression
  * (left-to-right summation, same fold order as DuckDB's list_sum — the
  * per-subvector metric of the PQ encode/LUT passes, evaluated N x M x K
  * times per corpus, so it gets the same primitive-loop treatment as
  * [[CosineSim]]). */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  def compute(a0: ArrayData, b0: ArrayData): Double = {
    val a = a0.toDoubleArray()
    val b = b0.toDoubleArray()
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqDist", this, classOf[SqDist].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  /** sq_dist(a: array<double>, b: array<double>): double */
  def sqDist(a: Column, b: Column): Column =
    GraftBridge.toColumn(SqDist(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}

/** PQ asymmetric-distance (ADC) score: codes is a candidate's per-subspace
  * codeword array (M entries), lut a query's distance lookup table laid out
  * as (subspace-major, code-minor: index m*k + code), k the codebook size.
  * Result = sum over subspaces, in subspace order, of lut(m*k + codes(m)) —
  * the table-lookup sum that makes PQ scans memory-bound instead of
  * FLOP-bound. Native expression for the same reason as [[CosineSim]]: this
  * evaluates once per (query, candidate) pair in the scan. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  def compute(codes: ArrayData, lutAny: ArrayData): Double = {
    val lut = lutAny.toDoubleArray()
    var acc = 0.0
    var m = 0
    val nM = codes.numElements()
    while (m < nM) { acc += lut(m * k + codes.getInt(m)); m += 1 }
    acc
  }

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any =
    java.lang.Double.valueOf(
      compute(codesAny.asInstanceOf[ArrayData], lutAny.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (c, l) => s"${ev.value} = $ref.compute($c, $l);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** pq_adc(codes: array<int>, lut: array<double>, k): double */
  def pqAdc(codes: Column, lut: Column, k: Int): Column =
    GraftBridge.toColumn(PqAdc(GraftBridge.toExpression(codes), GraftBridge.toExpression(lut), k))
}

/** Inner product of two double arrays as a native Catalyst expression —
  * the scoring kernel of maximum-inner-product search (sim08), where the
  * UN-normalized dot IS the metric (recommender/retrieval scores), so
  * [[CosineSim]]'s normalization must not run. Left-to-right summation,
  * same fold order as DuckDB's list_sum; same primitive-loop/codegen
  * treatment as the other kernels, pinned in CodegenParitySpec. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  def compute(a0: ArrayData, b0: ArrayData): Double = {
    val a = a0.toDoubleArray()
    val b = b0.toDoubleArray()
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotProduct", this, classOf[DotProduct].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** dot_product(a: array<double>, b: array<double>): double */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.toColumn(DotProduct(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
