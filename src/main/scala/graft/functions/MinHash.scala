package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native Catalyst expression.
  *
  * Semantically identical to [[Text.minhashSignature]] (same xxhash64 base
  * fold into the 2^31-1 field, same affine family h_j(x) = ((2j+1)x + 40503j)
  * mod P) but evaluated as one tight JIT-friendly loop per row instead of
  * k nested HigherOrderFunction lambdas. The HOF composition is interpreted
  * per element (no codegen for array lambdas), costing ~n*k boxed expression
  * evaluations per document; this expression costs n hashes + n*k primitive
  * long ops. At 5k docs x 400 shingles x k=128 that is the difference
  * between ~85 s and well under a second — and the gap widens linearly with
  * corpus size, which is what matters at 100 TB.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1
  private val SeedXx = 42L    // functions.xxhash64's fixed seed

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill[Long](k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // null elements fold the xxhash64 seed (42) like the HOF spec does —
      // Spark's hash functions return the seed for null inputs
      val base =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          java.lang.Math.floorMod(
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, SeedXx), P)
        }
      var j = 0
      while (j < k) {
        // a < 2^41 and P is Mersenne (2^31-1): a mod P = fold(a>>>31 + (a&P))
        val a = (2L * j + 1L) * base + 40503L * j
        var h = (a >>> 31) + (a & P)
        if (h >= P) h -= P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** minhash_sig(shingles: array<string>, k): array<bigint> */
  def minhashSig(shingles: Column, k: Int): Column =
    GraftBridge.toColumn(MinHashSig(GraftBridge.toExpression(shingles), k))
}

/** MinHash signature straight from the text column: slides the n-char
  * shingle window over the string and folds every window into the k
  * running minima in one pass — no shingle array is ever materialized.
  * Identical output to MinHashSig(charShingles(text, n), k): minimum over
  * a multiset equals minimum over its distinct set, and the byte-offset
  * windows are exactly the substrings charShingles takes.
  *
  * Windows are addressed by a precomputed char→byte offset table and hashed
  * straight from the string's backing memory — O(len) per document and
  * allocation-free, where a substring-per-window formulation is O(len^2)
  * char scans plus a UTF8String allocation per window. */
case class MinHashFromText(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  private val P = 2147483647L
  private val SeedXx = 42L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val numBytes = text.numBytes
    val offs = Utf8Windows.charOffsets(base, off, numBytes)
    val nChars = offs.length - 1
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val nWindows = math.max(nChars - (n - 1), 1)
    var i = 0
    while (i < nWindows) {
      val startB = offs(i)
      val endB = offs(math.min(i + n, nChars))
      val raw = XXH64.hashUnsafeBytes(base, off + startB, endB - startB, SeedXx)
      val h0 = java.lang.Math.floorMod(raw, P)
      var j = 0
      while (j < k) {
        // a < 2^41 and P is Mersenne (2^31-1): a mod P = fold(a>>>31 + (a&P))
        val a = (2L * j + 1L) * h0 + 40503L * j
        var h = (a >>> 31) + (a & P)
        if (h >= P) h -= P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashFromText", this, classOf[MinHashFromText].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashFromText =
    copy(child = newChild)
}

/** Shared char→byte offset table for sliding UTF-8 windows. */
private[functions] object Utf8Windows {
  /** Byte offset of every char start, plus a final entry = numBytes.
    * One linear pass; makes any char-addressed window a byte slice. */
  def charOffsets(base: AnyRef, off: Long, numBytes: Int): Array[Int] = {
    // worst case 1 byte per char; trim by building into an exact-size copy
    val tmp = new Array[Int](numBytes + 1)
    var nChars = 0
    var b = 0
    while (b < numBytes) {
      tmp(nChars) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + b))
      nChars += 1
    }
    tmp(nChars) = numBytes
    if (nChars + 1 == tmp.length) tmp
    else java.util.Arrays.copyOf(tmp, nChars + 1)
  }
}

object MinHashFromText {
  def minhashFromText(text: Column, n: Int, k: Int): Column =
    GraftBridge.toColumn(MinHashFromText(GraftBridge.toExpression(text), n, k))
}

/** Fraction of positions where two equal-length signatures agree — the
  * unbiased MinHash estimate of Jaccard similarity. Used as a candidate
  * prefilter: at sig length 128 the estimate's std around j=0.8 is 0.035,
  * so a 0.6 cutoff is 5.7 sigma — it cannot drop a true >=0.8 pair, but
  * it discards the huge mass of ~0.2-background candidates for 128 long
  * comparisons instead of an 800-element array intersection. */
case class SigOverlap(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  def compute(a0: ArrayData, b0: ArrayData): Double = {
    val a = a0.toLongArray()
    val b = b0.toLongArray()
    val n = math.min(a.length, b.length)
    var eq = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigOverlap", this, classOf[SigOverlap].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigOverlap =
    copy(left = newLeft, right = newRight)
}

object SigOverlap {
  def sigOverlap(a: Column, b: Column): Column =
    GraftBridge.toColumn(SigOverlap(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}

/** Distinct character n-gram shingles as a native expression — output is
  * identical to array_distinct(transform(sequence(...), substring(...)))
  * (first-occurrence order preserved) without per-window interpreted
  * lambda evaluation. Windows are byte slices over one precomputed offset
  * table (O(len), not O(len^2) char scans). */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = text.getBytes // one copy; windows slice it without rescans
    val offs = Utf8Windows.charOffsets(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length)
    val nChars = offs.length - 1
    val nWindows = math.max(nChars - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String](nWindows * 2)
    var i = 0
    while (i < nWindows) {
      val startB = offs(i)
      val endB = offs(math.min(i + n, nChars))
      seen.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes, startB, endB - startB))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charShingles", this, classOf[CharShingles].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  def charShingles(text: Column, n: Int): Column =
    GraftBridge.toColumn(CharShingles(GraftBridge.toExpression(text), n))
}
