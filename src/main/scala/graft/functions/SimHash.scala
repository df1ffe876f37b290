package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftBridge

/** SimHash-64 over a token array as a native Catalyst expression.
  *
  * Charikar's similarity-preserving fingerprint: each token is hashed to 64
  * bits (two murmur3-32 passes with distinct seeds); bit b of the output is 1
  * iff the signed sum of (+1 / -1) votes of all token-hash bits b is positive.
  * Near-duplicate texts land within a small Hamming distance, so candidate
  * pairs are found by exact-match on 16-bit bands (pigeonhole: hamming <= 3
  * guarantees one of four bands equal) — an equi-join, not an O(n^2) scan.
  *
  * A custom Expression (not a UDF) keeps nulls/serialization inside Tungsten;
  * eval is a tight loop over UTF8String bytes.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        val lo = Murmur3.hash32(bytes, 0x9747b28c)
        val hi = Murmur3.hash32(bytes, 0x85ebca6b)
        val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** simhash64(tokens: array<string>): bigint as a Column. */
  def simhash64(tokens: Column): Column =
    GraftBridge.toColumn(SimHash64(GraftBridge.toExpression(tokens)))
}

/** Portable 60-bit SimHash: identical arithmetic is expressible in ANSI SQL
  * on any engine with md5(), so the fingerprint (not just derived pair
  * sets) is cross-engine oracle-checkable.
  *
  * Token hash = first 15 hex chars of md5(token) read base-16 (60 bits —
  * both the SQL `conv(substr(md5(w),1,15),16,10)` and a '0x…' cast parse it
  * exactly; 60 < 63 bits so no sign issues). Votes and the sign rule are
  * the same as [[SimHash64]]. Bands are 4 x 15 bits: hamming <= 3 still
  * pigeonholes into at least one exact band match.
  */
case class Md5SimHash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  // MessageDigest is not thread-safe and not serializable; one per
  // executor thread, reset per token
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(arr: ArrayData): Long = {
    val md = mdLocal.get()
    val votes = new Array[Int](60)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // big-endian first 8 digest bytes == first 16 hex chars; drop the
        // 16th hex digit with an unsigned shift -> the 15-hex-char value
        var be = 0L
        var k = 0
        while (k < 8) { be = (be << 8) | (d(k) & 0xffL); k += 1 }
        val h = be >>> 4
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5SimHash", this, classOf[Md5SimHash60].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5SimHash60 =
    copy(child = newChild)
}

object Md5SimHash60 {
  /** md5Simhash60(tokens: array<string>): bigint as a Column. */
  def md5Simhash60(tokens: Column): Column =
    GraftBridge.toColumn(Md5SimHash60(GraftBridge.toExpression(tokens)))
}
