package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** All consecutive token n-grams of a single-space-normalized text, one
  * entry per POSITION (not deduplicated — span positions are what the
  * repeated-span statistics count), as a native Catalyst expression.
  *
  * Equivalent by construction to splitting on ' ' and joining each n-token
  * window back with ' ' (the executable HOF spec cross-checked in
  * ExpressionParitySpec, and the DuckDB oracle's
  * array_to_string(w[i:i+n-1], ' ') formulation) — but emitted as direct
  * substrings between token boundaries: one scan for the boundaries, zero
  * per-window array materialization. A text with fewer than n tokens yields
  * an empty array. */
case class TokenNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val s = input.toString
    // token start offsets (tokens are single-space separated after normText)
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    starts += 0
    var idx = s.indexOf(' ')
    while (idx >= 0) { starts += idx + 1; idx = s.indexOf(' ', idx + 1) }
    val nTok = starts.length
    val m = nTok - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[AnyRef])
    else {
      val out = new Array[AnyRef](m)
      var i = 0
      while (i < m) {
        val from = starts(i)
        val until = if (i + n < nTok) starts(i + n) - 1 else s.length
        out(i) = org.apache.spark.unsafe.types.UTF8String
          .fromString(s.substring(from, until))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenNgrams", this, classOf[TokenNgrams].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

object TokenNgrams {
  def tokenNgrams(text: Column, n: Int): Column =
    GraftBridge.toColumn(TokenNgrams(GraftBridge.toExpression(text), n))
}

/** All consecutive token n-grams for SEVERAL sizes in one boundary scan,
  * each tagged with its size — the ta09 shape, which previously tokenized
  * the text once per gram size and then re-wrapped each array with a
  * `transform`+`concat` pair of HOF allocations. Emission order is all
  * grams of `ns(0)` positionally, then `ns(1)`, … — exactly the
  * `concat(transform(ngrams(n1), tag), transform(ngrams(n2), tag))`
  * formulation it replaces (parity pinned in ExpressionPropertySpec; the
  * consumer aggregates by gram so order cannot matter anyway). */
case class TokenNgramsMulti(child: Expression, ns: Seq[Int])
    extends UnaryExpression {

  require(ns.nonEmpty && ns.forall(_ >= 1), s"n-gram sizes must be >= 1, got $ns")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("gn",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("gram", StringType,
        nullable = false))),
    containsNull = false)

  @transient private lazy val sizes: Array[Int] = ns.toArray

  def compute(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val s = input.toString
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    starts += 0
    var idx = s.indexOf(' ')
    while (idx >= 0) { starts += idx + 1; idx = s.indexOf(' ', idx + 1) }
    val nTok = starts.length
    var total = 0
    var k = 0
    while (k < sizes.length) {
      val m = nTok - sizes(k) + 1
      if (m > 0) total += m
      k += 1
    }
    val out = new Array[AnyRef](total)
    var o = 0
    k = 0
    while (k < sizes.length) {
      val n = sizes(k)
      val m = nTok - n + 1
      var i = 0
      while (i < m) {
        val from = starts(i)
        val until = if (i + n < nTok) starts(i + n) - 1 else s.length
        out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](n, org.apache.spark.unsafe.types.UTF8String
            .fromString(s.substring(from, until))))
        o += 1
        i += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenNgramsMulti", this,
      classOf[TokenNgramsMulti].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenNgramsMulti =
    copy(child = newChild)
}

object TokenNgramsMulti {
  def tokenNgramsMulti(text: Column, ns: Seq[Int]): Column =
    GraftBridge.toColumn(TokenNgramsMulti(GraftBridge.toExpression(text), ns))
}
