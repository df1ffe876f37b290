package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-census expressions behind ta19 (char entropy).
  *
  * The HOF formulation in
  * [[graft.operators.TextAnalysis.charEntropyHof]] — build the char array,
  * distinct it, sort it, fold p·ln(p) per distinct char with
  * p = size(filter(chars, = c))/len — is O(distinct x len) INTERPRETED
  * lambda calls per row (~16 s for 500 docs at sf0.01: boxing-bound, and
  * hopeless at corpus scale). These expressions compute the identical
  * values in ONE primitive pass per row (a TreeMap census, then a fold in
  * ascending char order — the same left-to-right sequence as the HOF's
  * sorted-distinct fold and the oracle's `list_transform(list_sort(...))`,
  * so all three agree bit-for-bit; ascending java.lang.String order equals
  * UTF-8 binary order on this ASCII corpus, the documented mm07-style
  * fixture contract). Real codegen via the [[CosineSim]] reference-object
  * pattern; parity with the HOF spec is pinned in Round8bOpsSpec.
  */
private[functions] object CharCensus {
  /** Sorted (char, count) census of a string — one pass + TreeMap. */
  def census(s: UTF8String): java.util.TreeMap[String, Array[Int]] = {
    val str = s.toString
    val counts = new java.util.TreeMap[String, Array[Int]]()
    var i = 0
    while (i < str.length) {
      val c = String.valueOf(str.charAt(i))
      val slot = counts.get(c)
      if (slot == null) counts.put(c, Array(1)) else slot(0) += 1
      i += 1
    }
    counts
  }
}

/** -H aggregand: Σ_c p_c·ln(p_c) over the sorted distinct chars (NEGATIVE
  * entropy — callers negate, mirroring the HOF spec's fold-then-negate). */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  def compute(s: UTF8String): Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0.0
    val counts = CharCensus.census(s)
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      // same op sequence as the HOF term: int/int division (via doubles),
      // one ln, one multiply, left-to-right accumulation in char order
      val p = it.next()(0).toDouble / len.toDouble
      h += p * math.log(p)
    }
    h
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** char_entropy_neg(s): double — the Σ p·ln(p) fold (negate for H). */
  def charEntropyNeg(c: Column): Column =
    GraftBridge.toColumn(CharEntropy(GraftBridge.toExpression(c)))
}

/** Number of distinct characters in a string (the census cardinality). */
case class CharDistinctCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  def compute(s: UTF8String): Long = CharCensus.census(s).size.toLong

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charDistinct", this, classOf[CharDistinctCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharDistinctCount =
    copy(child = newChild)
}

object CharDistinctCount {
  /** char_distinct_count(s): long */
  def charDistinctCount(c: Column): Column =
    GraftBridge.toColumn(CharDistinctCount(GraftBridge.toExpression(c)))
}
