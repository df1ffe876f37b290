package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV merge-and-recut counts as a native Catalyst expression.
  *
  * Inputs: two SORTED, duplicate-free long arrays (bottom-k sketches).
  * Output: array<bigint> of [m, inter] where m = |bottom-k of A ∪ B| and
  * inter = how many of those m union values appear in BOTH sketches —
  * the two integers the KMV Jaccard estimator Ĵ = inter / m needs
  * (Beyer et al. SIGMOD'07).
  *
  * Semantically identical to the HOF composition
  * `slice(array_sort(array_union(a, b)), 1, k)` + a contains-filter, but
  * those lambdas are CodegenFallback — interpreted per ROW with array
  * allocations and an O(k log k) sort — which measured 49 s at sf0.1 /
  * 632 s at the 100× rehearsal on dd22's pair stream. This expression is
  * one allocation-free two-pointer walk over the sorted inputs: O(k)
  * primitive compares per pair, the [[MinHashSig]] lesson applied to the
  * sketch-merge side. */
case class KmvMergeCounts(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var taken = 0; var inter = 0
    while (taken < k && (i < na || j < nb)) {
      if (j >= nb || (i < na && a.getLong(i) < b.getLong(j))) i += 1
      else if (i >= na || b.getLong(j) < a.getLong(i)) j += 1
      else { inter += 1; i += 1; j += 1 }
      taken += 1
    }
    new GenericArrayData(Array(taken.toLong, inter.toLong))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kmvMergeCounts", this,
      classOf[KmvMergeCounts].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvMergeCounts =
    copy(left = newLeft, right = newRight)
}

object KmvMergeCounts {
  /** kmv_merge_counts(a: array<bigint>, b: array<bigint>, k) → [m, inter]. */
  def kmvMergeCounts(a: Column, b: Column, k: Int): Column =
    GraftBridge.toColumn(KmvMergeCounts(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b), k))
}
