package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity of two double arrays as a native Catalyst expression.
  *
  * Same result, bit for bit, as the HOF formulation
  * dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))) with left-to-right summation
  * (which is also how DuckDB's list_sum folds — keeping the DuckDB oracle
  * exact) — but a single primitive loop per pair instead of three
  * interpreted aggregate() lambdas, which is what makes brute-force and
  * LSH-bucketed similarity paths CPU-bound instead of boxing-bound.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toDoubleArray()
    val b = r.asInstanceOf[ArrayData].toDoubleArray()
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
    java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** cosine_sim(a: array<double>, b: array<double>): double */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.toColumn(CosineSim(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
