package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass stopword census — the langid scorer's hot loop.
  *
  * [[Text.wordOccurrencesInDoubled]] counts ONE word per call via a
  * regexp_replace length diff over the doubled-spaces text, so the
  * 20-word language-ID census (ta01, and its consumers ta06/cl08/sa13)
  * re-scanned every document 20 times plus the doubling rewrite. This
  * expression tokenizes the string ONCE on single spaces and counts every
  * word of a fixed list in that pass — identical counts by construction:
  * a space-delimited token `w` in text padded-and-doubled is exactly one
  * non-overlapping `" w "` occurrence (doubling is what makes adjacent
  * occurrences disjoint), which is exactly one token equal to `w` here.
  * Parity with the regex form on adversarial input (multi-space, tabs,
  * unicode, empties) is pinned in ExpressionPropertySpec; the DuckDB
  * oracles keep the doubled-regex formulation, so the engine must
  * hash-match it at every SF.
  *
  * Real codegen via the reference-object pattern ([[CharEntropy]]).
  */
case class StopwordCounts(child: Expression, words: Seq[String])
    extends UnaryExpression {
  require(words.nonEmpty && words.forall(w => w.nonEmpty && !w.contains(" ")),
    "stopwords must be nonempty and space-free")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val wordArr: Array[String] = words.toArray

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val counts = new Array[Long](wordArr.length)
    val n = str.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        val len = i - start
        if (len > 0) {
          var j = 0
          while (j < wordArr.length) {
            val w = wordArr(j)
            if (w.length == len && str.regionMatches(start, w, 0, len))
              counts(j) += 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordCounts", this,
      classOf[StopwordCounts].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCounts =
    copy(child = newChild)
}

object StopwordCounts {
  /** stopword_counts(s, words): array<long> — per-word token counts in one
    * pass. Input contract: the column is space-tokenized text (normText
    * output in every consumer); on arbitrary text the counts still equal
    * the doubled-regex form (only exact single-space-delimited tokens
    * count in both). */
  def counts(c: Column, words: Seq[String]): Column =
    GraftBridge.toColumn(StopwordCounts(GraftBridge.toExpression(c), words))
}
