package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word/sentence/syllable census for the Flesch reading-ease
  * gate (ta21) — the [[StopwordCounts]] "N scans → 1 tokenize" pattern
  * applied to the readability censuses.
  *
  * The regex formulation (kept verbatim in the DuckDB oracle and as the
  * executable parity spec) runs `regexp_count(w, "[aeiouy]+")` once per
  * TOKEN via a non-codegen `aggregate` lambda plus a document-level
  * `regexp_count(t, "[.!?]+")` and a `split` — a regex-engine call per
  * word, which scales badly with document length. This expression walks
  * the normalized text once and returns the identical integers:
  *
  *   - n_words      = size(split(t, " ")) = (count of ' ') + 1 — split
  *                    keeps empty tokens, so every space adds a token
  *                    whatever surrounds it (normText makes empties
  *                    impossible in practice; parity holds regardless);
  *   - n_sent_runs  = regexp_count(t, "[.!?]+") = maximal runs of
  *                    sentence-final punctuation (RAW — the query applies
  *                    the min-1 floor, exactly like the regex form);
  *   - n_syllables  = Σ per token of max(1, maximal `[aeiouy]+` runs in
  *                    the token) — empty tokens contribute 1, matching
  *                    the aggregate-over-split semantics.
  *
  * Parity with the regex formulation on adversarial input is pinned in
  * ExpressionPropertySpec; the oracle keeps the regex form, so the engine
  * must hash-match it at every SF. Real codegen via the reference-object
  * pattern ([[StopwordCounts]]). */
case class FleschCensus(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_sent_runs", LongType, nullable = false),
    StructField("n_syllables", LongType, nullable = false)))

  def compute(input: UTF8String): InternalRow = {
    val s = input.toString
    val n = s.length
    var words = 1L
    var sentRuns = 0L
    var syllables = 0L
    var inSentRun = false
    var tokenVowelRuns = 0L
    var inVowelRun = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ') {
        // token boundary: close the current token's syllable census
        syllables += math.max(1L, tokenVowelRuns)
        tokenVowelRuns = 0L
        inVowelRun = false
        words += 1L
        inSentRun = false
      } else {
        val isSent = c == '.' || c == '!' || c == '?'
        if (isSent && !inSentRun) sentRuns += 1L
        inSentRun = isSent
        val isVowel = c == 'a' || c == 'e' || c == 'i' || c == 'o' ||
          c == 'u' || c == 'y'
        if (isVowel && !inVowelRun) tokenVowelRuns += 1L
        inVowelRun = isVowel
      }
      i += 1
    }
    syllables += math.max(1L, tokenVowelRuns) // final token (maybe empty)
    new GenericInternalRow(Array[Any](words, sentRuns, syllables))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fleschCensus", this,
      classOf[FleschCensus].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): FleschCensus =
    copy(child = newChild)
}

object FleschCensus {
  /** flesch_census(t): struct(n_words, n_sent_runs, n_syllables) in one
    * scan. Hoist into its own projection (the ta01 `swc` discipline) so
    * multi-field consumers evaluate it once. */
  def census(c: Column): Column =
    GraftBridge.toColumn(FleschCensus(GraftBridge.toExpression(c)))
}

/** One-call PII scan for ta15 — counts, card matches and the sequential
  * redaction in a single expression call instead of nine regex-engine
  * passes (4 × regexp_extract_all + 4 chained regexp_replace + the Luhn
  * filter's re-extraction).
  *
  * The four patterns are hand-rolled deterministic matchers that
  * reproduce `java.util.regex` leftmost-first `find()` semantics for
  * exactly these regexes (greedy quantifiers over disjoint character
  * classes make backtracking degenerate, so each matcher is a linear
  * scan — the derivations are inline below). Parity with the regex
  * formulation on adversarial input is pinned in ExpressionPropertySpec;
  * the DuckDB oracle keeps the regex form.
  *
  * Output struct:
  *   - n_emails / n_phones / n_ips: independent match counts over the
  *     input (exactly `size(regexp_extract_all(t, re))`);
  *   - cards: the card-shaped matches themselves, in order (the query
  *     Luhn-filters them, same as `regexp_extract_all`);
  *   - redacted: the SEQUENTIAL redaction — email then phone then ip
  *     then card, each pass matching against the previous pass's output,
  *     byte-identical to the chained `regexp_replace` contract.
  */
case class PiiScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("cards", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("redacted", StringType, nullable = false)))

  import PiiScan._

  def compute(input: UTF8String): InternalRow = {
    val t = input.toString
    val emailSp = emailSpans(t)
    val phoneSp = phoneSpans(t)
    val ipSp = ipSpans(t)
    val cardSp = cardSpans(t)
    val cards = new Array[AnyRef](cardSp.length)
    var i = 0
    while (i < cardSp.length) {
      cards(i) = UTF8String.fromString(t.substring(cardSp(i)._1, cardSp(i)._2))
      i += 1
    }
    // sequential redaction: each pass re-matches the previous pass's
    // output (replacement tokens are uppercase/brackets, but boundary
    // effects around a removed span can still create or destroy matches —
    // the chained-regexp_replace contract is re-matching, so we re-match)
    val r1 = replaceSpans(t, emailSp, "[EMAIL]")
    val r2 = replaceSpans(r1, if (emailSp.isEmpty) phoneSp else phoneSpans(r1), "[PHONE]")
    val r3 = replaceSpans(r2, if (emailSp.isEmpty && phoneSp.isEmpty) ipSp else ipSpans(r2), "[IP]")
    val changed = emailSp.nonEmpty || phoneSp.nonEmpty || ipSp.nonEmpty
    val r4 = replaceSpans(r3, if (!changed) cardSp else cardSpans(r3), "[CARD]")
    new GenericInternalRow(Array[Any](
      emailSp.length.toLong, phoneSp.length.toLong, ipSp.length.toLong,
      new GenericArrayData(cards), UTF8String.fromString(r4)))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("piiScan", this, classOf[PiiScan].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiScan =
    copy(child = newChild)
}

object PiiScan {

  def scan(c: Column): Column =
    GraftBridge.toColumn(PiiScan(GraftBridge.toExpression(c)))

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
  @inline private def isAlpha(c: Char): Boolean = c >= 'a' && c <= 'z'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** `[a-z0-9]+@[a-z]+\.[a-z]+`. Each `+` is greedy over a class disjoint
    * from its follow character, so backtracking it always lands the next
    * char back inside the class and fails: a stage either succeeds on the
    * maximal run or fails for every shorter length. Failure at a start
    * inside the local-part run [p,q) reproduces the same failure (same
    * maximal run end q), so the scan may skip to q+1 — linear time,
    * identical matches to `Matcher.find()`. */
  private[functions] def emailSpans(s: String): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    val n = s.length
    var i = 0
    while (i < n) {
      if (!isAlnum(s.charAt(i))) i += 1
      else {
        var q = i
        while (q < n && isAlnum(s.charAt(q))) q += 1
        if (q < n && s.charAt(q) == '@') {
          var r = q + 1
          while (r < n && isAlpha(s.charAt(r))) r += 1
          if (r > q + 1 && r < n && s.charAt(r) == '.') {
            var e = r + 1
            while (e < n && isAlpha(s.charAt(e))) e += 1
            if (e > r + 1) { out += ((i, e)); i = e }
            else i = q + 1
          } else i = q + 1
        } else i = q // s(q) non-alnum and not '@': every start in [i,q) fails
      }
    }
    out.result()
  }

  /** `555-[0-9]{4}` — fixed shape, naive leftmost scan. */
  private[functions] def phoneSpans(s: String): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    val n = s.length
    var i = 0
    while (i + 8 <= n) {
      if (s.charAt(i) == '5' && s.charAt(i + 1) == '5' && s.charAt(i + 2) == '5' &&
          s.charAt(i + 3) == '-' && isDigit(s.charAt(i + 4)) && isDigit(s.charAt(i + 5)) &&
          isDigit(s.charAt(i + 6)) && isDigit(s.charAt(i + 7))) {
        out += ((i, i + 8)); i += 8
      } else i += 1
    }
    out.result()
  }

  /** `[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}`. A non-final octet's
    * greedy `{1,3}` succeeds only on its FULL digit run (shortening lands
    * on a digit, never the required '.'), so each octet is deterministic:
    * run length 1–3 followed by '.'; a ≥4-digit run fails the start. The
    * final octet greedily takes min(3, run). Start positions advance by 1
    * on failure, exactly like `find()`. */
  private[functions] def ipSpans(s: String): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    val n = s.length
    var i = 0
    while (i < n) {
      if (!isDigit(s.charAt(i))) i += 1
      else {
        val end = ipMatchEnd(s, i, n)
        if (end > 0) { out += ((i, end)); i = end } else i += 1
      }
    }
    out.result()
  }

  private def ipMatchEnd(s: String, start: Int, n: Int): Int = {
    var pos = start
    var k = 0
    while (k < 3) {
      var l = 0
      while (l < 4 && pos + l < n && isDigit(s.charAt(pos + l))) l += 1
      if (l == 0 || l > 3 || pos + l >= n || s.charAt(pos + l) != '.') return -1
      pos += l + 1
      k += 1
    }
    var l = 0
    while (l < 3 && pos + l < n && isDigit(s.charAt(pos + l))) l += 1
    if (l == 0) -1 else pos + l
  }

  /** `4[0-9]{15}` — fixed length 16, naive leftmost scan. */
  private[functions] def cardSpans(s: String): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    val n = s.length
    var i = 0
    while (i + 16 <= n) {
      if (s.charAt(i) == '4' && allDigits(s, i + 1, i + 16)) {
        out += ((i, i + 16)); i += 16
      } else i += 1
    }
    out.result()
  }

  @inline private def allDigits(s: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) { if (!isDigit(s.charAt(i))) return false; i += 1 }
    true
  }

  private[functions] def replaceSpans(s: String, spans: Vector[(Int, Int)],
      token: String): String = {
    if (spans.isEmpty) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var prev = 0
      spans.foreach { case (a, b) =>
        sb.append(s, prev, a).append(token); prev = b
      }
      sb.append(s, prev, s.length).toString
    }
  }
}
