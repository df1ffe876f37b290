package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column builders (SURVEY.md §2.11 extension surface).
  *
  * Everything here composes built-in, codegen'd Catalyst functions — no UDFs,
  * no Python — so whole-stage codegen spans the full pipeline and the same
  * expressions run unchanged on a 1000-executor cluster.
  *
  * All hash arithmetic is done mod the Mersenne prime 2^31-1 so it can never
  * overflow a long — Spark 4 runs ANSI mode by default, where silent wrap
  * would instead throw ARITHMETIC_OVERFLOW mid-query.
  */
object Text {

  /** Canonical normalization: lowercase, collapse whitespace runs, trim. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Character n-gram shingles (distinct), 1-based substring semantics.
    * A text shorter than n yields a single (short) shingle. */
  def charShingles(c: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
        i => substring_index_safe(c, i, n)))

  private def substring_index_safe(c: Column, pos: Column, n: Int): Column =
    c.substr(pos, lit(n))

  /** Exact Jaccard similarity of two pre-distinct shingle arrays.
    * Pure integer set sizes + one IEEE division => bit-stable across engines. */
  def jaccard(a: Column, b: Column): Column =
    jaccardWithSizes(a, b, size(a), size(b))

  /** Jaccard with pre-computed array sizes (compute them BEFORE a pair join
    * so the per-pair work is a single array_intersect, not three passes). */
  def jaccardWithSizes(a: Column, b: Column, na: Column, nb: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (na + nb - inter)
  }

  private val P: Long = 2147483647L // 2^31 - 1, Mersenne prime

  /** Base shingle hash in [0, P): xxhash64 folded into the prime field. */
  def baseHash(shingle: Column): Column = pmod(xxhash64(shingle), lit(P))

  /** MinHash signature: k universal hashes h_j(x) = (a_j*x + b_j) mod P over
    * the base-hashed shingle set, each minimized. a_j odd and < 2^10 keeps
    * a_j * x < 2^41 — overflow-free under ANSI mode. */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val bases = transform(shingles, s => baseHash(s))
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(bases, x =>
        pmod((j * 2 + 1) * x + j * lit(40503L), lit(P)))))
  }

  /** LSH band hashes: split a k-length signature into `bands` bands and hash
    * each slice (band index is salted in so buckets never collide across
    * bands). Returns array<struct<band:int, bh:bigint>> ready to explode. */
  def lshBands(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.cast("int").as("band"),
        xxhash64(b, slice(sig, b * rows + lit(1), lit(rows))).as("bh")))
  }

  /** Whitespace token count via pure length arithmetic (parity-exact with any
    * engine: no regex/split edge semantics involved). Assumes normalized
    * single-space text; empty text counts 0 tokens. */
  def tokenCount(c: Column): Column =
    when(length(c) === 0, lit(0L))
      .otherwise((length(c) - length(regexp_replace(c, " ", "")) + 1).cast("long"))

  /** Occurrences of a literal word with delimiters, via replace-length math.
    *
    * Every space is doubled first so adjacent occurrences ("the the") do not
    * share a delimiter — a plain non-overlapping replace then counts each
    * occurrence exactly once. The word is regex-quoted (\Q...\E, supported
    * identically by java.util.regex and RE2/DuckDB), keeping the "literal
    * word" contract for metacharacter-bearing words. */
  def wordOccurrences(c: Column, word: String): Column =
    wordOccurrencesInDoubled(doubledSpaces(c), word)

  /** The space-doubled padded form — compute ONCE per row and share across
    * many [[wordOccurrencesInDoubled]] calls (each inlined copy would redo
    * the doubling regex). */
  def doubledSpaces(c: Column): Column =
    regexp_replace(concat(lit(" "), c, lit(" ")), " ", "  ")

  def wordOccurrencesInDoubled(doubled: Column, word: String): Column = {
    val needle = " \\Q" + word + "\\E "
    ((length(doubled) - length(regexp_replace(doubled, needle, "")))
      / (word.length + 2)).cast("long")
  }
}
