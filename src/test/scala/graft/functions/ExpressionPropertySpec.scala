package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

/** Property tests: native expressions vs their HOF executable specs on
  * ADVERSARIAL generated input (empty strings, unicode, repeated chars,
  * huge tokens) — the corpus-based parity tests only see well-formed ASCII
  * word soup. Inputs are generated with a fixed seed so failures replay. */
class ExpressionPropertySpec extends AnyFunSuite {
  import spark.implicits._

  private def samples(g: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val nastyText: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.const(" "),
    Gen.const("    "),
    Gen.asciiPrintableStr,
    Gen.alphaNumStr,
    Gen.listOf(Gen.oneOf('a', ' ', 'é', '中', '\ud83d', 'x')).map(_.mkString),
    Gen.choose(1, 200).flatMap(k => Gen.const("ab " * k)),
    Gen.identifier.map(s => s + " " + s + " " + s))

  test("CharShingles == HOF spec on adversarial strings") {
    val df = samples(nastyText, 300).toDF("text")
      .withColumn("fast", CharShingles.charShingles(col("text"), 5))
      .withColumn("spec", Text.charShingles(col("text"), 5))
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }

  test("TokenNgrams == split/slice spec on adversarial strings") {
    // TokenNgrams contract: input is already normalized (single spaces);
    // normalize the generated text first, as every caller does
    val df = samples(nastyText, 300).toDF("raw")
      .select(Text.normText(col("raw")).as("text"))
      .withColumn("fast", TokenNgrams.tokenNgrams(col("text"), 3))
      .withColumn("spec", {
        val w = split(col("text"), " ")
        val n = 3
        filter(
          transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
            i => when(i + n <= size(w), concat_ws(" ", slice(w, i + lit(1), lit(n))))),
          x => x.isNotNull)
      })
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }

  test("StopwordCounts == doubled-regex spec on adversarial strings (raw AND normalized)") {
    // words cover: plain stopwords, regex metachars (\Q-quoted in the
    // spec), a unicode word, a word that is a prefix of another
    val words = Seq("the", "a", "ab", "a.c", "é中", "ab ".trim)
    def check(textCol: org.apache.spark.sql.Column, df: org.apache.spark.sql.DataFrame): Unit = {
      val fast = StopwordCounts.counts(textCol, words.distinct)
      val spec = array(words.distinct.map(w =>
        Text.wordOccurrencesInDoubled(Text.doubledSpaces(textCol), w)): _*)
      val bad = df.withColumn("fast", fast).withColumn("spec", spec)
        .filter(col("fast") =!= col("spec"))
      assert(bad.count() == 0, bad.limit(3).collect().mkString("\n"))
    }
    val raw = samples(nastyText, 300).toDF("text")
    check(col("text"), raw) // parity holds on ARBITRARY text...
    check(Text.normText(col("text")), raw) // ...and on the caller contract
  }

  test("TokenNgramsMulti == concat(transform(TokenNgrams)) spec on adversarial strings") {
    // the exact formulation ta09 used before the one-pass expression:
    // per-size native ngrams (themselves parity-tested above), tagged and
    // concatenated in size order
    val sizes = Seq(2, 3)
    val df = samples(nastyText, 300).toDF("raw")
      .select(Text.normText(col("raw")).as("text"))
      .withColumn("fast", TokenNgramsMulti.tokenNgramsMulti(col("text"), sizes))
      .withColumn("spec", concat(sizes.map(n => transform(
        TokenNgrams.tokenNgrams(col("text"), n),
        g => struct(lit(n).as("gn"), g.as("gram")))): _*))
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0, df.limit(3).collect().mkString("\n"))
  }

  test("FleschCensus == split/regexp spec on adversarial strings (raw AND normalized)") {
    def check(textCol: org.apache.spark.sql.Column, df: org.apache.spark.sql.DataFrame): Unit = {
      val w = split(textCol, " ")
      val fast = FleschCensus.census(textCol)
      val spec = struct(
        size(w).cast("long").as("n_words"),
        regexp_count(textCol, lit("[.!?]+")).cast("long").as("n_sent_runs"),
        aggregate(w, lit(0L),
          (acc, t) => acc + greatest(lit(1), regexp_count(t, lit("[aeiouy]+"))))
          .as("n_syllables"))
      val bad = df.withColumn("fast", fast).withColumn("spec", spec)
        .filter(col("fast") =!= col("spec"))
      assert(bad.count() == 0, bad.limit(3).collect().mkString("\n"))
    }
    // vowel/punctuation-heavy generator on top of the shared nasty pool
    val senty: Gen[String] = Gen.oneOf(
      nastyText,
      Gen.listOf(Gen.oneOf('a', 'e', 'y', 'b', '.', '!', '?', ' ', 'z'))
        .map(_.mkString),
      Gen.const("one. two! three?? mixed!?. y aa.ee"))
    val raw = samples(senty, 400).toDF("text")
    check(col("text"), raw) // parity holds on ARBITRARY text...
    check(Text.normText(col("text")), raw) // ...and on the caller contract
  }

  test("PiiScan == regexp_extract_all/regexp_replace spec on adversarial strings") {
    val EmailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val PhoneRe = "555-[0-9]{4}"
    val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val CardRe = "4[0-9]{15}"
    def hits(re: String) = regexp_extract_all(col("text"), lit(re), lit(0))
    // PII-shaped fragments glued adversarially: truncated/overlapping
    // emails, digit runs straddling octet limits, cards touching emails,
    // back-to-back phones — the corner cases where hand-rolled matcher
    // semantics could drift from java.util.regex
    val frag: Gen[String] = Gen.oneOf(
      Gen.const("u3@ex.com"), Gen.const("@ex."), Gen.const("a@b.c"),
      Gen.const("a@b@c.d"), Gen.const("555-1234"), Gen.const("555-12"),
      Gen.const("555-555-1234"), Gen.const("1.2.3.4"), Gen.const("1234.5.6.7"),
      Gen.const("1.2.3.45678"), Gen.const("..."), Gen.const("9"),
      Gen.const("4111111111111111"), Gen.const("44111111111111111111"),
      Gen.const("4111111111111111@a.b"), Gen.const("x4@y.z4111111111111111"),
      Gen.const(" "), Gen.const("."), Gen.const("-"), Gen.const("@"),
      Gen.alphaNumStr.map(_.toLowerCase), Gen.numStr)
    val pii: Gen[String] = Gen.listOf(frag).map(_.mkString)
    val df = samples(pii, 500).toDF("text")
      .withColumn("p", PiiScan.scan(col("text")))
      .withColumn("spec_counts", struct(
        size(hits(EmailRe)).cast("long"), size(hits(PhoneRe)).cast("long"),
        size(hits(Ipv4Re)).cast("long")))
      .withColumn("fast_counts", struct(
        col("p.n_emails"), col("p.n_phones"), col("p.n_ips")))
      .withColumn("spec_cards", hits(CardRe))
      .withColumn("spec_red", regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(col("text"), EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]"),
        Ipv4Re, "[IP]"), CardRe, "[CARD]"))
      .filter(col("fast_counts") =!= col("spec_counts") ||
        col("p.cards") =!= col("spec_cards") ||
        col("p.redacted") =!= col("spec_red"))
    assert(df.count() == 0,
      df.select("text", "p", "spec_counts", "spec_cards", "spec_red")
        .limit(3).collect().mkString("\n"))
  }

  test("MinHashFromText is deterministic and shingle-consistent on nasty input") {
    val df = samples(nastyText, 200).toDF("text")
      .withColumn("fast", MinHashFromText.minhashFromText(col("text"), 5, 32))
      .withColumn("spec", MinHashSig.minhashSig(Text.charShingles(col("text"), 5), 32))
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }

  test("SignLshBucket == HOF bucket on random vectors incl. zeros/negatives") {
    val vecs: Seq[Seq[Double]] = (0 until 200).map { i =>
      val g = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3))
      g.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Seq.fill(16)(0.0))
    } :+ Seq.fill(16)(0.0)
    val df = vecs.toDF("v")
      .withColumn("fast", graft.operators.Similarity.lshBucket(col("v"), 6))
      .withColumn("spec", graft.operators.Similarity.lshBucketHof(col("v"), 6))
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }

  test("CosineSim == HOF cosine on random vectors, bit for bit") {
    val vecs: Seq[(Seq[Double], Seq[Double])] = (0 until 200).map { i =>
      val g = Gen.listOfN(12, Gen.chooseNum(-100.0, 100.0).suchThat(_ != 0.0))
      (g.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Seq.fill(12)(1.0)),
        g.apply(Gen.Parameters.default, Seed(i.toLong + 10000)).getOrElse(Seq.fill(12)(1.0)))
    }
    val df = vecs.toDF("a", "b")
      .withColumn("fast", graft.operators.Similarity.cosine(col("a"), col("b")))
      .withColumn("spec", graft.operators.Similarity.cosineHof(col("a"), col("b")))
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }

  test("SqDist == HOF fold on random vectors incl. zeros and empties") {
    val vecs: Seq[(Seq[Double], Seq[Double])] = ((0 until 200).map { i =>
      val g = Gen.listOfN(9, Gen.chooseNum(-1e6, 1e6))
      (g.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Seq.fill(9)(0.0)),
        g.apply(Gen.Parameters.default, Seed(i.toLong + 5000)).getOrElse(Seq.fill(9)(0.0)))
    }) :+ ((Seq.empty[Double], Seq.empty[Double])) :+ ((Seq.fill(9)(0.0), Seq.fill(9)(0.0)))
    val spec = aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, d) => acc + d)
    val df = vecs.toDF("a", "b")
      .withColumn("fast", SqDist.sqDist(col("a"), col("b")))
      .withColumn("spec", spec)
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }

  test("PqAdc == lookup-sum fold on random codes/LUTs incl. empty codes") {
    val k = 16
    val rows: Seq[(Seq[Int], Seq[Double])] = ((0 until 200).map { i =>
      val gc = Gen.listOfN(8, Gen.choose(0, k - 1))
      val gl = Gen.listOfN(8 * k, Gen.chooseNum(-1e3, 1e3))
      (gc.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Seq.fill(8)(0)),
        gl.apply(Gen.Parameters.default, Seed(i.toLong + 7000)).getOrElse(Seq.fill(8 * k)(0.0)))
    }) :+ ((Seq.empty[Int], Seq.fill(8 * k)(1.0)))
    val spec = aggregate(
      zip_with(col("codes"),
        sequence(lit(0), size(col("codes")) - 1).cast("array<int>"),
        (c, m) => element_at(col("lut"), m * k + c + 1)),
      lit(0.0d), (acc, d) => acc + d)
    val df = rows.toDF("codes", "lut")
      .withColumn("fast", PqAdc.pqAdc(col("codes"), col("lut"), k))
      .withColumn("spec", coalesce(spec, lit(0.0d))) // empty fold => seed
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }
}
