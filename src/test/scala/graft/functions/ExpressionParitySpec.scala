package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.core.Tables

/** Native Catalyst expressions must be bit-identical to the interpreted
  * HOF formulations they replace (the HOF versions are the executable spec
  * that the DuckDB oracles were validated against). */
class ExpressionParitySpec extends AnyFunSuite {

  test("MinHashSig == HOF minhashSignature, element for element") {
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), Text.charShingles(col("text"), 5).as("sh"))
      .withColumn("fast", MinHashSig.minhashSig(col("sh"), 32))
      .withColumn("spec", Text.minhashSignature(col("sh"), 32))
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }

  test("MinHashFromText == MinHashSig over HOF shingles") {
    val df = Tables.documents(spark, sf0001)
      .withColumn("fast", MinHashFromText.minhashFromText(col("text"), 5, 64))
      .withColumn("spec",
        MinHashSig.minhashSig(Text.charShingles(col("text"), 5), 64))
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }

  test("native CharShingles == HOF charShingles, order included") {
    val df = Tables.documents(spark, sf0001)
      .withColumn("fast", CharShingles.charShingles(col("text"), 5))
      .withColumn("spec", Text.charShingles(col("text"), 5))
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }

  test("SigOverlap estimates jaccard within sampling error") {
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        MinHashFromText.minhashFromText(col("text"), 5, 128).as("sig"),
        CharShingles.charShingles(col("text"), 5).as("sh"))
    val a = df.select(col("doc_id").as("da"), col("sig").as("sa"), col("sh").as("ha"))
    val b = df.select(col("doc_id").as("db"), col("sig").as("sb"), col("sh").as("hb"))
    val bad = a.join(b, col("da") < col("db") && col("da") < 30 && col("db") < 30)
      .select(
        SigOverlap.sigOverlap(col("sa"), col("sb")).as("est"),
        Text.jaccard(col("ha"), col("hb")).as("truth"))
      .filter(abs(col("est") - col("truth")) > lit(0.25))
    assert(bad.count() == 0)
  }

  test("CosineSim == HOF cosine, bit for bit") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va")).filter(col("ia") < 40)
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb")).filter(col("ib") < 40)
    val pairs = a.join(b, col("ia") < col("ib"))
      .withColumn("fast", CosineSim.cosineSim(col("va"), col("vb")))
      .withColumn("spec", graft.operators.Similarity.cosineHof(col("va"), col("vb")))
      .filter(col("fast") =!= col("spec"))
    assert(pairs.count() == 0)
  }

  test("TokenNgrams == HOF split/slice/join spec, positions included") {
    val n = 8
    val t = Text.normText(col("text"))
    val tok = split(t, " ")
    val spec = when(size(tok) >= n,
      transform(sequence(lit(0), size(tok) - n),
        i => array_join(slice(tok, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    val df = Tables.documents(spark, sf0001)
      .withColumn("fast", TokenNgrams.tokenNgrams(t, n))
      .withColumn("spec", spec)
      .filter(col("fast") =!= col("spec"))
    assert(df.count() == 0)
  }

  test("SignLshBucket == HOF lshBucket, bit for bit") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("fast", SignLshBucket.signLshBucket(col("v"), 8))
      .withColumn("spec", graft.operators.Similarity.lshBucketHof(col("v"), 8))
      .filter(col("fast") =!= col("spec"))
    assert(e.count() == 0)
  }

  test("SqDist == HOF squared-L2 fold, bit for bit") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va")).filter(col("ia") < 40)
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb")).filter(col("ib") < 40)
    val spec = aggregate(zip_with(col("va"), col("vb"), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, d) => acc + d)
    val pairs = a.join(b, col("ia") < col("ib"))
      .withColumn("fast", SqDist.sqDist(col("va"), col("vb")))
      .withColumn("spec", spec)
      .filter(col("fast") =!= col("spec"))
    assert(pairs.count() == 0)
  }

  test("PqAdc == HOF lookup-sum fold, bit for bit") {
    val k = 16
    // codes: 8 pseudo-random codewords per vector; lut: 128 doubles
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("codes", transform(sequence(lit(0), lit(7)),
        m => pmod(xxhash64(col("vec_id"), m), lit(k)).cast("int")))
      .withColumn("lut", slice(concat(col("v"), col("v")), 1, 8 * k))
    val spec = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(7)).cast("array<int>"),
        (c, m) => element_at(col("lut"), m * k + c + 1)),
      lit(0.0d), (acc, d) => acc + d)
    val bad = e
      .withColumn("fast", PqAdc.pqAdc(col("codes"), col("lut"), k))
      .withColumn("spec", spec)
      .filter(col("fast") =!= col("spec"))
    assert(bad.count() == 0)
  }
}
