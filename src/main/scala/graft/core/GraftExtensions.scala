package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions plug-in: the zero-code-change way to get graft's
  * native expressions into every session of a deployment —
  *
  *   spark-submit --conf spark.sql.extensions=graft.core.GraftExtensions ...
  *
  * Injects the same function surface as [[GraftSession.registerFunctions]]
  * (which remains the per-session programmatic form), but at session build
  * time and visible to plain SQL clients (thriftserver, notebooks) that
  * never touch the Scala API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  private def fn(name: String, usage: String, cls: Class[_])(
      builder: Seq[Expression] => Expression): (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) =
    // full constructor (className, db, name, usage, ...): the 3-arg form is
    // (className, db, name) and would record the usage text as the NAME,
    // corrupting DESCRIBE FUNCTION metadata for every injected function.
    (new FunctionIdentifier(name),
      new ExpressionInfo(cls.getName, null, name, usage,
        "", "", "", "", "", "", ""),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_minhash",
      "graft_minhash(text, n, k) - k-entry MinHash signature of n-gram shingles",
      classOf[MinHashFromText]) {
      e => MinHashFromText(e(0), intLit(e(1)), intLit(e(2))) })
    ext.injectFunction(fn("graft_shingles",
      "graft_shingles(text, n) - distinct character n-gram shingles",
      classOf[CharShingles]) {
      e => CharShingles(e(0), intLit(e(1))) })
    ext.injectFunction(fn("graft_sig_overlap",
      "graft_sig_overlap(a, b) - MinHash signature overlap estimate",
      classOf[SigOverlap]) {
      e => SigOverlap(e(0), e(1)) })
    ext.injectFunction(fn("graft_simhash64",
      "graft_simhash64(tokens) - 64-bit SimHash of a token array",
      classOf[SimHash64]) {
      e => SimHash64(e(0)) })
    ext.injectFunction(fn("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two double arrays",
      classOf[CosineSim]) {
      e => CosineSim(e(0), e(1)) })
    ext.injectFunction(fn("graft_sq_dist",
      "graft_sq_dist(a, b) - squared L2 distance of two double arrays",
      classOf[SqDist]) {
      e => SqDist(e(0), e(1)) })
    ext.injectFunction(fn("graft_pq_adc",
      "graft_pq_adc(codes, lut, k) - PQ asymmetric-distance lookup sum",
      classOf[PqAdc]) {
      e => PqAdc(e(0), e(1), intLit(e(2))) })
    ext.injectFunction(fn("graft_lsh_bucket",
      "graft_lsh_bucket(v, planes) - sign-LSH bucket id of a double array",
      classOf[SignLshBucket]) {
      e => SignLshBucket(e(0), intLit(e(1))) })
    ext.injectFunction(fn("graft_token_ngrams",
      "graft_token_ngrams(text, n) - positional token n-grams",
      classOf[TokenNgrams]) {
      e => TokenNgrams(e(0), intLit(e(1))) })
  }
}
