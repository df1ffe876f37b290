package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The native expressions ship real doGenCode (not CodegenFallback): this
  * spec COMPILES each one through janino (GenerateMutableProjection — the
  * same generator whole-stage codegen rides on) and pins compiled output ==
  * interpreted eval, including null propagation. A codegen template that
  * fails to compile or diverges from eval fails here, not in a query. */
class CodegenParitySpec extends AnyFunSuite {

  private def run(expr: Expression, rows: Seq[InternalRow]): Unit = {
    val compiled = GenerateMutableProjection.generate(Seq(expr))
    val toScala = CatalystTypeConverters.createToScalaConverter(expr.dataType)
    // Array[Byte] (BinaryType) compares by reference under ==; normalize to
    // a Seq so binary-valued expressions get VALUE equality like the rest
    def norm(v: Any): Any = v match {
      case b: Array[Byte] => b.toSeq
      case other          => other
    }
    rows.foreach { row =>
      val c = norm(toScala(compiled(row).get(0, expr.dataType)))
      val i = norm(toScala(expr.eval(row)))
      assert(c == i, s"compiled $c != interpreted $i for input $row")
    }
  }

  private def row(v: Any): InternalRow = new GenericInternalRow(Array[Any](v))
  private def row2(a: Any, b: Any): InternalRow = new GenericInternalRow(Array[Any](a, b))

  private val dArr  = ArrayType(DoubleType)
  private val lArr  = ArrayType(LongType)
  private val iArr  = ArrayType(IntegerType)
  private val sArr  = ArrayType(StringType)

  private def darr(xs: Double*) = new GenericArrayData(xs.toArray)
  private def larr(xs: Long*)   = new GenericArrayData(xs.toArray)
  private def iarr(xs: Int*)    = new GenericArrayData(xs.toArray)
  private def sarr(xs: String*) = new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  private val in0 = BoundReference(0, dArr, nullable = true)

  test("CosineSim / SqDist compiled == interpreted (incl. zero-norm and null)") {
    val a = BoundReference(0, dArr, nullable = true)
    val b = BoundReference(1, dArr, nullable = true)
    val rows = Seq(
      row2(darr(1.0, 2.0, 3.0), darr(4.0, -5.0, 6.0)),
      row2(darr(0.0, 0.0), darr(1.0, 2.0)), // zero-norm guard
      row2(null, darr(1.0)), row2(darr(1.0), null))
    run(CosineSim(a, b), rows)
    run(SqDist(a, b), rows)
    run(DotProduct(a, b), rows)
  }

  test("PqAdc compiled == interpreted") {
    val codes = BoundReference(0, iArr, nullable = true)
    val lut = BoundReference(1, dArr, nullable = true)
    run(PqAdc(codes, lut, 2), Seq(
      row2(iarr(1, 0), darr(10.0, 20.0, 30.0, 40.0)),
      row2(null, darr(1.0)), row2(iarr(0), null)))
  }

  test("SignLshBucket compiled == interpreted (sign-table cache shared)") {
    val rows = Seq(
      row(darr(1.0, -2.0, 3.0, 0.5)),
      row(darr(-1.0, -1.0, -1.0, -1.0)),
      row(null))
    run(SignLshBucket(in0, 16), rows)
  }

  test("MinHashSig / SigOverlap compiled == interpreted") {
    val sh = BoundReference(0, sArr, nullable = true)
    run(MinHashSig(sh, 32), Seq(
      row(sarr("abcde", "bcdef", "cdefg")), row(sarr()), row(null)))
    val a = BoundReference(0, lArr, nullable = true)
    val b = BoundReference(1, lArr, nullable = true)
    run(SigOverlap(a, b), Seq(
      row2(larr(1L, 2L, 3L, 4L), larr(1L, 9L, 3L, 8L)),
      row2(larr(), larr()), row2(null, larr(1L))))
  }

  test("text expressions compiled == interpreted") {
    val s = BoundReference(0, StringType, nullable = true)
    val texts = Seq(
      row(UTF8String.fromString("the quick brown fox jumps over the lazy dog")),
      row(UTF8String.fromString("ab")), // shorter than shingle/window size
      row(UTF8String.fromString("naïve café ünïcode bytes")), // multibyte UTF-8
      row(null))
    run(MinHashFromText(s, 5, 32), texts)
    run(CharShingles(s, 5), texts)
    run(TokenNgrams(s, 3), texts)
    run(StopwordCounts(s, Seq("the", "fox", "ünïcode", "a")), texts ++ Seq(
      row(UTF8String.fromString("")),
      row(UTF8String.fromString("  the  the ")), // multi-space, padding
      row(UTF8String.fromString("the")))) // single token, no delimiter
    run(TokenNgramsMulti(s, Seq(2, 3)), texts)
    run(FleschCensus(s), texts ++ Seq(
      row(UTF8String.fromString("")),
      row(UTF8String.fromString("one. two! three?? mixed!?.")),
      row(UTF8String.fromString("  y  ")))) // empty tokens, lone vowel
    run(PiiScan(s), texts ++ Seq(
      row(UTF8String.fromString("")),
      row(UTF8String.fromString(
        "mail u3@ex.com call 555-1234 from 1.2.3.4 card 4111111111111111"))))
  }

  test("SimHash64 / Md5SimHash60 compiled == interpreted") {
    val toks = BoundReference(0, sArr, nullable = true)
    val rows = Seq(
      row(sarr("the", "quick", "brown", "fox")),
      row(sarr()), row(null))
    run(SimHash64(toks), rows)
    run(Md5SimHash60(toks), rows)
  }

  test("KmvMergeCounts compiled == interpreted (incl. empty, disjoint, null)") {
    val a = BoundReference(0, lArr, nullable = true)
    val b = BoundReference(1, lArr, nullable = true)
    val rows = Seq(
      row2(larr(1L, 2L, 3L), larr(2L, 3L, 4L)),
      row2(larr(), larr()),
      row2(larr(1L, 3L, 5L), larr(2L, 4L, 6L)),
      row2(larr(1L, 2L, 3L, 4L, 5L), larr(1L, 2L, 3L, 4L, 5L)),
      row2(null, larr(1L)), row2(larr(1L), null))
    for (k <- Seq(1, 3, 64)) run(KmvMergeCounts(a, b, k), rows)
  }

  test("AvroEncode / AvroDecode compiled == interpreted (framed + raw)") {
    import graft.avro.{AvroDecode, AvroEncode}
    val schemaJson =
      """{"name":"AccountBalanceChangeRequest","type":"record","fields":[
        {"name":"account_id","type":"string","default":""},
        {"name":"timestamp","type":"float","default":0},
        {"name":"amount","type":"int","default":0}]}"""
    val structType = StructType(Seq(
      StructField("account_id", StringType),
      StructField("timestamp", FloatType),
      StructField("amount", IntegerType)))
    val in = BoundReference(0, structType, nullable = true)
    val record = new GenericInternalRow(
      Array[Any](UTF8String.fromString("A7"), 1.5f, -2500))
    val encRows = Seq(row(record), row(null))
    run(AvroEncode(in, schemaJson, schemaId = 42), encRows)
    run(AvroEncode(in, schemaJson, schemaId = 42, framed = false), encRows)
    // decode parity over the bytes the encoder just produced
    val framedBytes = AvroEncode(in, schemaJson, 42).eval(row(record))
      .asInstanceOf[Array[Byte]]
    val rawBytes = AvroEncode(in, schemaJson, 42, framed = false)
      .eval(row(record)).asInstanceOf[Array[Byte]]
    val binIn = BoundReference(0, BinaryType, nullable = true)
    run(AvroDecode(binIn, schemaJson), Seq(row(framedBytes), row(null)))
    run(AvroDecode(binIn, schemaJson, framed = false), Seq(row(rawBytes), row(null)))
  }
}
