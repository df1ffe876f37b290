package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract alignment between [[SparkEntry]] and
  * [[Bench]] (round-13): every declared query has an oracle, every
  * benched name resolves, the memo-build entries stay bench-only and
  * encodable, and the bench-exclusion list is exactly the documented
  * brute-force set — so a new operator cannot silently ship unbenched
  * or unoracled. */
class BenchContractSpec extends AnyFunSuite {

  private val famNum = "([a-z]+)([0-9]+)".r

  test("every SparkEntry query has an oracle and vice versa (191/191)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert((q -- o).isEmpty, s"queries without oracles: ${q -- o}")
    assert(q.size == 191, s"query count drifted: ${q.size}")
  }

  test("every headline name resolves to a query; exclusions are the documented brute-force set") {
    val q = SparkEntry.queries.keySet
    val h = Bench.headline.toSet
    assert((h -- q).isEmpty, s"headline without query: ${h -- q}")
    assert(Bench.headline.distinct.size == Bench.headline.size, "duplicate headline entries")
    // the only un-benched queries are the true-quadratic oracle twins
    // (see the Bench scaladoc and the dd19 exemption note)
    assert((q -- h) == Set("dd02_ngram_jaccard", "sim03_embed_neardup",
      "dd19_containment"), s"unexpected bench exclusions: ${q -- h}")
  }

  test("committed bench_baseline.json parses under Bench's real regex parser") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("bench_baseline.json")), "UTF-8")
    // the sf recorded in the file is the driver scale; parse against it
    val sf = """"sf":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
    assert(sf.nonEmpty, "baseline has no sf field")
    val parsed = Bench.parseBaseline(txt, sf.get)
    // every benched headline + memo entry must resolve to a baseline time,
    // or the straggler-retry rule silently deactivates (a pretty-printed
    // rewrite of the file is the failure mode this pins against)
    val expected = (Bench.headline ++ Bench.memoBuilds.map(_._1)).toSet
    assert((expected -- parsed.keySet).isEmpty,
      s"baseline entries unparsed or missing: ${expected -- parsed.keySet}")
    assert(Bench.parseBaseline(txt, "/some/other/sf").isEmpty,
      "sf mismatch must disable the baseline")
  }

  test("memo-build entries are bench-only, uniquely named, and family-encodable") {
    val names = Bench.memoBuilds.map(_._1)
    assert(names.distinct.size == names.size)
    assert(names.forall(n => !SparkEntry.queries.contains(n)),
      "memo-build entries must not shadow queries")
    assert(names.forall(n => !Bench.headline.contains(n)),
      "memo-build entries are prepended at runtime, not listed in headline")
    // the compact stdout encoding requires <fam><num>_ names
    names.foreach { n =>
      n.takeWhile(_ != '_') match {
        case famNum(fam, num) =>
          assert(fam == "xm" && num.toInt >= 1, s"unexpected memo name $n")
        case other => fail(s"memo name not family-encodable: $other")
      }
    }
  }
}
