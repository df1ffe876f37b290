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
    assert(q.size == 192, s"query count drifted: ${q.size}")
  }

  test("every headline name resolves to a query; exclusions are the documented brute-force set") {
    val q = SparkEntry.queries.keySet
    val h = Bench.headline.toSet
    assert((h -- q).isEmpty, s"headline without query: ${h -- q}")
    assert(Bench.headline.distinct.size == Bench.headline.size, "duplicate headline entries")
    // the only un-benched queries are the true-quadratic oracle twins
    // (see the Bench scaladoc and the dd19 exemption note) and mm10, the
    // Verify-only corruption-injection twin of mm09 (same three-scan
    // decode cost, no new perf information)
    assert((q -- h) == Set("dd02_ngram_jaccard", "sim03_embed_neardup",
      "dd19_containment", "mm10_quarantine_injected"),
      s"unexpected bench exclusions: ${q -- h}")
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

  test("parseBaseline reads the queries object only, never the fg map (round-14)") {
    // a promoted full artifact carries foreign_cores_per_query with the
    // SAME keys as queries and bare decimals — a whole-file scan with
    // last-match-wins would replace every time with its fg reading
    val q = Bench.headline.head
    val txt = s"""{"metric":"total","value":9.999,"unit":"sec","queries":{"$q":1.234},""" +
      s""""runs":{"$q":[1.300,1.234]},"foreign_cores_per_query":{"$q":0.12},""" +
      s""""deferred":[],"attempts":2,"contended":false,"foreign_cores":0.120,""" +
      s""""loadavg":[1.000,2.000,3.000],"sf":"/some/sf"}"""
    val parsed = Bench.parseBaseline(txt, "/some/sf")
    assert(parsed == Map(q -> 1.234),
      s"parser leaked non-queries sections: $parsed")
    // and a file with no queries object parses to empty, not garbage
    assert(Bench.parseBaseline(s"""{"foo":1.0,"sf":"/some/sf"}""", "/some/sf").isEmpty)
  }

  test("deferral fires exactly on slow-under-foreign-load readings (round-14)") {
    // round-13's shipped phantom: ev04 min 3.72 s vs 0.526 s baseline under
    // 0.946 foreign cores — must defer under the new rule
    assert(Bench.shouldDefer(3.72, Some(0.526), 0.946))
    // same slowness on an idle window: a genuine regression — ships (after
    // the in-line retries), never deferred
    assert(!Bench.shouldDefer(3.72, Some(0.526), 0.0))
    assert(!Bench.shouldDefer(3.72, Some(0.526), Bench.DeferFgCores))
    // under the retry bar: nothing to defer however loaded the window was
    assert(!Bench.shouldDefer(0.6, Some(0.526), 5.0))
    assert(!Bench.shouldDefer(0.526 * Bench.RetryFactor, Some(0.526), 5.0))
    // no baseline (new query / foreign sf): rule inactive
    assert(!Bench.shouldDefer(3.72, None, 5.0))
    // failed query: -1 must never enter the deferral queue
    assert(!Bench.shouldDefer(-1.0, Some(0.526), 5.0))
    // unmeasurable fg (-1, /proc/stat unavailable) must not defer
    assert(!Bench.shouldDefer(3.72, Some(0.526), -1.0))
  }

  test("contention thresholds pin the round-13 phantom regime") {
    // 0.946 foreign cores produced a 7× phantom while the old cpus/8=4 bar
    // self-certified the run clean; the flag bar must catch ~1 core and
    // the per-query deferral bar must sit well under it
    assert(Bench.ForeignFlagCores < 0.946,
      "flag bar must catch the round-13 phantom regime (0.946 cores)")
    assert(Bench.ForeignFlagCores > Bench.DeferFgCores,
      "run-level flag must be laxer than the per-query deferral bar")
    assert(Bench.DeferFgCores < 0.946,
      "deferral bar must catch the round-13 phantom regime")
    assert(Bench.DeferFgCores >= 0.1,
      "deferral bar under jiffy noise floor would defer every slow query")
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
