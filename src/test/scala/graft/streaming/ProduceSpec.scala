package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Message
import graft.functions.Murmur3

/** Producer-side rules (reference: fluvii/components/producer/producer.py:
  * 89-93,151-175; fluvii/general_utils.py:4-15). */
class ProduceSpec extends AnyFunSuite {
  private val consumed = Message("acct_1", """{"amount":5}""",
    Map("trace" -> "t1", "guid" -> "g-upstream"), "in", 2, 41,
    new Timestamp(1700000000000L))

  test("produced message inherits key and headers, partitions by mmh3") {
    val m = Produce.message(consumed, """{"ok":true}""", "out", 12)
    assert(m.key == "acct_1")
    assert(m.headers("trace") == "t1")
    assert(m.partition == Murmur3.partition("acct_1", 12))
    assert(m.topic == "out")
  }

  test("upstream guid is preserved; absent guid is injected") {
    val withGuid = Produce.mergeHeaders(Map("guid" -> "g0"), Map.empty, () => "NEW")
    assert(withGuid("guid") == "g0")
    val injected = Produce.mergeHeaders(Map("h" -> "v"), Map.empty, () => "NEW")
    assert(injected("guid") == "NEW")
  }

  test("None-valued header overrides drop the header") {
    val merged = Produce.mergeHeaders(
      Map("keep" -> "a", "drop" -> "b", "guid" -> "g"),
      Map("drop" -> None, "add" -> Some("c")))
    assert(merged == Map("keep" -> "a", "add" -> "c", "guid" -> "g"))
  }

  test("key override changes the partition consistently") {
    val m = Produce.message(consumed, "v", "out", 12, key = Some("other"))
    assert(m.partition == Murmur3.partition("other", 12))
  }

  test("default topic inference: exactly one non-changelog topic") {
    assert(Produce.inferTopic(Seq("orders", "app__changelog")) == "orders")
    intercept[IllegalArgumentException] {
      Produce.inferTopic(Seq("a", "b", "app__changelog"))
    }
    // substring exclusion, not suffix: the reference's `'__changelog' in t`
    // (producer.py:163-168) also excludes names like app__changelog_v2
    assert(Produce.inferTopic(Seq("orders", "app__changelog_v2")) == "orders")
  }
}
