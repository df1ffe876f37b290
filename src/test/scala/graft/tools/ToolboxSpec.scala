package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** D1–D6 admin surface (reference: fluvii/kafka_tools/fluvii_toolbox.py:60-195). */
class ToolboxSpec extends AnyFunSuite {

  private def admin = {
    val a = new InMemoryAdmin
    a.createTopics(Map(
      "orders" -> TopicSpec(3),
      "app__changelog" -> TopicSpec(3, configs = Map("cleanup.policy" -> "compact")),
      "__consumer_offsets" -> TopicSpec(50)))
    a
  }

  test("list filters internal topics") {
    assert(admin.listTopics().keySet == Set("orders", "app__changelog"))
    assert(admin.listTopics(includeInternal = true).keySet.contains("__consumer_offsets"))
  }

  test("create ignores existing; delete ignores missing") {
    val a = admin
    assert(a.createTopics(Map("orders" -> TopicSpec(9), "new" -> TopicSpec(1))) == Seq("new"))
    assert(a.listTopics()("orders").partitions == 3) // unchanged
    assert(a.deleteTopics(Seq("nope", "new")) == Seq("new"))
  }

  test("alter retains existing configs (diff-aware)") {
    val a = admin
    a.alterTopics(Map("app__changelog" -> TopicSpec(3, configs = Map("retention.ms" -> "100"))))
    val cfg = a.listTopics()("app__changelog").configs
    assert(cfg == Map("cleanup.policy" -> "compact", "retention.ms" -> "100"))
  }

  test("sync is declarative: creates, alters, deletes to match") {
    val a = admin
    val res = a.syncTopics(Map(
      "orders" -> TopicSpec(3),
      "fresh" -> TopicSpec(2)))
    assert(res.created == Seq("fresh"))
    assert(res.deleted == Seq("app__changelog"))
    assert(a.listTopics().keySet == Set("orders", "fresh"))
  }

  test("CLI surface") {
    val a = admin
    assert(ToolboxCli.run(Array("topics", "list"), a).contains("orders partitions=3"))
    assert(ToolboxCli.run(Array("topics", "create", "t2", "4"), a) == "t2")
    assert(ToolboxCli.run(Array("topics", "delete", "t2"), a) == "t2")
    assert(ToolboxCli.run(Array("bogus"), a).startsWith("usage:"))
  }
}
