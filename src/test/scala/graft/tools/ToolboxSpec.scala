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

  test("alter skips missing topics and non-novel values (reference :117-131)") {
    val a = admin
    // same value as current -> no alter; unknown topic -> skipped
    assert(a.alterTopicConfigs(Map(
      "app__changelog" -> Map("cleanup.policy" -> "compact"),
      "ghost" -> Map("retention.ms" -> "1"))) == Nil)
    // partitions / replication.factor are never alterable
    assert(a.alterTopicConfigs(Map(
      "orders" -> Map("partitions" -> "99", "replication.factor" -> "5"))) == Nil)
    assert(a.listTopics()("orders").partitions == 3)
  }

  test("POLICY_VIOLATION on retained restricted configs retries and succeeds (reference :139-155)") {
    val a = new InMemoryAdmin(restrictedConfigs = Set("cleanup.policy"))
    a.createTopics(Map("tbl" -> TopicSpec(3,
      configs = Map("cleanup.policy" -> "compact", "retention.ms" -> "100"))))
    // the update itself is fine; the retain-merge drags the restricted
    // cleanup.policy along -> broker refuses -> retry must drop it and apply
    assert(a.alterTopicConfigs(Map("tbl" -> Map("retention.ms" -> "200"))) == Seq("tbl"))
    val cfg = a.listTopics()("tbl").configs
    assert(cfg("retention.ms") == "200")
    assert(cfg("cleanup.policy") == "compact") // kept its broker-side value
  }

  test("unhandled policy errors propagate instead of looping") {
    val a = new AdminOps {
      override def listTopics(includeInternal: Boolean): Map[String, TopicSpec] =
        Map("t" -> TopicSpec(1))
      override def createTopics(topics: Map[String, TopicSpec]): Seq[String] = Nil
      override def deleteTopics(names: Seq[String]): Seq[String] = Nil
      override protected def applyTopicConfig(n: String, c: Map[String, String]): Unit =
        throw PolicyViolation(Nil, Seq("segment.ms=10 is out of range"))
    }
    intercept[PolicyViolation](a.alterTopicConfigs(Map("t" -> Map("segment.ms" -> "10"))))
  }

  test("sync with configs retains unmentioned settings via diff-aware alter") {
    val a = admin
    val res = a.syncTopics(Map(
      "orders" -> TopicSpec(3),
      "app__changelog" -> TopicSpec(3, configs = Map("retention.ms" -> "500"))))
    assert(res.altered == Seq("app__changelog"))
    assert(a.listTopics()("app__changelog").configs ==
      Map("cleanup.policy" -> "compact", "retention.ms" -> "500"))
  }

  test("CLI alter/sync parse the reference's JSON shapes") {
    val a = admin
    assert(ToolboxCli.run(Array("topics", "alter",
      """{"app__changelog": {"retention.ms": 250}}"""), a) == "app__changelog")
    assert(a.listTopics()("app__changelog").configs("retention.ms") == "250")
    val out = ToolboxCli.run(Array("topics", "sync",
      """{"orders": {"partitions": 3, "replication.factor": 1},
         "fresh": {"partitions": 2, "replication.factor": 1, "segment.ms": 10000}}"""), a)
    assert(out == "created=fresh;altered=;deleted=app__changelog")
    assert(a.listTopics()("fresh").configs == Map("segment.ms" -> "10000"))
  }

  test("CLI consume -> produce roundtrip through the JSON dump format") {
    import graft.SparkTestSession.spark
    import spark.implicits._
    val a = admin
    val dir = java.nio.file.Files.createTempDirectory("graft_cli").toString
    val msgs = Seq(
      graft.core.Message("k1", """{"v":1}""", Map("guid" -> "g1"), "orders", 0, 10L,
        new java.sql.Timestamp(1700000000000L)),
      graft.core.Message("k2", """{"v":2}""", Map("guid" -> "g2"), "orders", 2, 11L,
        new java.sql.Timestamp(1700000001000L)))
    msgs.toDS().write.parquet(s"$dir/in.parquet")

    assert(ToolboxCli.run(Array("topics", "consume", s"$dir/in.parquet", s"$dir/dump"),
      a, Some(spark)).startsWith("consumed"))
    assert(ToolboxCli.run(Array("topics", "produce", s"$dir/dump", s"$dir/out.parquet",
      "--topic-override", "orders2"), a, Some(spark)).startsWith("produced"))

    val out = spark.read.parquet(s"$dir/out.parquet")
    assert(out.count() == 2)
    assert(out.select("topic").distinct().as[String].collect().toSeq == Seq("orders2"))
    // partitioner reassigned (mmh3 over 1 default partition -> 0), key intact
    assert(out.select("partition").distinct().as[Int].collect().toSeq == Seq(0))
    assert(out.select("key").as[Array[Byte]].collect().map(new String(_, "UTF-8")).toSet
      == Set("k1", "k2"))
  }
}
