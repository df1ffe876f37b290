package graft.sinks

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark
import graft.core.Message

class SinksSpec extends AnyFunSuite {
  import spark.implicits._

  private def msg(k: String, off: Long, guid: String) =
    Message(k, s"v$off", Map("guid" -> guid), "t", 0, off,
      new Timestamp(1700000000000L + off))

  test("EOS sink: replaying a batch does not duplicate output (K2/X1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_eos").toString
    val batch = Seq(msg("a", 0, "g0"), msg("b", 1, "g1"), msg("b", 1, "g1")).toDS()
    Eos.writeBatchIdempotent(batch, 7, dir)
    Eos.writeBatchIdempotent(batch, 7, dir) // replay of the same batch
    val out = Eos.readCommitted(spark, dir)
    assert(out.count() == 2) // in-batch dup collapsed, replay overwrote
    assert(out.select("guid").as[String].collect().toSet == Set("g0", "g1"))
    // a different batch appends
    Eos.writeBatchIdempotent(Seq(msg("c", 2, "g2")).toDS(), 8, dir)
    assert(Eos.readCommitted(spark, dir).count() == 3)
  }

  test("changelog: append + compaction converges to latest state per key (K3)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cl").toString
    Changelog.appendBatch(Seq(("k1", "s1v1"), ("k2", "s2v1")).toDF("key", "state"), 0, dir)
    Changelog.appendBatch(Seq(("k1", "s1v2"), ("k3", "s3v1")).toDF("key", "state"), 1, dir)
    Changelog.appendBatch(Seq(("k2", null.asInstanceOf[String])).toDF("key", "state"), 2, dir)
    val compacted = Changelog.compact(spark, dir)
      .as[(String, String)].collect().toMap
    assert(compacted == Map("k1" -> "s1v2", "k3" -> "s3v1")) // k2 tombstoned
  }

  test("multi-message bulk transform sees the whole batch in order (T2)") {
    import graft.state.GraftTableApp
    val msgs = Seq(msg("a", 2, "g2"), msg("a", 0, "g0"), msg("a", 1, "g1")).toDS()
      .repartition(1)
    val out = GraftTableApp.transformBatch(msgs) { batch =>
      Iterator.single(batch.map(_.offset).mkString(","))
    }.collect()
    assert(out.toSeq == Seq("0,1,2"))
  }
}
