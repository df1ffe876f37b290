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

  // ---------------- strict transactional EOS (K2/X1, strict form) -------

  private def newTxn(broker: InMemoryTxBroker, txId: String, group: String) = {
    val p = broker.producer(txId)
    p.initTransactions()
    (p, new KafkaTransaction(p, group))
  }

  test("strict EOS: records and offsets commit atomically — both or neither") {
    val broker = new InMemoryTxBroker
    val (_, txn) = newTxn(broker, "tx-a", "g")
    txn.markConsumed("in", 0, 4L)
    txn.markConsumed("in", 1, 9L)
    txn.produce("out", 0, "k1", "v1", Map.empty)
    txn.produce("out", 1, "k2", "v2", Map.empty)
    // nothing visible before commit: no records, no offsets
    assert(broker.readCommitted("out").isEmpty)
    assert(broker.committedOffset("g", "in", 0).isEmpty)
    txn.commit()
    assert(broker.readCommitted("out").map(r => (r.partition, r.key, r.value))
      == Seq((0, "k1", "v1"), (1, "k2", "v2")))
    // offsets landed as next-to-read (end + 1), with the records
    assert(broker.committedOffset("g", "in", 0).contains(5L))
    assert(broker.committedOffset("g", "in", 1).contains(10L))
  }

  test("strict EOS: abort rolls back records AND consumption state") {
    val broker = new InMemoryTxBroker
    val (_, txn) = newTxn(broker, "tx-a", "g")
    txn.markConsumed("in", 0, 7L)
    txn.produce("out", 0, "k", "doomed", Map.empty)
    txn.abortTransaction()
    assert(broker.readCommitted("out").isEmpty)
    assert(broker.committedOffset("g", "in", 0).isEmpty)
    assert(!txn.hasOutstandingUpdates)
    // the aborted record still OCCUPIES offset 0 (real-broker semantics);
    // a follow-up transaction lands after it, invisible gap preserved
    val (_, txn2) = newTxn(broker, "tx-a", "g")
    txn2.produce("out", 0, "k", "survives", Map.empty)
    txn2.commit()
    assert(broker.readCommitted("out").map(r => (r.offset, r.value))
      == Seq((1L, "survives")))
    assert(broker.allSlots("out", 0).map(_._2.toString).head == "Aborted")
  }

  test("strict EOS: retriable commit failure retries gracefully, no duplicates") {
    val broker = new InMemoryTxBroker
    val (_, txn) = newTxn(broker, "tx-a", "g")
    txn.markConsumed("in", 0, 0L)
    txn.produce("out", 0, "k", "v", Map.empty)
    broker.failNext("commit",
      TxClientError("_TRANSPORT", retriable = true, txnRequiresAbort = false))
    Transactions.commitWithRetries(txn, maxAttempts = 3)
    assert(broker.readCommitted("out").map(_.value) == Seq("v"))
    assert(broker.committedOffset("g", "in", 0).contains(1L))
  }

  test("strict EOS: timeout classification propagates unretried") {
    val broker = new InMemoryTxBroker
    val (_, txn) = newTxn(broker, "tx-a", "g")
    txn.produce("out", 0, "k", "v", Map.empty)
    broker.failNext("commit",
      TxClientError("_TIMED_OUT", retriable = true, txnRequiresAbort = false))
    intercept[TransactionTimeout] { Transactions.commitWithRetries(txn, 3) }
    assert(broker.readCommitted("out").isEmpty)
  }

  test("strict EOS: fatal failure aborts; replaying the batch lands exactly once") {
    val broker = new InMemoryTxBroker
    (0L to 2L).foreach(i => broker.produceRaw("in", 0, s"k$i", s"v$i"))
    var incarnation = 0
    // one reference-style app pass: consume from committed offsets,
    // transform, produce + offsets in one transaction
    def appPass(): Unit = {
      incarnation += 1
      val (_, txn) = newTxn(broker, "tx-app", "g")
      val consumed = broker.consumeCommitted("g", "in")
      consumed.foreach { r =>
        txn.markConsumed(r.topic, r.partition, r.offset)
        txn.produce("out", r.partition, r.key, r.value.toUpperCase, Map.empty)
      }
      // the reference app treats an empty batch's TransactionNotRequired
      // as "no message" and idles (fluvii_app.py:65-66)
      try Transactions.commitWithRetries(txn, 3)
      catch { case _: TransactionNotRequired => () }
    }
    broker.failNext("commit",
      TxClientError("_FATAL", retriable = false, txnRequiresAbort = true))
    intercept[FatalTransactionFailure] { appPass() } // aborted + rethrown
    assert(broker.readCommitted("out").isEmpty)
    assert(broker.committedOffset("g", "in", 0).isEmpty)
    appPass() // the task replay: re-consumes the SAME offsets
    assert(broker.readCommitted("out").map(_.value).sorted
      == Seq("V0", "V1", "V2"))
    assert(broker.committedOffset("g", "in", 0).contains(3L))
    appPass() // nothing left to consume — idempotent
    assert(broker.readCommitted("out").size == 3)
  }

  test("strict EOS: a fenced zombie's records never become visible") {
    val broker = new InMemoryTxBroker
    val (_, zombie) = newTxn(broker, "tx-a", "g")
    zombie.produce("out", 0, "k", "zombie", Map.empty)
    // a new incarnation of the same transactional.id fences the old one
    val (_, fresh) = newTxn(broker, "tx-a", "g")
    fresh.produce("out", 0, "k", "fresh", Map.empty)
    // the zombie's commit hits _FENCED — neither retriable nor
    // abort-required, which the reference classification deliberately
    // swallows (transaction.py:22-25); its records stay invisible
    zombie.commit()
    fresh.commit()
    assert(broker.readCommitted("out").map(_.value) == Seq("fresh"))
  }

  test("strict EOS: writeBatchTransactional microbatch loop is exactly-once (K2/X1)") {
    val broker = new InMemoryTxBroker
    for (p <- 0 to 2; i <- 0 to 2)
      broker.produceRaw("in", p, s"k$p-$i", s"v$p-$i")
    val txSeq = new java.util.concurrent.atomic.AtomicInteger
    TxProducers.register("spec-eos",
      () => broker.producer(s"eos-task-${txSeq.incrementAndGet()}"))
    def microbatch(): Unit = {
      val rows = broker.consumeCommitted("g", "in").map { r =>
        (Message(r.key, r.value.toUpperCase, Map.empty[String, String],
          "out", r.partition, 0L, new Timestamp(1700000000000L)),
          Transactions.SourceOffset(r.topic, r.partition, r.offset))
      }
      Transactions.writeBatchTransactional(rows.toDS(), "spec-eos", "g")
    }
    microbatch()
    val out = broker.readCommitted("out")
    assert(out.size == 9)
    assert(out.map(_.value).toSet == (for (p <- 0 to 2; i <- 0 to 2)
      yield s"V$p-$i").toSet)
    (0 to 2).foreach(p =>
      assert(broker.committedOffset("g", "in", p).contains(3L)))
    microbatch() // replay tick: offsets already committed → consumes nothing
    assert(broker.readCommitted("out").size == 9)
  }

  test("strict EOS: post-commit TASK replay of the same dataset is filtered (round-10 advice)") {
    // the window the round-10 advice named: a Spark task retried (or
    // speculatively re-attempted) AFTER commitTransaction succeeded
    // replays the partition from the Dataset, not from broker offsets —
    // without the committed-offset filter every row would re-produce.
    val broker = new InMemoryTxBroker
    for (i <- 0 to 4) broker.produceRaw("in", 0, s"k$i", s"v$i")
    val txSeq = new java.util.concurrent.atomic.AtomicInteger
    TxProducers.register("spec-replay",
      () => broker.producer(s"replay-task-${txSeq.incrementAndGet()}"))
    def rows(upTo: Int) = (0 to upTo).map { i =>
      (Message(s"k$i", s"V$i", Map.empty[String, String], "out", 0, 0L,
        new Timestamp(1700000000000L)),
        Transactions.SourceOffset("in", 0, i.toLong))
    }.toDS()
    Transactions.writeBatchTransactional(rows(2), "spec-replay", "g")
    assert(broker.readCommitted("out").size == 3)
    assert(broker.committedOffset("g", "in", 0).contains(3L))
    // identical partition data replays post-commit: every row is under the
    // committed floor, no transaction begins, nothing lands twice
    Transactions.writeBatchTransactional(rows(2), "spec-replay", "g")
    assert(broker.readCommitted("out").size == 3)
    assert(broker.committedOffset("g", "in", 0).contains(3L))
    // a replay carrying BOTH committed and fresh rows produces ONLY the
    // fresh ones and advances the offset past them
    Transactions.writeBatchTransactional(rows(4), "spec-replay", "g")
    assert(broker.readCommitted("out").map(_.value).sorted ==
      Seq("V0", "V1", "V2", "V3", "V4"))
    assert(broker.committedOffset("g", "in", 0).contains(5L))
  }

  test("strict EOS: committedOffset=None binding SURFACES its at-least-once degradation (round-11 verdict #3)") {
    // a binding that cannot read group offsets leaves the post-commit
    // replay filter inactive; the degradation must FIRE a warning at
    // runtime (once per task), not just sit in the scaladoc
    val broker = new InMemoryTxBroker
    val txSeq = new java.util.concurrent.atomic.AtomicInteger
    TxProducers.register("spec-nofloor", () => {
      val real = broker.producer(s"nofloor-task-${txSeq.incrementAndGet()}")
      new TxProducerClient { // committedOffset NOT overridden → trait None
        def initTransactions(): Unit = real.initTransactions()
        def beginTransaction(): Unit = real.beginTransaction()
        def produce(topic: String, partition: Int, key: String,
            value: String, headers: Map[String, String]): Unit =
          real.produce(topic, partition, key, value, headers)
        def sendOffsetsToTransaction(offsets: Map[(String, Int), Long],
            groupId: String): Unit =
          real.sendOffsetsToTransaction(offsets, groupId)
        def commitTransaction(timeoutSecs: Int): Unit =
          real.commitTransaction(timeoutSecs)
        def abortTransaction(timeoutSecs: Int): Unit =
          real.abortTransaction(timeoutSecs)
        override def close(): Unit = real.close()
      }
    })
    val fired = new java.util.concurrent.atomic.AtomicInteger
    Transactions.noFloorObserver = (_, _, _) => fired.incrementAndGet()
    try {
      def rows = (0 to 2).map { i =>
        (Message(s"k$i", s"V$i", Map.empty[String, String], "out", 0, 0L,
          new Timestamp(1700000000000L)),
          Transactions.SourceOffset("in", 0, i.toLong))
      }.toDS()
      Transactions.writeBatchTransactional(rows, "spec-nofloor", "g")
      assert(fired.get() == 1, "warning must fire exactly once per task")
      assert(broker.readCommitted("out").size == 3)
      // post-commit replay of the SAME rows: with no floor every row
      // re-produces — the honest at-least-once the warning announced
      Transactions.writeBatchTransactional(rows, "spec-nofloor", "g")
      assert(fired.get() == 2)
      assert(broker.readCommitted("out").size == 6,
        "None-binding replay is at-least-once by contract")
    } finally Transactions.noFloorObserver = (_, _, _) => ()
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
