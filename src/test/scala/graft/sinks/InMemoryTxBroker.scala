package graft.sinks

import scala.collection.mutable

/** In-memory transactional Kafka broker double for the strict-EOS specs
  * (no broker exists in this sandbox). Models the parts of the protocol
  * the reference relies on, with real-broker semantics:
  *
  *   - offsets are assigned at PRODUCE time and aborted records keep
  *     occupying them (the reference's abort bookkeeping at
  *     transaction.py:138-148 exists precisely because of this);
  *   - read_committed visibility: only records of committed transactions
  *     are readable (consumer.py:118 isolation.level);
  *   - group offsets move ONLY via offsets-in-transaction, atomically
  *     with the transaction's records (consumer.py:94-107);
  *   - `init_transactions` bumps the transactional.id epoch and aborts
  *     any in-flight transaction of prior incarnations — zombie fencing
  *     (producer.py:18-20);
  *   - induced failures: the next commit/sendOffsets call can be made to
  *     throw a [[TxClientError]] with chosen classification bits, to
  *     drive the retriable / abort-required / timeout paths.
  *
  * Thread-safe (foreachPartition runs transactions concurrently).
  */
final class InMemoryTxBroker {
  import InMemoryTxBroker._

  private val lock = new Object
  private val logs = mutable.Map.empty[(String, Int), mutable.ArrayBuffer[Slot]]
  private val groupOffsets = mutable.Map.empty[(String, String, Int), Long]
  private val epochs = mutable.Map.empty[String, Long]
  private val failQueue = mutable.Queue.empty[(String, TxClientError)]

  /** Seed an input topic outside any transaction (immediately committed —
    * like a plain idempotent producer). Returns the assigned offset. */
  def produceRaw(topic: String, partition: Int, key: String, value: String,
      headers: Map[String, String] = Map.empty): Long = lock.synchronized {
    val log = logs.getOrElseUpdate((topic, partition), mutable.ArrayBuffer.empty)
    val off = log.length.toLong
    log += Slot(Rec(topic, partition, off, key, value, headers), Committed)
    off
  }

  /** All COMMITTED records of a topic, (partition, offset) order. */
  def readCommitted(topic: String): Seq[Rec] = lock.synchronized {
    logs.toSeq.filter(_._1._1 == topic).sortBy(_._1._2).flatMap {
      case (_, log) => log.filter(_.status == Committed).map(_.rec)
    }
  }

  /** COMMITTED records of one partition from `from` (read_committed
    * consumer poll). */
  def readCommittedFrom(topic: String, partition: Int, from: Long): Seq[Rec] =
    lock.synchronized {
      logs.getOrElse((topic, partition), mutable.ArrayBuffer.empty)
        .filter(s => s.status == Committed && s.rec.offset >= from)
        .map(_.rec).toSeq
    }

  /** Every record INCLUDING pending/aborted — for asserting that aborted
    * data occupies offsets yet never becomes visible. */
  def allSlots(topic: String, partition: Int): Seq[(Rec, Status)] =
    lock.synchronized {
      logs.getOrElse((topic, partition), mutable.ArrayBuffer.empty)
        .map(s => (s.rec, s.status)).toSeq
    }

  /** The group's committed NEXT-TO-READ offset, if any. */
  def committedOffset(group: String, topic: String, partition: Int): Option[Long] =
    lock.synchronized { groupOffsets.get((group, topic, partition)) }

  /** A read_committed consume from the group's committed position (does
    * NOT move the offset — the app commits it inside its transaction,
    * which is the whole point). */
  def consumeCommitted(group: String, topic: String): Seq[Rec] =
    lock.synchronized {
      logs.keys.filter(_._1 == topic).toSeq.sortBy(_._2).flatMap {
        case (_, p) =>
          readCommittedFrom(topic, p, groupOffsets.getOrElse((group, topic, p), 0L))
      }
    }

  /** Make the next `op` ("commit" | "offsets") throw `e` once. */
  def failNext(op: String, e: TxClientError): Unit = lock.synchronized {
    failQueue.enqueue((op, e))
  }

  private def maybeFail(op: String): Unit = lock.synchronized {
    if (failQueue.nonEmpty && failQueue.head._1 == op)
      throw failQueue.dequeue()._2
  }

  /** A producer handle bound to a transactional.id. Epoch is fixed at
    * [[TxProducerClient.initTransactions]]; a newer initTransactions for
    * the same id fences this handle. */
  def producer(transactionalId: String): TxProducerClient =
    new TxProducerClient {
      private var epoch = -1L
      private var open = false
      private var slots = List.empty[Slot]
      private var pendingOffsets = Map.empty[(String, Int), Long]
      private var pendingGroup: String = _

      private def checkFenced(): Unit = lock.synchronized {
        if (epochs.getOrElse(transactionalId, -1L) != epoch)
          throw TxClientError("_FENCED", retriable = false,
            txnRequiresAbort = false)
      }

      override def initTransactions(): Unit = lock.synchronized {
        epoch = epochs.getOrElse(transactionalId, -1L) + 1
        epochs(transactionalId) = epoch
        // abort in-flight slots of prior incarnations of this id
        logs.values.foreach(_.mapInPlace { s =>
          s.status match {
            case Pending(id, e) if id == transactionalId && e < epoch =>
              s.copy(status = Aborted)
            case _ => s
          }
        })
      }

      override def beginTransaction(): Unit = {
        checkFenced()
        require(!open, "transaction already active")
        open = true; slots = Nil; pendingOffsets = Map.empty
      }

      override def produce(topic: String, partition: Int, key: String,
          value: String, headers: Map[String, String]): Unit =
        lock.synchronized {
          checkFenced()
          require(open, "produce outside a transaction")
          val log = logs.getOrElseUpdate((topic, partition),
            mutable.ArrayBuffer.empty)
          val slot = Slot(Rec(topic, partition, log.length.toLong, key,
            value, headers), Pending(transactionalId, epoch))
          log += slot
          slots ::= slot
        }

      override def sendOffsetsToTransaction(offsets: Map[(String, Int), Long],
          groupId: String): Unit = {
        checkFenced()
        require(open, "offsets outside a transaction")
        maybeFail("offsets")
        pendingOffsets = pendingOffsets ++ offsets
        pendingGroup = groupId
      }

      override def commitTransaction(timeoutSecs: Int): Unit = {
        checkFenced()
        require(open, "commit without a transaction")
        maybeFail("commit")
        lock.synchronized {
          // atomicity: records flip visible and offsets move in ONE
          // critical section — a reader sees both or neither
          slots.foreach { s =>
            val log = logs((s.rec.topic, s.rec.partition))
            val i = log.indexWhere(_ eq s)
            log(i) = s.copy(status = Committed)
          }
          pendingOffsets.foreach { case ((t, p), o) =>
            groupOffsets((pendingGroup, t, p)) = o
          }
        }
        open = false; slots = Nil; pendingOffsets = Map.empty
      }

      override def abortTransaction(timeoutSecs: Int): Unit = {
        checkFenced()
        lock.synchronized {
          slots.foreach { s =>
            val log = logs((s.rec.topic, s.rec.partition))
            val i = log.indexWhere(_ eq s)
            log(i) = s.copy(status = Aborted)
          }
        }
        open = false; slots = Nil; pendingOffsets = Map.empty
      }

      override def committedOffset(groupId: String, topic: String,
          partition: Int): Option[Long] = {
        checkFenced()
        lock.synchronized { groupOffsets.get((groupId, topic, partition)) }
      }
    }
}

object InMemoryTxBroker {
  final case class Rec(topic: String, partition: Int, offset: Long,
      key: String, value: String, headers: Map[String, String])
  sealed trait Status
  final case class Pending(transactionalId: String, epoch: Long) extends Status
  case object Committed extends Status
  case object Aborted extends Status
  final case class Slot(rec: Rec, status: Status)
}
