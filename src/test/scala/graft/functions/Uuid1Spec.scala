package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the v1-UUID guid against the reference's `uuid1()` contract
  * (producer.py:92-93): version/variant bits, timestamp round-trip against
  * the wall clock, strict monotonicity under same-tick generation, and the
  * known-vector bit layout Python produces for fixed fields. */
class Uuid1Spec extends AnyFunSuite {

  test("version is 1 and variant is RFC 4122") {
    val u = Uuid1.next()
    assert(u.version() == 1)
    assert(u.variant() == 2) // 0b10x = Leach-Salz / RFC 4122
  }

  test("known vector: fixed fields assemble to Python's uuid1 layout") {
    // Cross-checked against CPython:
    //   str(uuid.UUID(fields=(0x789abcde, 0x3456, 0x1012, 0x93, 0x57,
    //       0x0dfeedbeefca))) == '789abcde-3456-1012-9357-0dfeedbeefca'
    //   and .time == 0x123456789abcde, .clock_seq == 0x1357, .version == 1
    // i.e. for time=0x0123456789abcde: time_low = low 32 bits = 0x789abcde,
    // time_mid = next 16 = 0x3456, time_hi|version = 0x1012; clock_seq
    // 0x1357 renders 0x80|0x13 = 0x93 then 0x57.
    val u = Uuid1.fromParts(0x0123456789abcdeL, 0x1357, 0x0dfeedbeefcaL)
    assert(u.toString == "789abcde-3456-1012-9357-0dfeedbeefca")
    assert(u.version() == 1)
    assert(Uuid1.timestampOf(u) == 0x0123456789abcdeL)
    assert(u.node() == 0x0dfeedbeefcaL)
    assert(u.clockSequence() == 0x1357)
  }

  test("timestamp round-trips to the wall clock") {
    val before = System.currentTimeMillis()
    val u = Uuid1.next()
    val after = System.currentTimeMillis()
    val encoded = Uuid1.unixMillisOf(u)
    // the monotonic bump can push a few 100-ns ticks past `before`, never ms
    assert(encoded >= before - 1 && encoded <= after + 1,
      s"uuid time $encoded outside [$before, $after]")
  }

  test("strictly monotonic and unique under same-millisecond bursts") {
    val us = Array.fill(10000)(Uuid1.next())
    val ts = us.map(Uuid1.timestampOf)
    assert(ts.zip(ts.tail).forall { case (a, b) => a < b })
    assert(us.map(_.toString).distinct.length == us.length)
  }

  test("concurrent generation stays unique and collision-free (CAS loop)") {
    import scala.jdk.CollectionConverters._
    val all = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val n = 8
    val per = 5000
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val tasks = (1 to n).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = (1 to per).foreach(_ => all.add(Uuid1.next().toString))
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    // every uuid distinct: the timestamp CAS hands out strictly increasing
    // ticks across threads, and clockSeq/node are process constants
    assert(all.size == n * per, s"collisions: ${n * per - all.size}")
    val ts = all.asScala.toSeq.map(s => Uuid1.timestampOf(java.util.UUID.fromString(s)))
    assert(ts.distinct.length == ts.length)
  }

  test("node is 48 bits and stable within the process") {
    assert((Uuid1.node & ~0xffffffffffffL) == 0)
    assert(Uuid1.next().node() == Uuid1.next().node())
  }

  test("Produce injects a v1 guid by default") {
    val merged = graft.streaming.Produce.mergeHeaders(Map.empty, Map.empty)
    val guid = java.util.UUID.fromString(merged(graft.core.Message.GuidHeader))
    assert(guid.version() == 1)
  }
}
