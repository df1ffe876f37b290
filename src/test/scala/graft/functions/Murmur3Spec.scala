package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Parity with the reference partitioner: mmh3.hash(key) % n
  * (reference: fluvii/components/producer/producer.py:89-90).
  * Vectors are the published mmh3 defaults (signed 32-bit, seed 0). */
class Murmur3Spec extends AnyFunSuite {

  test("matches published mmh3 test vectors (seed 0, signed)") {
    assert(Murmur3.hash32("") == 0)
    assert(Murmur3.hash32("hello") == 613153351)
    assert(Murmur3.hash32("foo") == -156908512)
  }

  test("seeded variant differs and is stable") {
    assert(Murmur3.hash32("hello", 1) != Murmur3.hash32("hello", 0))
    assert(Murmur3.hash32("hello", 42) == Murmur3.hash32("hello", 42))
  }

  test("partition() is Python-floored-modulo in [0, n)") {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      val n = rnd.nextInt(64) + 1
      val p = Murmur3.partition(s, n)
      assert(p >= 0 && p < n)
      assert(p == java.lang.Math.floorMod(Murmur3.hash32(s), n))
    }
  }

  test("distributes keys over partitions") {
    val parts = (0 until 1000).map(i => Murmur3.partition(s"key_$i", 12)).toSet
    assert(parts == (0 until 12).toSet)
  }
}
