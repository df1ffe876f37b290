package graft.functions

/** MurmurHash3 x86 32-bit — the partitioner hash of the reference engine.
  *
  * The reference partitions produced messages with `mmh3.hash(key) %
  * partition_count` (reference: fluvii/components/producer/producer.py:89-90),
  * which is murmur3-32 with seed 0 over UTF-8 bytes, returned as a SIGNED
  * 32-bit int — NOT Kafka's default murmur2. Co-partitioning between topics,
  * changelog and table relies on this exact function, so we reimplement it
  * from the public MurmurHash3 specification (Austin Appleby, public domain)
  * and property-test it against published mmh3 vectors.
  */
object Murmur3 {
  final val DefaultSeed = 0

  def hash32(data: Array[Byte], seed: Int = DefaultSeed): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tail = nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    // finalization
    h1 ^= len
    h1 ^= (h1 >>> 16)
    h1 *= 0x85ebca6b
    h1 ^= (h1 >>> 13)
    h1 *= 0xc2b2ae35
    h1 ^= (h1 >>> 16)
    h1
  }

  def hash32(s: String): Int = hash32(s.getBytes("UTF-8"))
  def hash32(s: String, seed: Int): Int = hash32(s.getBytes("UTF-8"), seed)

  /** The reference's partitioner: mmh3.hash(key) % n, with Python's
    * floored-modulo semantics (result always in [0, n)). */
  def partition(key: String, numPartitions: Int): Int =
    java.lang.Math.floorMod(hash32(key), numPartitions)
}
