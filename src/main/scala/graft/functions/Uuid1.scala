package graft.functions

import java.util.concurrent.atomic.AtomicLong

/** RFC 4122 version-1 (time-based) UUID generation, matching the semantics
  * of Python's `uuid.uuid1()` that the reference injects as the `guid`
  * header on every produced message (reference:
  * fluvii/components/producer/producer.py:92-93).
  *
  * Layout (RFC 4122 §4.1.2): a 60-bit timestamp in 100-ns intervals since
  * 1582-10-15 split across time_low/time_mid/time_hi, version nibble 0b0001,
  * variant bits 0b10, a 14-bit clock sequence, and a 48-bit node.
  *
  * Python-compatible behaviors reproduced here:
  *   - the timestamp is bumped by one tick when the wall clock has not
  *     advanced past the previously issued timestamp, so consecutive calls
  *     are strictly monotonic (CPython `uuid.py` `_last_timestamp` logic);
  *   - the node is the hardware MAC when one is readable, else 48 random
  *     bits with the multicast bit set (CPython `uuid._random_getnode`),
  *     which can never collide with a real MAC.
  *
  * Deliberate divergence: the clock sequence is random-initialized ONCE
  * PER PROCESS (RFC 4122 §4.1.5's recommendation), whereas CPython's
  * `uuid1()` draws a fresh 14-bit clock_seq on every call. Combined with
  * the monotonic timestamp bump this gives strictly stronger in-process
  * uniqueness than CPython (a per-call draw can collide across calls in
  * the same 100-ns tick; a per-process constant cannot, because the
  * timestamp bump already disambiguates same-tick calls).
  *
  * The JVM offers only `randomUUID()` (v4), so the bit assembly is manual.
  * Generation is lock-free: one CAS loop on the packed (timestamp) counter.
  */
object Uuid1 {

  /** Offset between the Gregorian epoch (1582-10-15T00:00:00Z) and the Unix
    * epoch, in 100-ns intervals — the constant CPython calls
    * `0x01b21dd213814000`. */
  private val GregorianToUnix100Ns = 0x01b21dd213814000L

  /** 48-bit node id: first readable non-loopback hardware address, else
    * random-with-multicast-bit (never a real MAC). Resolved once. */
  val node: Long = {
    val fromMac =
      try {
        import scala.jdk.CollectionConverters._
        java.net.NetworkInterface.getNetworkInterfaces match {
          case null => None
          case ifs =>
            ifs.asScala
              .filterNot(i => i.isLoopback)
              .flatMap(i => Option(i.getHardwareAddress))
              .collectFirst { case mac if mac.length == 6 =>
                mac.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
              }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    fromMac.getOrElse {
      (new java.security.SecureRandom().nextLong() & 0xffffffffffffL) | (1L << 40)
    }
  }

  /** 14-bit clock sequence, random per process (RFC 4122 §4.1.5). */
  private val clockSeq: Int =
    new java.security.SecureRandom().nextInt() & 0x3fff

  /** Last issued 60-bit timestamp, for the monotonicity bump. */
  private val lastTimestamp = new AtomicLong(0L)

  /** Current time as 100-ns intervals since the Gregorian epoch.
    * `System.currentTimeMillis` only ticks every ms; like CPython (whose
    * `time_ns` similarly under-resolves 100 ns), the sub-tick uniqueness
    * comes from the monotonic bump, not the clock. */
  private def now100Ns(): Long =
    System.currentTimeMillis() * 10000L + GregorianToUnix100Ns

  /** Next strictly-monotonic timestamp: wall clock if it advanced, else
    * previous + 1 tick. */
  private def nextTimestamp(): Long = {
    while (true) {
      val prev = lastTimestamp.get()
      val ts = math.max(now100Ns(), prev + 1)
      if (lastTimestamp.compareAndSet(prev, ts)) return ts
    }
    throw new IllegalStateException("unreachable")
  }

  /** A fresh version-1 UUID. */
  def next(): java.util.UUID = fromParts(nextTimestamp(), clockSeq, node)

  /** Deterministic assembly from explicit fields — the testable core. */
  def fromParts(timestamp100Ns: Long, clockSeq: Int, node: Long): java.util.UUID = {
    val ts = timestamp100Ns & 0x0fffffffffffffffL // 60 bits
    val timeLow = ts & 0xffffffffL
    val timeMid = (ts >>> 32) & 0xffffL
    val timeHi = (ts >>> 48) & 0x0fffL
    val msb = (timeLow << 32) | (timeMid << 16) | 0x1000L | timeHi
    val lsb = (0x8000L | (clockSeq & 0x3fffL)) << 48 | (node & 0xffffffffffffL)
    new java.util.UUID(msb, lsb)
  }

  /** The 60-bit timestamp back out of a v1 UUID (inverse of [[fromParts]];
    * what Python exposes as `UUID.time`). */
  def timestampOf(u: java.util.UUID): Long = {
    val msb = u.getMostSignificantBits
    val timeLow = (msb >>> 32) & 0xffffffffL
    val timeMid = (msb >>> 16) & 0xffffL
    val timeHi = msb & 0x0fffL
    (timeHi << 48) | (timeMid << 32) | timeLow
  }

  /** Unix epoch millis encoded in a v1 UUID's timestamp. */
  def unixMillisOf(u: java.util.UUID): Long =
    (timestampOf(u) - GregorianToUnix100Ns) / 10000L
}
