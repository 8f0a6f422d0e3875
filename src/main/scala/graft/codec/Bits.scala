package graft.codec

import scala.collection.mutable.ArrayBuffer

/** Minimal MSB-first bit stream for the chunk codecs (pure Scala, no Spark).
  *
  * The writer accumulates into a Long and flushes whole BYTES — the round-1
  * bit-at-a-time form paid a shift + branch + append per bit (64 of them per
  * raw delta-of-delta token) on the bulk pack path. Stream layout is
  * bit-identical to the per-bit form: pending bits sit in the accumulator's
  * low positions with earlier bits higher, exactly the MSB-first order.
  */
final class BitWriter {
  private val bytes = ArrayBuffer.empty[Byte]
  private var cur = 0L // pending bits, < 8 after every write
  private var nBits = 0

  def writeBit(b: Boolean): Unit = writeBits(if (b) 1L else 0L, 1)

  /** write the lowest `n` bits of v, MSB first (n in 0..64) */
  def writeBits(v: Long, n: Int): Unit =
    if (n > 56) {
      // nBits < 8 + n ≤ 64 must hold for the single-shift fast path below;
      // split a wide token once (64-bit raw tokens are the only caller)
      writeBits(v >>> 32, n - 32)
      writeBits(v & 0xffffffffL, 32)
    } else if (n > 0) {
      cur = (cur << n) | (v & ((1L << n) - 1))
      nBits += n
      while (nBits >= 8) {
        bytes += ((cur >>> (nBits - 8)) & 0xffL).toByte
        nBits -= 8
      }
    }

  def toBytes: Array[Byte] = {
    val out = bytes.clone()
    if (nBits > 0) out += ((cur << (8 - nBits)) & 0xffL).toByte
    out.toArray
  }
}

/** Reader consumes up to a whole byte per loop iteration (the round-1 form
  * paid a bounds check + two shifts per BIT — 64 iterations per raw token on
  * the chunk_explode decode path). Past-end reads throw AIOOBE at exactly
  * the same bit position as the per-bit form: the first iteration touching
  * an out-of-range byte.
  */
final class BitReader(bytes: Array[Byte]) {
  private var pos = 0 // bit position

  def readBit(): Boolean = {
    val b = (bytes(pos >>> 3) >>> (7 - (pos & 7))) & 1
    pos += 1
    b == 1
  }

  /** read n bits MSB-first into the low bits of a Long (unsigned), n in 0..64 */
  def readBits(n: Int): Long = {
    var v = 0L
    var remaining = n
    while (remaining > 0) {
      val avail = 8 - (pos & 7) // bits left in the current byte
      val take = if (avail < remaining) avail else remaining
      val cur = bytes(pos >>> 3) & 0xff
      v = (v << take) | ((cur >>> (avail - take)) & ((1 << take) - 1))
      pos += take
      remaining -= take
    }
    v
  }
}
