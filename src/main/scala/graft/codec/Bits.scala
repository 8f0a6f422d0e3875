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

final class BitReader(bytes: Array[Byte]) {
  private var pos = 0

  def readBit(): Boolean = {
    val byteIdx = pos >>> 3
    val bitIdx = 7 - (pos & 7)
    pos += 1
    ((bytes(byteIdx) >>> bitIdx) & 1) == 1
  }

  /** read n bits MSB-first into the low bits of a Long (unsigned) */
  def readBits(n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) {
      v = (v << 1) | (if (readBit()) 1L else 0L)
      i += 1
    }
    v
  }
}
