package graft.codec

import scala.collection.mutable.ArrayBuffer

/** Minimal MSB-first bit stream for the chunk codecs (pure Scala, no Spark). */
final class BitWriter {
  private val bytes = ArrayBuffer.empty[Byte]
  private var cur = 0
  private var nBits = 0

  def writeBit(b: Boolean): Unit = {
    cur = (cur << 1) | (if (b) 1 else 0)
    nBits += 1
    if (nBits == 8) { bytes += cur.toByte; cur = 0; nBits = 0 }
  }

  /** write the lowest `n` bits of v, MSB first */
  def writeBits(v: Long, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) {
      writeBit(((v >>> i) & 1L) == 1L)
      i -= 1
    }
  }

  def toBytes: Array[Byte] = {
    val out = bytes.clone()
    if (nBits > 0) out += (cur << (8 - nBits)).toByte
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
