package graft.codec

import java.nio.ByteBuffer

/** Time-series chunk compression (north_rule): delta-of-delta timestamps +
  * Gorilla XOR values (Pelkonen et al., "Gorilla: A Fast, Scalable,
  * In-Memory Time Series Database", VLDB 2015 — public paper; clean-room
  * implementation). One chunk = one (series, window) run of points sorted
  * ascending by timestamp; encodes to a byte array stored in a BinaryType
  * column.
  *
  * Layout: [int32 n][int64 ts0][float64 v0][bitstream ...] where the
  * bitstream carries (n−1) timestamp tokens then interleaved? No —
  * timestamps and values are interleaved per point, exactly like the paper,
  * so decode is a single pass.
  *
  * Timestamp tokens (delta-of-delta D):
  *   '0'                      D == 0
  *   '10'  + 7  bits          D ∈ [−63, 64]
  *   '110' + 9  bits          D ∈ [−255, 256]
  *   '1110'+ 12 bits          D ∈ [−2047, 2048]
  *   '1111'+ 64 bits          otherwise (raw)
  * (the first delta is encoded as a token too, against an implicit previous
  * delta of 0)
  *
  * Value tokens (XOR with previous value's bits):
  *   '0'                      XOR == 0
  *   '10' + bits              XOR fits in the previous (leading, length) window
  *   '11' + 6b leading + 6b length + bits   new window
  */
object ChunkCodec {

  def encode(ts: Array[Long], vs: Array[Double]): Array[Byte] = {
    require(ts.length == vs.length)
    val n = ts.length
    val head = ByteBuffer.allocate(4 + (if (n > 0) 16 else 0))
    head.putInt(n)
    if (n == 0) return head.array()
    head.putLong(ts(0))
    head.putDouble(vs(0))

    val w = new BitWriter
    var prevTs = ts(0)
    var prevDelta = 0L
    var prevBits = java.lang.Double.doubleToLongBits(vs(0))
    var prevLeading = -1
    var prevTrailing = -1
    var i = 1
    while (i < n) {
      // timestamp
      val delta = ts(i) - prevTs
      val dod = delta - prevDelta
      if (dod == 0L) w.writeBit(false)
      else if (dod >= -63 && dod <= 64) { w.writeBits(0x2, 2); w.writeBits(dod + 63, 7) }
      else if (dod >= -255 && dod <= 256) { w.writeBits(0x6, 3); w.writeBits(dod + 255, 9) }
      else if (dod >= -2047 && dod <= 2048) { w.writeBits(0xE, 4); w.writeBits(dod + 2047, 12) }
      else { w.writeBits(0xF, 4); w.writeBits(dod, 64) }
      prevDelta = delta
      prevTs = ts(i)

      // value
      val bits = java.lang.Double.doubleToLongBits(vs(i))
      val xor = bits ^ prevBits
      if (xor == 0L) w.writeBit(false)
      else {
        val leading = math.min(java.lang.Long.numberOfLeadingZeros(xor), 31)
        val trailing = java.lang.Long.numberOfTrailingZeros(xor)
        if (prevLeading >= 0 && leading >= prevLeading && trailing >= prevTrailing) {
          w.writeBits(0x2, 2)
          val len = 64 - prevLeading - prevTrailing
          w.writeBits(xor >>> prevTrailing, len)
        } else {
          w.writeBits(0x3, 2)
          val len = 64 - leading - trailing
          w.writeBits(leading.toLong, 6)
          w.writeBits(len.toLong, 6) // len ∈ [1,64]; 64 encodes as 0
          w.writeBits(xor >>> trailing, len)
          prevLeading = leading
          prevTrailing = trailing
        }
      }
      prevBits = bits
      i += 1
    }
    val stream = w.toBytes
    val out = ByteBuffer.allocate(head.capacity() + stream.length)
    out.put(head.array())
    out.put(stream)
    out.array()
  }

  def decode(chunk: Array[Byte]): (Array[Long], Array[Double]) = {
    val buf = ByteBuffer.wrap(chunk)
    val n = buf.getInt
    val ts = new Array[Long](n)
    val vs = new Array[Double](n)
    if (n == 0) return (ts, vs)
    ts(0) = buf.getLong
    vs(0) = buf.getDouble

    val r = new BitReader(java.util.Arrays.copyOfRange(chunk, 20, chunk.length))
    var prevTs = ts(0)
    var prevDelta = 0L
    var prevBits = java.lang.Double.doubleToLongBits(vs(0))
    var prevLeading = 0
    var prevTrailing = 0
    var i = 1
    while (i < n) {
      // timestamp
      val dod =
        if (!r.readBit()) 0L
        else if (!r.readBit()) r.readBits(7) - 63
        else if (!r.readBit()) r.readBits(9) - 255
        else if (!r.readBit()) r.readBits(12) - 2047
        else r.readBits(64)
      prevDelta += dod
      prevTs += prevDelta
      ts(i) = prevTs

      // value
      if (r.readBit()) {
        if (r.readBit()) {
          prevLeading = r.readBits(6).toInt
          val lenBits = r.readBits(6).toInt
          val len = if (lenBits == 0) 64 else lenBits
          prevTrailing = 64 - prevLeading - len
          prevBits ^= r.readBits(len) << prevTrailing
        } else {
          val len = 64 - prevLeading - prevTrailing
          prevBits ^= r.readBits(len) << prevTrailing
        }
      }
      vs(i) = java.lang.Double.longBitsToDouble(prevBits)
      i += 1
    }
    (ts, vs)
  }
}
