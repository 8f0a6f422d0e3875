package graft.codec

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: encode ∘ decode = identity for monotone timestamps and
  * arbitrary doubles (incl. NaN/±Inf/−0.0); compression sanity on regular
  * series. (scalacheck driven directly — scalatestplus bridge isn't in the
  * offline cache.)
  */
class ChunkCodecSpec extends AnyFunSuite {

  private def roundtrip(ts: Array[Long], vs: Array[Double]): Boolean = {
    val (t2, v2) = ChunkCodec.decode(ChunkCodec.encode(ts, vs))
    t2.sameElements(ts) && v2.length == vs.length &&
    v2.zip(vs).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
    }
  }

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("roundtrip: empty and single point") {
    assert(roundtrip(Array.empty, Array.empty))
    assert(roundtrip(Array(1434880920L), Array(42.5)))
    assert(roundtrip(Array(0L), Array(Double.NaN)))
  }

  test("roundtrip: regular 60s series with constant values compresses well") {
    val n = 1000
    val ts = Array.tabulate(n)(i => 1434880920L + i * 60L)
    val vs = Array.fill(n)(100.0)
    val chunk = ChunkCodec.encode(ts, vs)
    assert(roundtrip(ts, vs))
    // dod==0 and xor==0 after the first point: 2 bits/point + 20B header
    assert(chunk.length < 20 + (n / 4) + 2, s"chunk ${chunk.length}B for $n points")
  }

  test("property: roundtrip arbitrary monotone ts + arbitrary doubles") {
    val genValue: Gen[Double] = Gen.oneOf(
      Gen.choose(-1e12, 1e12),
      Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, -0.0, 0.0, Double.MinPositiveValue)
    )
    val genSeries = for {
      n <- Gen.choose(0, 300)
      start <- Gen.choose(0L, 2000000000L)
      deltas <- Gen.listOfN(n, Gen.choose(1L, 100000L))
      vs <- Gen.listOfN(n, genValue)
    } yield {
      val ts = deltas.scanLeft(start)(_ + _).tail.toArray
      (ts, vs.toArray)
    }
    checkProp(Prop.forAll(genSeries) { case (ts, vs) => roundtrip(ts, vs) })
  }

  test("property: extreme delta-of-deltas (raw 64-bit path)") {
    val gen = for {
      n <- Gen.choose(2, 50)
      deltas <- Gen.listOfN(n, Gen.oneOf(Gen.choose(1L, 10L), Gen.choose(1L, Long.MaxValue / 1000)))
    } yield deltas.scanLeft(1000L)(_ + _).toArray
    checkProp(Prop.forAll(gen) { ts => roundtrip(ts, Array.fill(ts.length)(1.5)) })
  }

  test("property: byte-buffered BitWriter streams are identical to the per-bit form") {
    // the per-bit reference, inlined: the production writer now flushes
    // whole bytes from a Long accumulator — the stream must not move a bit
    final class RefWriter {
      private val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      private var cur = 0; private var n = 0
      def writeBits(v: Long, w: Int): Unit = {
        var i = w - 1
        while (i >= 0) {
          cur = (cur << 1) | (((v >>> i) & 1L).toInt); n += 1
          if (n == 8) { bytes += cur.toByte; cur = 0; n = 0 }
          i -= 1
        }
      }
      def toBytes: Array[Byte] = {
        val out = bytes.clone(); if (n > 0) out += (cur << (8 - n)).toByte; out.toArray
      }
    }
    val gen = Gen.listOf(for {
      w <- Gen.choose(1, 64)
      v <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (v, w))
    checkProp(Prop.forAll(gen) { tokens =>
      val fast = new BitWriter
      val ref = new RefWriter
      for ((v, w) <- tokens) { fast.writeBits(v, w); ref.writeBits(v, w) }
      java.util.Arrays.equals(fast.toBytes, ref.toBytes)
    })
  }

  test("property: byte-at-a-time BitReader decodes identically to the per-bit form") {
    // the per-bit reference: production readBits now consumes up to a byte
    // per iteration — every token of every width must read the same value
    // from the same stream, leaving the cursor at the same bit
    final class RefReader(bytes: Array[Byte]) {
      private var pos = 0
      def readBits(n: Int): Long = {
        var v = 0L; var i = 0
        while (i < n) {
          v = (v << 1) | (((bytes(pos >>> 3) >>> (7 - (pos & 7))) & 1).toLong)
          pos += 1; i += 1
        }
        v
      }
    }
    val gen = Gen.listOf(for {
      w <- Gen.choose(1, 64)
      v <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (v, w))
    checkProp(Prop.forAll(gen) { tokens =>
      val w = new BitWriter
      for ((v, width) <- tokens) w.writeBits(v, width)
      val bytes = w.toBytes
      val fast = new BitReader(bytes)
      val ref = new RefReader(bytes)
      tokens.forall { case (_, width) => fast.readBits(width) == ref.readBits(width) }
    })
  }

}
