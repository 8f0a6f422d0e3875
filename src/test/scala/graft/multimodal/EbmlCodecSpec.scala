package graft.multimodal

import graft.spark.SparkTestBase

/** REAL WebM/MKV container-metadata path: EBML element walking (Segment →
  * Info TimecodeScale/Duration, Tracks → TrackType-1 entry → Video
  * PixelWidth/PixelHeight, over audio-first muxes and streaming unknown-size
  * Segments), Cluster SimpleBlock payload extraction (the stub's bitstream
  * boundary), and loud rejection of garbage and hostile vints/floats —
  * mirroring Mp4CodecSpec structurally.
  */
class EbmlCodecSpec extends SparkTestBase {

  // hand-crafted-element helpers for the hostile-container tests (1- or
  // 2-byte size vints — the nesting bomb's payload grows past 127 bytes)
  private def vint(n: Int): Array[Byte] =
    if (n < 127) Array((0x80 | n).toByte)
    else { assert(n < 16383); Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte) }
  private def idb(id: Long): Array[Byte] = {
    val len = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2 else if (id <= 0xffffffL) 3 else 4
    Array.tabulate(len)(i => ((id >> (8 * (len - 1 - i))) & 0xff).toByte)
  }
  private def el(id: Long, p: Array[Byte]): Array[Byte] = idb(id) ++ vint(p.length) ++ p
  private def u(v: Long, len: Int): Array[Byte] = Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
  private def f64(d: Double): Array[Byte] = u(java.lang.Double.doubleToLongBits(d), 8)
  private val header = el(0x1A45DFA3L, Array.emptyByteArray)
  private def seg(p: Array[Byte]): Array[Byte] = el(0x18538067L, p)
  private def info(scale: Long, dur: Array[Byte]): Array[Byte] =
    el(0x1549A966L, el(0x2AD7B1L, u(scale, 3)) ++ el(0x4489L, dur))
  private def videoTracks(w: Int, h: Int): Array[Byte] =
    el(0x1654AE6BL, el(0xAEL, el(0x83L, u(1, 1)) ++ el(0xE0L, el(0xB0L, u(w, 2)) ++ el(0xBAL, u(h, 2)))))

  test("parseMeta: known-size Segment — default 1ms TimecodeScale, float Duration, Video dims") {
    val b = EbmlCodec.syntheticWebm(seed = 7, w = 48, h = 16, durationMs = 12000L)
    assert(EbmlCodec.isEbml(b))
    val m = EbmlCodec.parseMeta(b)
    assert(m == EbmlCodec.WebmMeta(48, 16, 12000L, 1000000L), s"$m")
  }

  test("parseMeta: audio-first mux and streaming unknown-size Segment parse identically") {
    for (openSeg <- Seq(false, true); audioFirst <- Seq(false, true)) {
      val b = EbmlCodec.syntheticWebm(seed = 3, w = 40, h = 24, durationMs = 5000L,
        audioTrackFirst = audioFirst, unknownSizeSegment = openSeg)
      val m = EbmlCodec.parseMeta(b)
      assert(m.width == 40 && m.height == 24 && m.durationMs == 5000L,
        s"audioFirst=$audioFirst openSeg=$openSeg: $m")
    }
  }

  test("clusterPayload: exactly the seeded bitstream; pins the q25 oracle length formula") {
    for (seed <- Seq(2L, 8L, 14L, 511L, 512L, 767L)) {
      val b = EbmlCodec.syntheticWebm(seed, w = 16, h = 16, durationMs = 1000L)
      val payload = EbmlCodec.clusterPayload(b).get
      // the inlined DuckDB oracle for q25's stub leg computes
      // len = 256 + (doc_id % 512): a generator change must fail HERE first
      assert(payload.length == 256 + (seed % 512).toInt, s"seed $seed: payload ${payload.length}")
      val exp = new Array[Byte](payload.length)
      new scala.util.Random(seed).nextBytes(exp)
      assert(payload.sameElements(exp), s"seed $seed: payload bytes drifted")
      // FakeCodec's decode boundary: parseable WebM → the SimpleBlock frame
      assert(MediaOps.FakeCodec.decode(b).sameElements(exp))
    }
    // corrupt/absent cluster falls back to None, and FakeCodec to the whole bytes
    val headersOnly = header ++ seg(info(1000000L, f64(5.0)) ++ videoTracks(4, 4))
    assert(EbmlCodec.clusterPayload(headersOnly).isEmpty)
    assert(MediaOps.FakeCodec.decode(headersOnly) eq headersOnly)
  }

  test("parseMeta rejects loudly: garbage, truncation, missing duration, no video track, zero dims") {
    intercept[IllegalArgumentException](EbmlCodec.parseMeta(Array.fill[Byte](64)(0x41)))
    val good = EbmlCodec.syntheticWebm(seed = 1, w = 16, h = 16, durationMs = 1000L)
    // truncate inside the Segment: the declared element size overruns
    intercept[IllegalArgumentException](EbmlCodec.parseMeta(java.util.Arrays.copyOfRange(good, 0, 40)))
    // Info without a Duration
    val noDur = header ++ seg(el(0x1549A966L, el(0x2AD7B1L, u(1000000L, 3))) ++ videoTracks(4, 4))
    val e1 = intercept[IllegalArgumentException](EbmlCodec.parseMeta(noDur))
    assert(e1.getMessage.contains("Duration"), e1.getMessage)
    // only an audio track (TrackType 2, no Video element)
    val audioOnly = header ++ seg(
      info(1000000L, f64(5.0)) ++ el(0x1654AE6BL, el(0xAEL, el(0x83L, u(2, 1))))
    )
    val e2 = intercept[IllegalArgumentException](EbmlCodec.parseMeta(audioOnly))
    assert(e2.getMessage.contains("video"), e2.getMessage)
    // 0x0 video dims are not real dimensions
    intercept[IllegalArgumentException](EbmlCodec.parseMeta(header ++ seg(info(1000000L, f64(5.0)) ++ videoTracks(0, 0))))
  }

  test("hostile vints/floats reject with IAE: unknown size off-Segment, zero lead byte, bad float width, nesting bomb") {
    // unknown-size Info: legal for Segment only — resynchronizing is a
    // heuristic the loud-reject contract forbids
    val openInfo = header ++ seg(idb(0x1549A966L) ++ Array(0xff.toByte) ++ videoTracks(4, 4))
    val e1 = intercept[IllegalArgumentException](EbmlCodec.parseMeta(openInfo))
    assert(e1.getMessage.contains("unknown-size"), e1.getMessage)
    // a zero size lead byte encodes a >8-byte vint — unparseable
    val zeroLead = header ++ seg(idb(0x1549A966L) ++ Array(0x00.toByte))
    val e2 = intercept[IllegalArgumentException](EbmlCodec.parseMeta(zeroLead))
    assert(e2.getMessage.contains("lead byte"), e2.getMessage)
    // a 5-byte Duration is neither an EBML float4 nor float8
    val badFloat = header ++ seg(info(1000000L, new Array[Byte](5)) ++ videoTracks(4, 4))
    val e3 = intercept[IllegalArgumentException](EbmlCodec.parseMeta(badFloat))
    assert(e3.getMessage.contains("width"), e3.getMessage)
    // nesting bomb: 40 nested Segments must reject loudly, never
    // StackOverflowError. Since the parent guards (a Segment descends only
    // at TOP level), the inner Segments are skipped by size and the reject
    // fires as missing metadata rather than at the depth gate — the gate
    // stays as defense-in-depth behind the guards
    val bomb = header ++ (0 until 40).foldLeft(Array.emptyByteArray)((inner, _) => seg(inner))
    val e4 = intercept[IllegalArgumentException](EbmlCodec.parseMeta(bomb))
    assert(e4.getMessage.contains("Info/Duration"), e4.getMessage)
  }

  test("hostile Duration values reject: NaN, negative, overflow, zero TimecodeScale") {
    def file(scale: Long, dur: Double) = header ++ seg(info(scale, f64(dur)) ++ videoTracks(4, 4))
    val e1 = intercept[IllegalArgumentException](EbmlCodec.parseMeta(file(1000000L, Double.NaN)))
    assert(e1.getMessage.contains("not a real"), e1.getMessage)
    intercept[IllegalArgumentException](EbmlCodec.parseMeta(file(1000000L, -5.0)))
    intercept[IllegalArgumentException](EbmlCodec.parseMeta(file(1000000L, Double.PositiveInfinity)))
    val e2 = intercept[IllegalArgumentException](EbmlCodec.parseMeta(file(1000000L, 1e300)))
    assert(e2.getMessage.contains("overflows"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](EbmlCodec.parseMeta(file(0L, 5.0)))
    assert(e3.getMessage.contains("positive"), e3.getMessage)
    // a real large-but-representable duration still parses
    assert(EbmlCodec.parseMeta(file(1000000L, 86400000.0)).durationMs == 86400000L)
  }
}
