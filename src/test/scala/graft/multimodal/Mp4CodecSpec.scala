package graft.multimodal

import graft.spark.SparkTestBase

/** REAL MP4 container-metadata path: ISO BMFF box walking (moov/mvhd/tkhd/
  * hdlr/stsz, v0 and v1 box versions, 'vide'-handler track selection over
  * an audio-first mux), mdat payload extraction (the stub's bitstream
  * boundary), loud rejection of garbage, and parsed≡declared metadata parity
  * over the whole synthetic corpus for every modality.
  */
class Mp4CodecSpec extends SparkTestBase {

  // shared hand-crafted-box helpers for the hostile-container tests
  private def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def rawBox(typ: String, payload: Array[Byte]) = be32(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  test("parseMeta: v0 boxes — timescale-1000 duration, 16.16 tkhd dims, stsz count") {
    val b = Mp4Codec.syntheticMp4(seed = 7, w = 48, h = 16, durationMs = 12000L, nSamples = 24L)
    assert(Mp4Codec.isMp4(b))
    val m = Mp4Codec.parseMeta(b)
    assert(m.width == 48 && m.height == 16, s"dims: $m")
    assert(m.durationMs == 12000L && m.timescale == 1000L, s"duration: $m")
    assert(m.nSamples == 24L, s"samples: $m")
  }

  test("parseMeta: v1 (64-bit) mvhd/tkhd parse identically") {
    val b = Mp4Codec.syntheticMp4(seed = 7, w = 32, h = 20, durationMs = 7000L, nSamples = 14L, v1Boxes = true)
    val m = Mp4Codec.parseMeta(b)
    assert(m.width == 32 && m.height == 20 && m.durationMs == 7000L && m.nSamples == 14L, s"$m")
  }

  test("parseMeta: audio-first mux — dims come from the 'vide' trak, never the first trak") {
    for (v1 <- Seq(false, true)) {
      val b = Mp4Codec.syntheticMp4(seed = 3, w = 40, h = 24, durationMs = 5000L, nSamples = 10L, audioTrackFirst = true, v1Boxes = v1)
      val m = Mp4Codec.parseMeta(b)
      assert(m.width == 40 && m.height == 24, s"audio trak's 0x0 dims must not win (v1=$v1): $m")
      assert(m.nSamples == 10L, s"stsz must come from the video trak (v1=$v1): $m")
    }
  }

  test("parseMeta rejects the all-ones 'unknown duration' sentinel in BOTH mvhd versions") {
    // v0: 0xFFFFFFFF parses as ~4.3e9 ticks — for timescale >= 4296 the ms
    // value is Int-plausible and would flow silently into MediaMeta; v1: -1
    // only trips the sign check incidentally. Both must reject BY NAME.
    for ((sentinelMs, v1) <- Seq((0xFFFFFFFFL, false), (-1L, true))) {
      val b = Mp4Codec.syntheticMp4(seed = 5, w = 16, h = 16, durationMs = sentinelMs, nSamples = 4L, v1Boxes = v1)
      val e = intercept[IllegalArgumentException](Mp4Codec.parseMeta(b))
      assert(e.getMessage.contains("unknown duration"), s"v1=$v1: wrong rejection: ${e.getMessage}")
    }
    // a real near-max v0 duration (one below the sentinel) still parses
    val ok = Mp4Codec.syntheticMp4(seed = 5, w = 16, h = 16, durationMs = 0xFFFFFFFEL, nSamples = 4L)
    assert(Mp4Codec.parseMeta(ok).durationMs == 0xFFFFFFFEL)
  }

  test("mdatPayload: exactly the seeded bitstream; pins the q25 oracle length formula") {
    for (seed <- Seq(2L, 8L, 14L, 511L, 512L, 767L)) {
      val b = Mp4Codec.syntheticMp4(seed, w = 16, h = 16, durationMs = 1000L, nSamples = 2L)
      val mdat = Mp4Codec.mdatPayload(b).get
      // the inlined DuckDB oracle for q25's mp4 stub leg computes
      // len = 256 + (doc_id % 512): a generator change must fail HERE first
      assert(mdat.length == 256 + (seed % 512).toInt, s"seed $seed: mdat ${mdat.length}")
      val exp = new Array[Byte](mdat.length)
      new scala.util.Random(seed).nextBytes(exp)
      assert(mdat.sameElements(exp), s"seed $seed: mdat bytes drifted")
      // FakeCodec's decode boundary: parseable MP4 → the mdat payload
      assert(MediaOps.FakeCodec.decode(b).sameElements(exp))
    }
    // non-MP4 bytes pass through FakeCodec.decode unchanged
    val raw = Array.tabulate[Byte](64)(_.toByte)
    assert(MediaOps.FakeCodec.decode(raw) eq raw)
  }

  test("parseMeta rejects loudly: garbage, truncated boxes, missing video trak") {
    intercept[IllegalArgumentException](Mp4Codec.parseMeta(Array.fill[Byte](64)(0x41)))
    val good = Mp4Codec.syntheticMp4(seed = 1, w = 16, h = 16, durationMs = 1000L, nSamples = 2L)
    // truncate inside moov: the declared box size overruns the bytes
    intercept[IllegalArgumentException](Mp4Codec.parseMeta(java.util.Arrays.copyOfRange(good, 0, 60)))
    // a file whose only trak is audio has no usable video metadata
    val audioOnly = {
      // build ftyp + moov(mvhd + soun trak) by synthesizing with an audio
      // trak first and chopping the video trak off is fragile — instead
      // synthesize with 0x0 video dims, which must ALSO reject (zeros are
      // not real dimensions)
      Mp4Codec.syntheticMp4(seed = 1, w = 0, h = 0, durationMs = 1000L, nSamples = 2L)
    }
    intercept[IllegalArgumentException](Mp4Codec.parseMeta(audioOnly))
  }

  test("short leaf boxes reject with IllegalArgumentException, never ArrayIndexOutOfBounds") {
    // hand-craft containers whose leaf box size is VALID for the container
    // walk but too short for the fields the leaf reads — pre-guard these
    // crashed with AIOOBE instead of the loud-reject contract's IAE
    val ftyp = rawBox("ftyp", "isom".getBytes("US-ASCII"))
    for (leaf <- Seq("mvhd", "tkhd", "hdlr", "stsz")) {
      val shortLeaf = if (leaf == "mvhd" || leaf == "tkhd") rawBox(leaf, Array.emptyByteArray)
        else rawBox(leaf, new Array[Byte](8))
      val container = leaf match {
        case "mvhd" => ftyp ++ rawBox("moov", shortLeaf)
        case "tkhd" => ftyp ++ rawBox("moov", rawBox("trak", shortLeaf))
        case _      => ftyp ++ rawBox("moov", rawBox("trak", rawBox("mdia", shortLeaf)))
      }
      val e = intercept[IllegalArgumentException](Mp4Codec.parseMeta(container))
      assert(e.getMessage.contains("too short") || e.getMessage.contains("without"),
        s"$leaf: expected the short-box reject, got: ${e.getMessage}")
    }
    // v1 flags with a v0-sized payload: the wider v1 fields must be guarded too
    val v1ShortMvhd = rawBox("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16))
    intercept[IllegalArgumentException](Mp4Codec.parseMeta(ftyp ++ rawBox("moov", v1ShortMvhd)))
    val v1ShortTkhd = rawBox("tkhd", Array[Byte](1, 0, 0, 7) ++ new Array[Byte](80))
    intercept[IllegalArgumentException](Mp4Codec.parseMeta(ftyp ++ rawBox("moov", rawBox("trak", v1ShortTkhd))))
  }

  test("hostile containers reject with IAE: largesize overflow, deep nesting") {
    val ftyp = rawBox("ftyp", "isom".getBytes("US-ASCII"))

    // 64-bit largesize near Long.MaxValue: p + boxSize wraps negative — the
    // naive bound check passed and the walker read from arbitrary offsets
    val be64max = Array[Byte](0x7f, -1, -1, -1, -1, -1, -1, -1)
    val overflow = ftyp ++ (be32(1) ++ "moov".getBytes("US-ASCII") ++ be64max) ++ new Array[Byte](64)
    intercept[IllegalArgumentException](Mp4Codec.parseMeta(overflow))
    assert(Mp4Codec.mdatPayload(overflow).isEmpty, "corrupt largesize must fall back to None, not walk wrapped offsets")

    // nesting bomb: 40 levels of container boxes must reject (depth gate),
    // never StackOverflowError
    val nestedMp4 = ftyp ++ (0 until 40).foldLeft(Array.emptyByteArray)((inner, _) => rawBox("moov", inner))
    val e = intercept[IllegalArgumentException](Mp4Codec.parseMeta(nestedMp4))
    assert(e.getMessage.contains("nesting"), e.getMessage)

    // a v1 64-bit duration whose *1000 ms conversion wraps mod 2^64
    // (0x4000000000000000 * 1000 ≡ 0) must reject, not parse as 0 ms
    val wrap = Mp4Codec.syntheticMp4(seed = 1, w = 16, h = 16,
      durationMs = 0x4000000000000000L, nSamples = 2L, v1Boxes = true)
    val e3 = intercept[IllegalArgumentException](Mp4Codec.parseMeta(wrap))
    assert(e3.getMessage.contains("overflows"), e3.getMessage)
  }

  test("extractMetadata: live byte parse equals the declared corpus metadata for EVERY modality") {
    val docs = MediaOps.syntheticMedia(spark, 60)
    val declared = docs.collect().map(d => d.doc_id -> ((d.mime, d.width, d.height, d.duration_ms))).toMap
    val parsed = MediaOps.extractMetadata(docs).collect()
    assert(parsed.length == 60)
    for (m <- parsed) {
      val (mime, w, h, dur) = declared(m.doc_id)
      assert(m.mime == mime)
      assert(
        m.width == w && m.height == h && m.duration_ms == dur,
        s"doc ${m.doc_id} ($mime): parsed (${m.width},${m.height},${m.duration_ms}) vs declared ($w,$h,$dur)"
      )
    }
    // all five parser branches really ran
    val mimes = parsed.map(_.mime).toSet
    assert(Set("image/png", "audio/wav", "video/mp4", "video/webm", "video/avi").subsetOf(mimes), s"$mimes")
  }
}
