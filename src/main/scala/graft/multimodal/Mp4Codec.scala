package graft.multimodal

import java.nio.ByteBuffer

/** REAL metadata path for the MP4 (ISO BMFF) container: box walking is plain
  * big-endian byte work, so duration, timescale, video-track dimensions and
  * sample count parse offline even though the H.264/VP9 BITSTREAM inside
  * `mdat` has no offline decoder (that part stays on `MediaOps.FakeCodec`,
  * now scoped to features/frame-payloads only). Mirrors what `VideoCodec`
  * does for AVI: container real, everything a pure function of the bytes,
  * executor-safe at any parallelism.
  *
  * Parsed boxes: `moov/mvhd` (v0+v1: timescale, duration), per-`trak`
  * `tkhd` (v0+v1: 16.16 fixed-point width/height), `mdia/hdlr` (the 'vide'
  * handler SELECTS the video track — an audio-first mux must not donate its
  * 0×0 tkhd dims), `stbl/stsz` (sample count), and top-level `mdat` (the
  * opaque bitstream payload handed to the stub). Unknown boxes are skipped
  * by their declared size; 64-bit `largesize` boxes are honored.
  */
object Mp4Codec {

  /** container metadata of the FIRST video ('vide' handler) track */
  final case class Mp4Meta(
      width: Int,
      height: Int,
      durationMs: Long,
      timescale: Long,
      nSamples: Long
  )

  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && fourcc(bytes, 4) == "ftyp"

  private def fourcc(b: Array[Byte], at: Int): String =
    new String(b, at, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) | ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)

  private def u64(b: Array[Byte], at: Int): Long =
    (u32(b, at) << 32) | u32(b, at + 4)

  /** parse container metadata; REJECTS loudly (missing moov/mvhd, no video
    * trak, truncated boxes) — silent zeros would read as real metadata
    * downstream, the same worst-failure-mode rule the AVI decoder applies.
    */
  def parseMeta(bytes: Array[Byte]): Mp4Meta = {
    require(isMp4(bytes), "not an MP4 (ftyp box missing)")
    var timescale = 0L
    var duration = -1L
    var vW, vH = 0
    var vSamples = 0L
    // per-trak accumulation: hdlr decides AFTER tkhd whether the dims count
    var trakW, trakH = 0
    var trakIsVideo = false
    var trakSamples = 0L

    def walk(from: Long, until: Long, depth: Int): Unit = {
      // a crafted file can nest container boxes arbitrarily deep — bound the
      // recursion so the reject is the contract's IAE, never StackOverflowError
      require(depth <= 32, s"MP4 box nesting deeper than 32 levels")
      var p = from
      while (p + 8 <= until) {
        val size32 = u32(bytes, p.toInt)
        val typ = fourcc(bytes, p.toInt + 4)
        val (boxSize, body) =
          if (size32 == 1L) { require(p + 16 <= until, s"truncated largesize box '$typ'"); (u64(bytes, p.toInt + 8), p + 16) }
          else if (size32 == 0L) (until - p, p + 8) // box extends to the end of its container
          else (size32, p + 8)
        // overflow-safe form: a hostile 64-bit largesize near Long.MaxValue
        // would wrap `p + boxSize` negative and sail past the naive check
        require(boxSize >= body - p && boxSize <= until - p, s"truncated MP4 box '$typ' at $p")
        val end = p + boxSize
        typ match {
          case "moov" | "mdia" | "minf" | "stbl" => walk(body, end, depth + 1)
          case "trak" =>
            trakW = 0; trakH = 0; trakIsVideo = false; trakSamples = 0L
            walk(body, end, depth + 1)
            if (trakIsVideo && vW == 0 && vH == 0) { vW = trakW; vH = trakH; vSamples = trakSamples }
          // every leaf guards its own minimum payload: the box-size require
          // above only proves the DECLARED size fits the container, not that
          // the payload carries the fields read below — a corrupt short leaf
          // must reject loudly (IllegalArgumentException), never
          // ArrayIndexOutOfBounds (same rule as the AVI walker's size gates)
          case "mvhd" =>
            val b = body.toInt
            val len = end - body
            require(len >= 20, s"mvhd box too short ($len bytes)")
            if ((bytes(b) & 0xff) == 1) {
              require(len >= 32, s"v1 mvhd box too short ($len bytes)")
              timescale = u32(bytes, b + 20); duration = u64(bytes, b + 24)
            } else { timescale = u32(bytes, b + 12); duration = u32(bytes, b + 16) }
            // all-ones duration is ISO BMFF's "unknown duration" SENTINEL, not
            // a real tick count. The v1 value (-1) happens to trip the sign
            // check below, but the v0 sentinel (0xFFFFFFFF) parses as ~4.3e9
            // ticks — for timescale >= 4296 that is a plausible ms value which
            // would flow silently into MediaMeta. Reject both EXPLICITLY: the
            // parser's contract is loud rejection, never plausible garbage.
            require(
              duration != 0xFFFFFFFFL && duration != -1L,
              "MP4 mvhd duration is the all-ones 'unknown duration' sentinel — no real duration to report"
            )
          case "tkhd" =>
            // width/height are 16.16 fixed point at the end of the box;
            // v1 carries 64-bit times/duration, shifting them by 12 bytes
            val b = body.toInt
            val len = end - body
            require(len >= 84, s"tkhd box too short ($len bytes)")
            val at = if ((bytes(b) & 0xff) == 1) { require(len >= 96, s"v1 tkhd box too short ($len bytes)"); b + 88 }
              else b + 76
            trakW = (u32(bytes, at) >>> 16).toInt
            trakH = (u32(bytes, at + 4) >>> 16).toInt
          case "hdlr" =>
            // version/flags(4) + pre_defined(4), then handler_type
            require(end - body >= 12, s"hdlr box too short (${end - body} bytes)")
            if (fourcc(bytes, body.toInt + 8) == "vide") trakIsVideo = true
          case "stsz" =>
            // version/flags(4) + sample_size(4) + sample_count(4)
            require(end - body >= 12, s"stsz box too short (${end - body} bytes)")
            trakSamples = u32(bytes, body.toInt + 8)
          case _ => () // ftyp, mdat, free, udta, other tracks' leaves
        }
        p = end
      }
    }
    walk(0L, bytes.length.toLong, 0)
    require(timescale > 0, "MP4 without a moov/mvhd timescale")
    require(duration >= 0, "MP4 without a moov/mvhd duration")
    // the ms conversion multiplies by 1000 BEFORE dividing — a hostile v1
    // 64-bit duration would wrap the Long product into plausible garbage
    // (0x4000000000000000 * 1000 ≡ 0 mod 2^64); reject loudly instead
    require(duration <= Long.MaxValue / 1000, s"MP4 duration $duration overflows the ms conversion")
    require(vW > 0 && vH > 0, "MP4 without a video ('vide' handler) trak carrying tkhd dimensions")
    Mp4Meta(vW, vH, duration * 1000L / timescale, timescale, vSamples)
  }

  /** the first top-level `mdat` payload — the actual (undecodable offline)
    * bitstream bytes, which is what the feature/frame STUB should fold
    * instead of re-hashing container headers. None when the file has no
    * mdat (headers-only).
    */
  def mdatPayload(bytes: Array[Byte]): Option[Array[Byte]] = {
    var p = 0L
    val until = bytes.length.toLong
    while (p + 8 <= until) {
      val size32 = u32(bytes, p.toInt)
      val typ = fourcc(bytes, p.toInt + 4)
      val (boxSize, body) =
        if (size32 == 1L && p + 16 <= until) (u64(bytes, p.toInt + 8), p + 16)
        else if (size32 == 0L) (until - p, p + 8)
        else (size32, p + 8)
      // overflow-safe (see parseMeta): corrupt → caller falls back to whole bytes
      if (boxSize < body - p || boxSize > until - p) return None
      if (typ == "mdat") return Some(java.util.Arrays.copyOfRange(bytes, body.toInt, (p + boxSize).toInt))
      p += boxSize
    }
    None
  }

  // ---- synthetic writer (tests/fixtures — no external data) ------------------

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
    bb.array()
  }

  private val unityMatrix: Array[Byte] = {
    val bb = ByteBuffer.allocate(36)
    bb.putInt(0x00010000).putInt(0).putInt(0)
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
    bb.array()
  }

  private def mvhd(timescale: Long, duration: Long, v1: Boolean): Array[Byte] = {
    val bb = ByteBuffer.allocate(if (v1) 112 else 100)
    bb.put((if (v1) 1 else 0).toByte).put(new Array[Byte](3)) // version + flags
    if (v1) bb.putLong(0L).putLong(0L).putInt(timescale.toInt).putLong(duration)
    else bb.putInt(0).putInt(0).putInt(timescale.toInt).putInt(duration.toInt)
    bb.putInt(0x00010000).putShort(0x0100.toShort).put(new Array[Byte](10)) // rate, volume, reserved
    bb.put(unityMatrix).put(new Array[Byte](24)).putInt(2) // pre_defined, next_track_ID
    box("mvhd", bb.array())
  }

  private def tkhd(trackId: Int, duration: Long, w: Int, h: Int, v1: Boolean): Array[Byte] = {
    val bb = ByteBuffer.allocate(if (v1) 96 else 84)
    bb.put((if (v1) 1 else 0).toByte).put(Array[Byte](0, 0, 7)) // flags: enabled+in movie+in preview
    if (v1) bb.putLong(0L).putLong(0L).putInt(trackId).putInt(0).putLong(duration)
    else bb.putInt(0).putInt(0).putInt(trackId).putInt(0).putInt(duration.toInt)
    bb.put(new Array[Byte](8)).putShort(0).putShort(0).putShort(0).putShort(0) // reserved, layer, alt, volume, reserved
    bb.put(unityMatrix).putInt(w << 16).putInt(h << 16)
    box("tkhd", bb.array())
  }

  private def hdlr(handler: String): Array[Byte] = {
    val name = (handler + " handler ").getBytes("US-ASCII")
    val bb = ByteBuffer.allocate(24 + name.length)
    bb.putInt(0).putInt(0).put(handler.getBytes("US-ASCII")).put(new Array[Byte](12)).put(name)
    box("hdlr", bb.array())
  }

  private def mdhd(timescale: Long, duration: Long): Array[Byte] = {
    val bb = ByteBuffer.allocate(24)
    bb.putInt(0).putInt(0).putInt(0).putInt(timescale.toInt).putInt(duration.toInt)
    bb.putShort(0x55c4.toShort).putShort(0) // language "und", pre_defined
    box("mdhd", bb.array())
  }

  private def stsz(nSamples: Long): Array[Byte] = {
    val bb = ByteBuffer.allocate(12)
    bb.putInt(0).putInt(0).putInt(nSamples.toInt) // version/flags, sample_size (0 = varied), count
    box("stsz", bb.array())
  }

  private def trak(trackId: Int, handler: String, duration: Long, w: Int, h: Int, nSamples: Long, v1: Boolean): Array[Byte] =
    box(
      "trak",
      tkhd(trackId, duration, w, h, v1) ++
        box("mdia", mdhd(1000L, duration) ++ hdlr(handler) ++ box("minf", box("stbl", stsz(nSamples))))
    )

  /** deterministic synthetic MP4: a REAL ISO BMFF container (ftyp + moov
    * with mvhd/tkhd/hdlr/stsz + mdat) whose `mdat` carries seeded opaque
    * bytes standing in for the H.264 bitstream — the container metadata is
    * genuine and parseable, only the pixels are fake. Timescale is 1000 so
    * declared duration is exactly `durationMs`. `audioTrackFirst` muxes a
    * 0×0 'soun' trak as track 1 (dims must come from the 'vide' trak, not
    * the first trak); `v1Boxes` writes 64-bit mvhd/tkhd versions.
    */
  def syntheticMp4(
      seed: Long,
      w: Int,
      h: Int,
      durationMs: Long,
      nSamples: Long,
      audioTrackFirst: Boolean = false,
      v1Boxes: Boolean = false
  ): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ ByteBuffer.allocate(4).putInt(0x200).array() ++ "isomiso2mp41".getBytes("US-ASCII"))
    val rnd = new scala.util.Random(seed)
    val bitstream = new Array[Byte](256 + (seed % 512).toInt.abs)
    rnd.nextBytes(bitstream)
    val mdat = box("mdat", bitstream)
    val tracks =
      (if (audioTrackFirst) trak(1, "soun", durationMs, 0, 0, 0L, v1Boxes) else Array.emptyByteArray) ++
        trak(if (audioTrackFirst) 2 else 1, "vide", durationMs, w, h, nSamples, v1Boxes)
    val moov = box("moov", mvhd(1000L, durationMs, v1Boxes) ++ tracks)
    ftyp ++ moov ++ mdat
  }
}
