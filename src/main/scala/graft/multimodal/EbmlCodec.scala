package graft.multimodal

/** REAL metadata path for the EBML (WebM/MKV, Matroska) container: element
  * walking is plain vint + big-endian byte work, so duration, timecode
  * scale and video-track dimensions parse offline even though the VP8/VP9
  * BITSTREAM inside the Clusters has no offline decoder (that part stays on
  * `MediaOps.FakeCodec`, scoped to bitstream features/frame-payloads only).
  * Mirrors `Mp4Codec` (ISO BMFF) structurally: container real, everything a
  * pure function of the bytes, executor-safe at any parallelism.
  *
  * Parsed elements: `Segment → Info` (TimecodeScale, Duration) and
  * `Segment → Tracks → TrackEntry` (TrackType selects the video track — an
  * audio-first mux must not be mistaken for a video one) `→ Video`
  * (PixelWidth/PixelHeight); `Segment → Cluster → SimpleBlock` yields the
  * opaque bitstream payload handed to the stub. Unknown elements are
  * skipped by their declared size. The UNKNOWN-size vint (all data bits
  * set) is honored for `Segment` only — the one element real muxers
  * routinely stream with open size; anywhere else it is rejected loudly
  * (skipping an unknown-size element requires resynchronizing on sibling
  * ids, a heuristic this parser's loud-reject contract forbids). Since
  * Info and Tracks precede the Clusters in any compliant mux, the walk
  * stops as soon as the metadata is complete, so an unknown-size trailing
  * Cluster never trips the reject.
  */
object EbmlCodec {

  /** container metadata of the FIRST video (TrackType 1) track */
  final case class WebmMeta(
      width: Int,
      height: Int,
      durationMs: Long,
      timecodeScaleNs: Long
  )

  // conventional element ids (stored as written, marker bits included)
  private val EbmlHeader = 0x1A45DFA3L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimecodeScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackNumber = 0xD7L
  private val TrackType = 0x83L
  private val CodecId = 0x86L
  private val VideoEl = 0xE0L
  private val AudioEl = 0xE1L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val SamplingFrequency = 0xB5L
  private val Cluster = 0x1F43B675L
  private val Timecode = 0xE7L
  private val SimpleBlock = 0xA3L
  private val DocType = 0x4282L

  def isEbml(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0x1A && (bytes(1) & 0xff) == 0x45 &&
      (bytes(2) & 0xff) == 0xDF && (bytes(3) & 0xff) == 0xA3

  // ---- vint readers -----------------------------------------------------------
  // An EBML element is ID-vint + SIZE-vint + payload. The ID keeps its
  // length-marker bits (ids are conventionally quoted that way, e.g.
  // 0x1A45DFA3); the SIZE strips them. Both reject loudly on a zero lead
  // byte (no marker — unparseable) and on running past the container.

  /** @return (id with marker bits, encoded length 1–4) */
  private def readId(b: Array[Byte], at: Long, until: Long): (Long, Int) = {
    require(at < until, s"EBML id past the end at $at")
    val b0 = b(at.toInt) & 0xff
    val len =
      if ((b0 & 0x80) != 0) 1
      else if ((b0 & 0x40) != 0) 2
      else if ((b0 & 0x20) != 0) 3
      else if ((b0 & 0x10) != 0) 4
      else throw new IllegalArgumentException(s"invalid EBML id lead byte 0x${b0.toHexString} at $at")
    require(at + len <= until, s"truncated EBML id at $at")
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b((at + i).toInt) & 0xffL); i += 1 }
    (v, len)
  }

  /** @return (size, encoded length 1–8); size == -1 encodes UNKNOWN (all
    *         data bits set — legal on Segment only, the caller enforces)
    */
  private def readSize(b: Array[Byte], at: Long, until: Long): (Long, Int) = {
    require(at < until, s"EBML size past the end at $at")
    val b0 = b(at.toInt) & 0xff
    require(b0 != 0, s"invalid EBML size lead byte 0x00 at $at (length > 8 unsupported)")
    val len = 8 - (31 - Integer.numberOfLeadingZeros(b0)) // marker bit position → vint length
    require(at + len <= until, s"truncated EBML size at $at")
    var v = (b0 & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b((at + i).toInt) & 0xffL); i += 1 }
    val unknown = (1L << (7 * len)) - 1
    (if (v == unknown) -1L else v, len)
  }

  /** unsigned integer leaf (0–8 bytes big-endian; empty = 0 per EBML) */
  private def uintVal(b: Array[Byte], body: Long, end: Long): Long = {
    val len = end - body
    require(len <= 8, s"EBML uint wider than 8 bytes ($len)")
    var v = 0L
    var i = 0L
    while (i < len) { v = (v << 8) | (b((body + i).toInt) & 0xffL); i += 1 }
    v
  }

  /** float leaf (0, 4 or 8 bytes per EBML; anything else is corrupt) */
  private def floatVal(b: Array[Byte], body: Long, end: Long): Double = (end - body) match {
    case 0 => 0.0
    case 4 => java.lang.Float.intBitsToFloat(uintVal(b, body, end).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uintVal(b, body, end))
    case n => throw new IllegalArgumentException(s"EBML float of illegal width $n")
  }

  /** parse container metadata; REJECTS loudly (missing Segment/Info/Tracks,
    * no video track dimensions, truncated elements, hostile vints) — silent
    * zeros would read as real metadata downstream, the same
    * worst-failure-mode rule the MP4/AVI walkers apply.
    */
  def parseMeta(bytes: Array[Byte]): WebmMeta = {
    require(isEbml(bytes), "not an EBML container (0x1A45DFA3 magic missing)")
    var timescale = 1000000L // Matroska default: 1 ms per timecode tick
    var durationTicks = -1.0
    var haveDuration = false
    var vW, vH = 0
    // per-TrackEntry accumulation: TrackType decides whether the dims count
    var trakW, trakH = 0
    var trakType = -1L

    def complete = haveDuration && vW > 0 && vH > 0

    def walk(from: Long, until: Long, depth: Int, parent: Long): Unit = {
      require(depth <= 32, "EBML nesting deeper than 32 levels")
      var p = from
      while (p < until && !(parent == Segment && complete)) {
        val (id, idLen) = readId(bytes, p, until)
        val (size0, szLen) = readSize(bytes, p + idLen, until)
        val body = p + idLen + szLen
        val size =
          if (size0 >= 0) size0
          else if (id == Segment) until - body // streaming mux: Segment open to EOF
          else throw new IllegalArgumentException(s"unknown-size EBML element 0x${id.toHexString} (only Segment may stream)")
        require(size <= until - body, s"truncated EBML element 0x${id.toHexString} at $p")
        val end = body + size
        id match {
          // container cases are parent-guarded like the leaves: a decoy
          // Info/Tracks/TrackEntry nested in the WRONG parent must be
          // skipped by size like any unknown element, or its inner leaves
          // (a junk Duration, decoy dims) would silently overwrite the real
          // metadata — the plausible-garbage failure mode this parser's
          // contract forbids. A mis-parented Segment falls through to skip
          // too; a nesting bomb then rejects via the missing-Info check.
          case Segment if parent == 0L => walk(body, end, depth + 1, id)
          case Info | Tracks if parent == Segment => walk(body, end, depth + 1, id)
          case TrackEntry if parent == Tracks =>
            trakW = 0; trakH = 0; trakType = -1L
            walk(body, end, depth + 1, id)
            if (trakType == 1L && vW == 0 && vH == 0) { vW = trakW; vH = trakH }
          case VideoEl if parent == TrackEntry => walk(body, end, depth + 1, id)
          case TimecodeScale if parent == Info => timescale = uintVal(bytes, body, end)
          case Duration if parent == Info =>
            durationTicks = floatVal(bytes, body, end); haveDuration = true
          case TrackType if parent == TrackEntry => trakType = uintVal(bytes, body, end)
          case PixelWidth if parent == VideoEl =>
            val w = uintVal(bytes, body, end)
            require(w <= Int.MaxValue, s"EBML PixelWidth $w outside Int range")
            trakW = w.toInt
          case PixelHeight if parent == VideoEl =>
            val h = uintVal(bytes, body, end)
            require(h <= Int.MaxValue, s"EBML PixelHeight $h outside Int range")
            trakH = h.toInt
          case _ => () // EBML header, CodecID, Clusters, other tracks' leaves
        }
        p = end
      }
    }
    walk(0L, bytes.length.toLong, 0, 0L)
    require(timescale > 0, "EBML without a positive Info/TimecodeScale")
    require(haveDuration, "EBML without an Info/Duration")
    require(
      !durationTicks.isNaN && !durationTicks.isInfinite && durationTicks >= 0,
      s"EBML Duration $durationTicks is not a real non-negative tick count"
    )
    // ms conversion in double space, overflow-guarded BEFORE the Long round:
    // a hostile float Duration times a hostile timescale is unbounded
    val ms = durationTicks * timescale / 1e6
    require(ms <= Long.MaxValue.toDouble / 2, s"EBML duration ${ms}ms overflows")
    require(vW > 0 && vH > 0, "EBML without a video (TrackType 1) track carrying Video dimensions")
    WebmMeta(vW, vH, math.round(ms), timescale)
  }

  /** the first Cluster's first SimpleBlock frame payload — the actual
    * (undecodable offline) bitstream bytes, which is what the feature/frame
    * STUB should fold instead of re-hashing container headers. None when
    * absent or corrupt (caller falls back to the whole bytes — same
    * contract as `Mp4Codec.mdatPayload`).
    */
  def clusterPayload(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      def find(from: Long, until: Long, depth: Int, target: Long, streamable: Boolean): Option[(Long, Long)] = {
        if (depth > 32) return None
        var p = from
        while (p < until) {
          val (id, idLen) = readId(bytes, p, until)
          val (size0, szLen) = readSize(bytes, p + idLen, until)
          val body = p + idLen + szLen
          val size =
            if (size0 >= 0) size0
            else if (streamable && (id == Segment || id == Cluster)) until - body
            else return None
          if (size > until - body) return None
          if (id == target) return Some((body, body + size))
          p = body + size
        }
        None
      }
      for {
        (segB, segE) <- find(0L, bytes.length.toLong, 0, Segment, streamable = true)
        (cluB, cluE) <- find(segB, segE, 1, Cluster, streamable = true)
        (blkB, blkE) <- find(cluB, cluE, 2, SimpleBlock, streamable = false)
      } yield {
        // SimpleBlock framing: track-number vint + 2-byte timecode + flags
        val (_, tLen) = readSize(bytes, blkB, blkE)
        val frameAt = blkB + tLen + 3
        require(frameAt <= blkE, "SimpleBlock shorter than its framing")
        java.util.Arrays.copyOfRange(bytes, frameAt.toInt, blkE.toInt)
      }
    } catch { case _: IllegalArgumentException => None }

  // ---- synthetic writer (tests/fixtures — no external data) ------------------

  private def encodeId(id: Long): Array[Byte] = {
    val len = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2 else if (id <= 0xffffffL) 3 else 4
    Array.tabulate(len)(i => ((id >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  /** minimal-length size vint; -1 writes the 8-byte UNKNOWN-size form */
  private def encodeSize(size: Long): Array[Byte] =
    if (size < 0) Array[Byte](0x01) ++ Array.fill(7)(0xff.toByte)
    else {
      var len = 1
      while (size >= (1L << (7 * len)) - 1) len += 1 // all-ones is reserved for UNKNOWN — never emit it as a real size
      val v = size | (1L << (7 * len))
      Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
    }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    encodeId(id) ++ encodeSize(payload.length.toLong) ++ payload

  private def uintBytes(v: Long): Array[Byte] = {
    val len = math.max((64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8, 1)
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private def uintEl(id: Long, v: Long): Array[Byte] = el(id, uintBytes(v))

  private def floatEl(id: Long, d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    el(id, Array.tabulate(8)(i => ((bits >> (8 * (7 - i))) & 0xff).toByte))
  }

  private def strEl(id: Long, s: String): Array[Byte] =
    el(id, s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** deterministic synthetic WebM: a REAL EBML/Matroska container (EBML
    * header with DocType webm + Segment with Info/Tracks/Cluster) whose
    * Cluster SimpleBlock carries seeded opaque bytes standing in for the
    * VP9 bitstream — the container metadata is genuine and parseable, only
    * the pixels are fake. TimecodeScale is the 1 ms default so the declared
    * Duration is exactly `durationMs`. `audioTrackFirst` muxes an audio
    * TrackEntry first (dims must come from the TrackType-1 entry, not the
    * first one); `unknownSizeSegment` writes the Segment with the
    * streaming-mux open size. The bitstream length follows the same
    * 256 + (seed % 512) formula as the MP4 writer's mdat so the q25 stub
    * oracle covers both formats with one expression.
    */
  def syntheticWebm(
      seed: Long,
      w: Int,
      h: Int,
      durationMs: Long,
      audioTrackFirst: Boolean = false,
      unknownSizeSegment: Boolean = false
  ): Array[Byte] = {
    val header = el(
      EbmlHeader,
      uintEl(0x4286L, 1) ++ uintEl(0x42F7L, 1) ++ uintEl(0x42F2L, 4) ++ uintEl(0x42F3L, 8) ++
        strEl(DocType, "webm") ++ uintEl(0x4287L, 2) ++ uintEl(0x4285L, 2)
    )
    val info = el(Info, uintEl(TimecodeScale, 1000000L) ++ floatEl(Duration, durationMs.toDouble))
    val videoTrackNo = if (audioTrackFirst) 2L else 1L
    val videoTrack = el(
      TrackEntry,
      uintEl(TrackNumber, videoTrackNo) ++ uintEl(TrackType, 1L) ++ strEl(CodecId, "V_VP9") ++
        el(VideoEl, uintEl(PixelWidth, w.toLong) ++ uintEl(PixelHeight, h.toLong))
    )
    def audioTrack = el(
      TrackEntry,
      uintEl(TrackNumber, 1L) ++ uintEl(TrackType, 2L) ++ strEl(CodecId, "A_OPUS") ++
        el(AudioEl, floatEl(SamplingFrequency, 8000.0))
    )
    val tracks = el(Tracks, (if (audioTrackFirst) audioTrack else Array.emptyByteArray) ++ videoTrack)
    val rnd = new scala.util.Random(seed)
    val bitstream = new Array[Byte](256 + (seed % 512).toInt.abs)
    rnd.nextBytes(bitstream)
    val block = el(
      SimpleBlock,
      Array((0x80L | videoTrackNo).toByte, 0.toByte, 0.toByte, 0x80.toByte) ++ bitstream // track vint, timecode 0, keyframe
    )
    val cluster = el(Cluster, uintEl(Timecode, 0L) ++ block)
    val segPayload = info ++ tracks ++ cluster
    val segment =
      if (unknownSizeSegment) encodeId(Segment) ++ encodeSize(-1L) ++ segPayload
      else el(Segment, segPayload)
    header ++ segment
  }
}
