package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** GENERATION-based EBML fuzz, mirroring `Mp4GenerativeFuzzSpec`: a seeded
  * generator with its OWN low-level element writer (independent of
  * `EbmlCodec.syntheticWebm`, so writer bugs cannot mask parser bugs)
  * assembles Matroska trees across the structural space the walker accepts:
  *
  *  - NON-minimal size vints (legal EBML — a 1-byte value padded into a
  *    wider vint) at every element, up to the 8-byte form;
  *  - float4 vs float8 Duration (the float4 case pins that the expected ms
  *    derives from the 32-bit-rounded value, not the intended double);
  *  - open-size (streaming) Segment as the last top-level element;
  *  - unknown sibling elements (Void, CRC-32, SegmentUID, MuxingApp, …) and
  *    zero-length unknown leaves scattered at every level;
  *  - context decoys: PixelWidth/PixelHeight/TimecodeScale/Duration ids in
  *    the WRONG parent, carrying junk values that must not leak into the
  *    parsed metadata;
  *  - decoy audio tracks before the video track, shadow video tracks after
  *    it (first TrackType-1 entry wins);
  *
  * plus hostile trees that must reject loudly (IllegalArgumentException,
  * never ArrayIndexOutOfBounds / StackOverflow / NegativeArraySize): the
  * unknown-size vint off Segment, zero size lead bytes, uint leaves wider
  * than 8 bytes, PixelWidth/Height past Int range, illegal float widths,
  * NaN / negative / ±Inf / overflow Durations, zero TimecodeScale,
  * truncating declared sizes, and > 32-level nesting bombs. Truncation is
  * additionally exercised at EVERY byte of whole generated files.
  */
class EbmlGenerativeFuzzSpec extends AnyFunSuite {

  private val N_GEN = sys.props.getOrElse("graft.genFixtures", "800").toInt
  private val N_SWEEP = sys.props.getOrElse("graft.sweepFixtures", "24").toInt

  private def loudOnly[A](what: String)(body: => A): Option[A] =
    try Some(body)
    catch {
      case _: IllegalArgumentException => None
      case e: Throwable => fail(s"$what must reject with IllegalArgumentException, threw ${e.getClass.getName}: ${e.getMessage}")
    }

  // ---- independent low-level writer ----------------------------------------

  private val EbmlHeader = 0x1A45DFA3L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimecodeScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackType = 0x83L
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val Cluster = 0x1F43B675L
  private val SimpleBlock = 0xA3L
  // conventionally-unused-by-the-walker siblings it must skip by size
  private val UnknownIds = Seq(0xECL /*Void*/, 0xBFL /*CRC-32*/, 0x73A4L /*SegmentUID*/, 0x4D80L /*MuxingApp*/, 0x5741L /*WritingApp*/, 0x9BL /*BlockDuration*/ )

  private def idb(id: Long): Array[Byte] = {
    val len = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2 else if (id <= 0xffffffL) 3 else 4
    Array.tabulate(len)(i => ((id >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  /** size vint of EXACTLY `len` bytes (non-minimal encodings are legal EBML
    * as long as the value fits and is not the all-ones UNKNOWN pattern)
    */
  private def sizeVint(size: Long, len: Int): Array[Byte] = {
    require(len >= 1 && len <= 8 && size >= 0 && size < (1L << (7 * len)) - 1, s"size $size does not fit $len bytes")
    val v = size | (1L << (7 * len))
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  /** minimal length for `size`, occasionally widened (non-minimal) */
  private def sizedEl(rnd: scala.util.Random, id: Long, payload: Array[Byte]): Array[Byte] = {
    var minLen = 1
    while (payload.length >= (1L << (7 * minLen)) - 1) minLen += 1
    val len = if (rnd.nextInt(4) == 0) math.min(8, minLen + 1 + rnd.nextInt(3)) else minLen
    idb(id) ++ sizeVint(payload.length.toLong, len) ++ payload
  }

  private def openEl(id: Long, payload: Array[Byte]): Array[Byte] =
    idb(id) ++ Array(0x01.toByte) ++ Array.fill(7)(0xff.toByte) ++ payload

  private def uintBytes(v: Long, rnd: scala.util.Random): Array[Byte] = {
    val minLen = math.max((64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8, 1)
    // EBML uints may be zero-padded up to 8 bytes
    val len = math.min(8, minLen + (if (rnd.nextInt(3) == 0) rnd.nextInt(3) else 0))
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private def f32(f: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(f)
    Array.tabulate(4)(i => ((bits >> (8 * (3 - i))) & 0xff).toByte)
  }

  private def f64(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    Array.tabulate(8)(i => ((bits >> (8 * (7 - i))) & 0xff).toByte)
  }

  private def junkEl(rnd: scala.util.Random): Array[Byte] = {
    val junk = new Array[Byte](rnd.nextInt(24))
    rnd.nextBytes(junk)
    sizedEl(rnd, UnknownIds(rnd.nextInt(UnknownIds.length)), junk)
  }

  /** a parsed id in the WRONG parent — the walker must skip it untouched */
  private def decoyEl(rnd: scala.util.Random, atSegmentLevel: Boolean): Array[Byte] = {
    val rndVal = 1L + rnd.nextInt(1 << 20)
    if (atSegmentLevel) sizedEl(rnd, Seq(PixelWidth, PixelHeight, TimecodeScale, Duration)(rnd.nextInt(4)), uintBytes(rndVal, rnd))
    else sizedEl(rnd, Seq(PixelWidth, PixelHeight)(rnd.nextInt(2)), uintBytes(rndVal, rnd))
  }

  // ---- CONTAINER decoys: a parsed container id in the WRONG parent. The
  // walker must skip these by size like any unknown element — descending
  // them would let the junk leaves inside overwrite the real metadata
  // (the exact bug class a round-7 review found: unguarded container cases).

  /** Info in a non-Segment parent, carrying junk TimecodeScale + Duration */
  private def infoDecoy(rnd: scala.util.Random): Array[Byte] =
    sizedEl(rnd, Info,
      sizedEl(rnd, TimecodeScale, uintBytes(1L + rnd.nextInt(1000), rnd)) ++
        sizedEl(rnd, Duration, f64(1.0 + rnd.nextInt(1000))))

  /** TrackEntry outside Tracks, claiming to be a video track with junk dims */
  private def trackEntryDecoy(rnd: scala.util.Random): Array[Byte] =
    sizedEl(rnd, TrackEntry,
      sizedEl(rnd, TrackType, uintBytes(1L, rnd)) ++
        sizedEl(rnd, VideoEl,
          sizedEl(rnd, PixelWidth, uintBytes(7777L, rnd)) ++
            sizedEl(rnd, PixelHeight, uintBytes(8888L, rnd))))

  /** Tracks inside Info (wrong parent), wrapping a junk video TrackEntry */
  private def tracksDecoy(rnd: scala.util.Random): Array[Byte] =
    sizedEl(rnd, Tracks, trackEntryDecoy(rnd))

  private def header(rnd: scala.util.Random): Array[Byte] =
    sizedEl(rnd, EbmlHeader, sizedEl(rnd, 0x4282L, "webm".getBytes("US-ASCII")))

  /** a structurally VALID tree with randomized encodings; returns the bytes
    * and the exact metadata the parser must report
    */
  private def genValid(seed: Int): (Array[Byte], EbmlCodec.WebmMeta) = {
    val rnd = new scala.util.Random(0x3B3B + seed * 48271)
    val w = 1 + rnd.nextInt(1 << 16)
    val h = 1 + rnd.nextInt(1 << 16)
    val scale = 1L + rnd.nextLong(2000000000L)
    val wantMs = 1L + rnd.nextInt(1 << 24)
    // Duration is ticks = wantMs * 1e6 / scale; write it as float4 or float8
    // and derive the EXPECTED ms from the value as written
    val ticksD = wantMs.toDouble * 1e6 / scale.toDouble
    val useF32 = rnd.nextBoolean()
    val ticksWritten = if (useF32) ticksD.toFloat.toDouble else ticksD
    val durBytes = if (useF32) f32(ticksD.toFloat) else f64(ticksD)
    val expectMs = math.round(ticksWritten * scale / 1e6)

    def sprinkle(kids: Array[Byte]*): Array[Byte] = {
      var out = Array.empty[Byte]
      for (k <- kids) {
        if (rnd.nextInt(3) == 0) out ++= junkEl(rnd)
        out ++= k
      }
      if (rnd.nextInt(3) == 0) out ++= junkEl(rnd)
      out
    }

    val info = sizedEl(rnd, Info, sprinkle(
      sizedEl(rnd, TimecodeScale, uintBytes(scale, rnd)),
      sizedEl(rnd, Duration, durBytes)
    ) ++ (if (rnd.nextInt(3) == 0) tracksDecoy(rnd) else Array.emptyByteArray))
    def track(ttype: Long, tw: Int, th: Int): Array[Byte] = {
      val video =
        if (ttype == 1L) sizedEl(rnd, VideoEl, sprinkle(
          sizedEl(rnd, PixelWidth, uintBytes(tw.toLong, rnd)),
          sizedEl(rnd, PixelHeight, uintBytes(th.toLong, rnd))
        ))
        else Array.emptyByteArray
      // an Info container nested in a TrackEntry must be skipped, not descended
      val decoy = if (ttype == 1L && rnd.nextInt(3) == 0) infoDecoy(rnd) else Array.emptyByteArray
      sizedEl(rnd, TrackEntry, sprinkle(sizedEl(rnd, TrackType, uintBytes(ttype, rnd)), video) ++ decoy)
    }
    var trackList = Array.empty[Byte]
    if (rnd.nextBoolean()) trackList ++= track(2L, 0, 0) // decoy audio first
    trackList ++= track(1L, w, h)
    if (rnd.nextBoolean()) trackList ++= track(1L, w + 7, h + 7) // shadow video: first wins
    val tracks = sizedEl(rnd, Tracks, trackList)

    val bits = new Array[Byte](1 + rnd.nextInt(64))
    rnd.nextBytes(bits)
    val cluster =
      if (rnd.nextBoolean()) sizedEl(rnd, Cluster, sizedEl(rnd, SimpleBlock, Array[Byte](0x81.toByte, 0, 0, 0x80.toByte) ++ bits))
      else Array.emptyByteArray // headers-only stream is legal

    var segKids = Array.empty[Byte]
    if (rnd.nextInt(3) == 0) segKids ++= decoyEl(rnd, atSegmentLevel = true)
    // a TrackEntry at Segment level precedes the real Tracks — first-wins
    // dim selection would lock onto its junk dims if the walker descended it
    if (rnd.nextInt(3) == 0) segKids ++= trackEntryDecoy(rnd)
    segKids ++= info
    if (rnd.nextInt(3) == 0) segKids ++= junkEl(rnd)
    segKids ++= tracks
    segKids ++= cluster
    val segment = if (rnd.nextBoolean()) openEl(Segment, segKids) else sizedEl(rnd, Segment, segKids)
    (header(rnd) ++ segment, EbmlCodec.WebmMeta(w, h, expectMs, scale))
  }

  /** hostile trees: (kind, bytes, None = must reject loudly | Some(meta) =
    * must skip the hostility and parse to exactly this)
    */
  private def genHostile(seed: Int): (String, Array[Byte], Option[EbmlCodec.WebmMeta]) = {
    val rnd = new scala.util.Random(0x0DDB411 + seed * 69621)
    val w = 1 + rnd.nextInt(4096)
    val h = 1 + rnd.nextInt(2160)
    val ms = 1L + rnd.nextInt(1000000)
    def info(scale: Long, dur: Array[Byte]) =
      sizedEl(rnd, Info, sizedEl(rnd, TimecodeScale, uintBytes(scale, rnd)) ++ sizedEl(rnd, Duration, dur))
    def vtrack(tw: Long, th: Long, wide: Boolean) = sizedEl(rnd, Tracks, sizedEl(rnd, TrackEntry,
      sizedEl(rnd, TrackType, uintBytes(1L, rnd)) ++ sizedEl(rnd, VideoEl,
        sizedEl(rnd, PixelWidth, if (wide) Array.fill[Byte](9)(1) else uintBytes(tw, rnd)) ++
          sizedEl(rnd, PixelHeight, uintBytes(th, rnd)))))
    val benignKids = info(1000000L, f64(ms.toDouble)) ++ vtrack(w.toLong, h.toLong, wide = false)
    val benign = EbmlCodec.WebmMeta(w, h, ms, 1000000L)

    rnd.nextInt(12) match {
      case 0 =>
        ("open-size-off-segment", header(rnd) ++ sizedEl(rnd, Segment, openEl(Info, Array.emptyByteArray) ++ benignKids), None)
      case 1 =>
        ("zero-size-lead-byte", header(rnd) ++ sizedEl(rnd, Segment, idb(Info) ++ Array(0x00.toByte) ++ benignKids), None)
      case 2 =>
        ("uint-wider-than-8", header(rnd) ++ sizedEl(rnd, Segment,
          sizedEl(rnd, Info, sizedEl(rnd, TimecodeScale, Array.fill[Byte](9)(1)) ++ sizedEl(rnd, Duration, f64(ms.toDouble))) ++
            vtrack(w.toLong, h.toLong, wide = false)), None)
      case 3 =>
        ("pixel-width-past-int", header(rnd) ++ sizedEl(rnd, Segment,
          info(1000000L, f64(ms.toDouble)) ++ vtrack((1L << 32) + rnd.nextInt(1000), h.toLong, wide = false)), None)
      case 4 =>
        val width = Seq(1, 2, 3, 5, 6, 7)(rnd.nextInt(6))
        ("illegal-float-width", header(rnd) ++ sizedEl(rnd, Segment,
          info(1000000L, new Array[Byte](width)) ++ vtrack(w.toLong, h.toLong, wide = false)), None)
      case 5 =>
        val bad = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, -1.0, 1e300)(rnd.nextInt(5))
        ("hostile-duration-value", header(rnd) ++ sizedEl(rnd, Segment, info(1000000L, f64(bad)) ++ vtrack(w.toLong, h.toLong, wide = false)), None)
      case 6 =>
        // duration * timescale overflow: both individually plausible
        ("duration-times-scale-overflow", header(rnd) ++ sizedEl(rnd, Segment,
          info(2000000000L, f64(1e16)) ++ vtrack(w.toLong, h.toLong, wide = false)), None)
      case 7 =>
        var bomb = benignKids
        for (_ <- 0 until 34 + rnd.nextInt(16)) bomb = sizedEl(rnd, Segment, bomb)
        ("nesting-bomb", header(rnd) ++ bomb, None)
      case 8 =>
        // declared element size past the container end
        ("size-overrun", header(rnd) ++ sizedEl(rnd, Segment, idb(Info) ++ sizeVint(1 << 20, 3) ++ benignKids), None)
      case 10 =>
        // Info container nested in the video TrackEntry, carrying a junk
        // Duration + TimecodeScale: must be skipped by size, never descended
        val poisonedTrack = sizedEl(rnd, Tracks, sizedEl(rnd, TrackEntry,
          sizedEl(rnd, TrackType, uintBytes(1L, rnd)) ++
            sizedEl(rnd, VideoEl,
              sizedEl(rnd, PixelWidth, uintBytes(w.toLong, rnd)) ++
                sizedEl(rnd, PixelHeight, uintBytes(h.toLong, rnd))) ++
            infoDecoy(rnd)))
        ("wrong-parent-info-container", header(rnd) ++ sizedEl(rnd, Segment,
          info(1000000L, f64(ms.toDouble)) ++ poisonedTrack), Some(benign))
      case 11 =>
        // TrackEntry at Segment level BEFORE the real Tracks: descending it
        // would lock first-wins dim selection onto its 7777x8888 junk
        ("segment-level-trackentry", header(rnd) ++ sizedEl(rnd, Segment,
          trackEntryDecoy(rnd) ++ benignKids), Some(benign))
      case _ =>
        // wide-uint hostility inside an UNKNOWN element: skipped by size,
        // parses to exactly the benign answer
        ("hostile-interior-skipped", header(rnd) ++ sizedEl(rnd, Segment,
          sizedEl(rnd, 0xECL, Array.fill[Byte](9)(1)) ++ benignKids), Some(benign))
    }
  }

  // ---- properties -----------------------------------------------------------

  test(s"generated VALID trees parse to their declared metadata over $N_GEN seeds") {
    for (seed <- 0 until N_GEN) {
      val (bytes, want) = genValid(seed)
      val got = EbmlCodec.parseMeta(bytes)
      assert(got == want, s"seed $seed: $got != $want")
    }
  }

  test(s"generated HOSTILE trees reject loudly (or skip to the benign answer) over $N_GEN seeds") {
    val seen = scala.collection.mutable.Set[String]()
    for (seed <- 0 until N_GEN) {
      val (kind, bytes, expected) = genHostile(seed)
      seen += kind
      val got = loudOnly(s"seed $seed [$kind]")(EbmlCodec.parseMeta(bytes))
      expected match {
        case Some(want) => assert(got.contains(want), s"seed $seed [$kind]: $got != Some($want)")
        case None => got.foreach(m => fail(s"seed $seed [$kind]: hostile tree PARSED as $m instead of rejecting"))
      }
      loudOnly(s"seed $seed [$kind] cluster")(EbmlCodec.clusterPayload(bytes))
    }
    val allKinds = Set(
      "open-size-off-segment", "zero-size-lead-byte", "uint-wider-than-8",
      "pixel-width-past-int", "illegal-float-width", "hostile-duration-value",
      "duration-times-scale-overflow", "nesting-bomb", "size-overrun",
      "wrong-parent-info-container", "segment-level-trackentry",
      "hostile-interior-skipped"
    )
    assert(allKinds.subsetOf(seen.toSet), s"hostile kinds never generated: ${allKinds -- seen}")
  }

  test(s"truncation at EVERY byte of $N_SWEEP generated files: same answer or loud reject") {
    for (seed <- 0 until N_SWEEP) {
      val (bytes, want) = genValid(seed * 41)
      for (cut <- 1 until bytes.length) {
        loudOnly(s"seed ${seed * 41} truncated at $cut/${bytes.length}")(
          EbmlCodec.parseMeta(java.util.Arrays.copyOf(bytes, cut))
        ).foreach(m => assert(m == want, s"seed ${seed * 41}: truncation at $cut parsed to a DIFFERENT answer $m (want $want)"))
      }
    }
  }
}
