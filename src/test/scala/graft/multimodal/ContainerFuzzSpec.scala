package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized fuzz of the two container parsers (pure JVM — no Spark,
  * so wide sweeps are cheap). Three properties per format:
  *
  *  1. ROUNDTRIP — parse(syntheticWriter(randomParams)) returns exactly the
  *     declared metadata across the parameter space (dims, duration, sample
  *     counts, track order, v0/v1 box widths, MJPEG vs raw-DIB).
  *  2. TRUNCATION — a prefix of a valid container either parses to the SAME
  *     correct metadata (cut at a top-level box boundary: a headers-only
  *     file is legal) or rejects with IllegalArgumentException. Never a
  *     silently different answer.
  *  3. CORRUPTION — a single random byte flip either still parses (the flip
  *     landed in payload the parser doesn't interpret — the values may
  *     legitimately differ) or rejects with IllegalArgumentException. Never
  *     an ArrayIndexOutOfBounds/Negative-size/other accidental crash: the
  *     loud-reject contract means EVERY failure is a deliberate require.
  */
class ContainerFuzzSpec extends AnyFunSuite {

  private val N = sys.props.getOrElse("graft.randFixtures", "40").toInt

  private def loudOnly[A](what: String)(body: => A): Option[A] =
    try Some(body)
    catch {
      case _: IllegalArgumentException => None // the deliberate reject path
      case e: Throwable => fail(s"$what must reject with IllegalArgumentException, threw ${e.getClass.getName}: ${e.getMessage}")
    }

  test(s"MP4 roundtrip/truncation/corruption over $N seeds") {
    for (seed <- 0 until N) {
      val rnd = new scala.util.Random(0xF00D + seed * 31337)
      val w = 1 + rnd.nextInt(640)
      val h = 1 + rnd.nextInt(480)
      val durationMs = 1L + rnd.nextInt(1000000)
      val nSamples = rnd.nextInt(5000).toLong
      val audioFirst = rnd.nextBoolean()
      val v1 = rnd.nextBoolean()
      val bytes = Mp4Codec.syntheticMp4(seed, w, h, durationMs, nSamples, audioFirst, v1)

      val meta = Mp4Codec.parseMeta(bytes)
      assert(meta == Mp4Codec.Mp4Meta(w, h, durationMs, 1000L, nSamples),
        s"seed $seed (audioFirst=$audioFirst v1=$v1): $meta")
      val mdat = Mp4Codec.mdatPayload(bytes).get
      assert(mdat.length == 256 + (seed % 512), s"seed $seed: mdat length ${mdat.length}")

      // truncation: same answer or loud reject
      val cut = 1 + rnd.nextInt(bytes.length - 1)
      loudOnly(s"seed $seed truncated at $cut")(Mp4Codec.parseMeta(java.util.Arrays.copyOf(bytes, cut)))
        .foreach(m => assert(m == meta, s"seed $seed: truncation at $cut parsed to a DIFFERENT answer $m"))

      // corruption: any outcome but an accidental crash
      val flipped = bytes.clone()
      val at = rnd.nextInt(flipped.length)
      flipped(at) = (flipped(at) ^ (1 << rnd.nextInt(8))).toByte
      loudOnly(s"seed $seed bit-flipped at $at")(Mp4Codec.parseMeta(flipped))
      loudOnly(s"seed $seed mdat of bit-flipped at $at")(Mp4Codec.mdatPayload(flipped))
    }
  }

  test(s"AVI roundtrip/truncation/corruption over $N seeds") {
    for (seed <- 0 until N) {
      val rnd = new scala.util.Random(0xBEEF + seed * 7919)
      val w = 2 + rnd.nextInt(64)
      val h = 2 + rnd.nextInt(64)
      val nFrames = 1 + rnd.nextInt(6)
      val fps = 1 + rnd.nextInt(60)
      val mjpeg = rnd.nextBoolean()
      val bytes = VideoCodec.syntheticAvi(seed, w, h, nFrames, fps, mjpeg)

      val avi = VideoCodec.decode(bytes)
      assert((avi.width, avi.height, avi.fps, avi.mjpeg, avi.frames.size) == ((w, h, fps.toDouble, mjpeg, nFrames)),
        s"seed $seed: $avi")
      // every frame payload decodes to pixels at the declared dims (raw-DIB
      // exact; MJPEG through the JDK JPEG decoder)
      for (i <- 0 until nFrames) {
        val img = VideoCodec.frameImage(avi, i)
        assert(img.getWidth == w && img.getHeight == h, s"seed $seed frame $i: ${img.getWidth}x${img.getHeight}")
      }

      val cut = 1 + rnd.nextInt(bytes.length - 1)
      loudOnly(s"seed $seed truncated at $cut")(VideoCodec.decode(java.util.Arrays.copyOf(bytes, cut)))
        .foreach { a =>
          assert((a.width, a.height, a.mjpeg) == ((w, h, mjpeg)) && a.frames.size <= nFrames,
            s"seed $seed: truncation at $cut parsed to a DIFFERENT container $a")
        }

      val flipped = bytes.clone()
      val at = rnd.nextInt(flipped.length)
      flipped(at) = (flipped(at) ^ (1 << rnd.nextInt(8))).toByte
      loudOnly(s"seed $seed bit-flipped at $at")(VideoCodec.decode(flipped))
    }
  }

  test(s"EBML roundtrip/truncation/corruption over $N seeds") {
    for (seed <- 0 until N) {
      val rnd = new scala.util.Random(0xCAFE + seed * 104729)
      val w = 1 + rnd.nextInt(4096)
      val h = 1 + rnd.nextInt(2160)
      val durationMs = 1L + rnd.nextInt(100000000)
      val audioFirst = rnd.nextBoolean()
      val openSeg = rnd.nextBoolean()
      val bytes = EbmlCodec.syntheticWebm(seed, w, h, durationMs, audioFirst, openSeg)

      val meta = EbmlCodec.parseMeta(bytes)
      assert(meta == EbmlCodec.WebmMeta(w, h, durationMs, 1000000L),
        s"seed $seed (audioFirst=$audioFirst openSeg=$openSeg): $meta")
      val payload = EbmlCodec.clusterPayload(bytes).get
      assert(payload.length == 256 + (seed % 512), s"seed $seed: payload length ${payload.length}")

      // truncation: same answer or loud reject (a prefix ending after
      // Info+Tracks but before the Cluster is a legal headers-only stream)
      val cut = 1 + rnd.nextInt(bytes.length - 1)
      loudOnly(s"seed $seed truncated at $cut")(EbmlCodec.parseMeta(java.util.Arrays.copyOf(bytes, cut)))
        .foreach(m => assert(m == meta, s"seed $seed: truncation at $cut parsed to a DIFFERENT answer $m"))

      // corruption: any outcome but an accidental crash — this includes
      // hostile SIZE vints (a flipped lead byte rewrites an element's
      // declared length class) and hostile float widths
      val flipped = bytes.clone()
      val at = rnd.nextInt(flipped.length)
      flipped(at) = (flipped(at) ^ (1 << rnd.nextInt(8))).toByte
      loudOnly(s"seed $seed bit-flipped at $at")(EbmlCodec.parseMeta(flipped))
      // clusterPayload's contract on corrupt input is None — no-crash only
      loudOnly(s"seed $seed cluster of bit-flipped at $at")(EbmlCodec.clusterPayload(flipped))
    }
  }

  test("random garbage never parses as either container (and never crashes impolitely)") {
    for (seed <- 0 until N) {
      val rnd = new scala.util.Random(0xDEAD + seed)
      val garbage = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(garbage)
      loudOnly(s"seed $seed garbage mp4")(Mp4Codec.parseMeta(garbage))
        .foreach(m => fail(s"seed $seed: random garbage parsed as MP4 $m"))
      loudOnly(s"seed $seed garbage avi")(VideoCodec.decode(garbage))
        .foreach(a => fail(s"seed $seed: random garbage parsed as AVI $a"))
      loudOnly(s"seed $seed garbage ebml")(EbmlCodec.parseMeta(garbage))
        .foreach(m => fail(s"seed $seed: random garbage parsed as EBML $m"))
      // mdatPayload/clusterPayload contract on corrupt input is None (caller
      // falls back), so only the no-crash property applies
      loudOnly(s"seed $seed garbage mdat")(Mp4Codec.mdatPayload(garbage))
      loudOnly(s"seed $seed garbage cluster")(EbmlCodec.clusterPayload(garbage))
    }
  }
}
