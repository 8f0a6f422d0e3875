package graft.multimodal

import graft.spark.SparkTestBase
import java.awt.image.BufferedImage

/** REAL AVI video path: container roundtrip through the chunk-walking
  * parser, lossless raw-DIB pixel recovery, MJPEG frame decode via the JDK
  * JPEG codec, fps/frame-count header parity, and robustness of the walker
  * to chunks it must skip.
  */
class VideoCodecSpec extends SparkTestBase {

  private def solid(rgb: Int, w: Int = 8, h: Int = 6): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("raw-DIB AVI roundtrip is LOSSLESS: every pixel of every frame recovers exactly") {
    // width 6 → stride 6*3=18 is NOT 4-aligned (pads to 20): exercises row padding
    val frames = IndexedSeq(0xff0000, 0x00ff00, 0x0000ff, 0x123456).map(c => solid(c, w = 6, h = 5))
    // one non-uniform frame: quadrant pattern catches x/y or bottom-up mixups
    val quad = new BufferedImage(6, 5, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 6) quad.setRGB(x, y, if (y < 2) (if (x < 3) 0xff0000 else 0x00ff00) else 0x0000ff)
    val all = frames :+ quad
    val avi = VideoCodec.decode(VideoCodec.encodeAvi(all, fps = 4, mjpeg = false))
    assert(!avi.mjpeg && avi.width == 6 && avi.height == 5 && avi.fps == 4.0)
    assert(avi.frames.size == all.size)
    for (i <- all.indices) {
      val back = VideoCodec.frameImage(avi, i)
      for (y <- 0 until 5; x <- 0 until 6)
        assert((back.getRGB(x, y) & 0xffffff) == (all(i).getRGB(x, y) & 0xffffff), s"frame $i ($x,$y)")
    }
  }

  test("MJPEG AVI: frames decode through the JDK JPEG codec near the source pixels") {
    // JPEG is lossy — solid-color frames decode within a small tolerance
    val all = IndexedSeq(solid(0x808080), solid(0xc0c0c0), solid(0x404040))
    val avi = VideoCodec.decode(VideoCodec.encodeAvi(all, fps = 2, mjpeg = true))
    assert(avi.mjpeg && avi.fps == 2.0 && avi.frames.size == 3)
    for (i <- all.indices) {
      val back = VideoCodec.frameImage(avi, i)
      assert(back.getWidth == 8 && back.getHeight == 6)
      val exp = all(i).getRGB(0, 0) & 0xff
      val got = back.getRGB(4, 3) & 0xff
      assert(math.abs(exp - got) <= 8, s"frame $i: $exp vs $got")
    }
    // features = temporal mean of band luma: mid/light/dark grays average
    // to ~(0x80+0xc0+0x40)/3/255 in every band
    val f = VideoCodec.features(VideoCodec.encodeAvi(all, fps = 2, mjpeg = true), dims = 3)
    val expected = (0x80 + 0xc0 + 0x40) / 3.0 / 255.0
    f.foreach(v => assert(math.abs(v - expected) < 0.04, s"${f.toSeq} vs $expected"))
  }

  test("resize: raw-DIB path picks exact source pixels per quadrant, fps and codec kept") {
    // 4×4 quadrant frame downsampled to 2×2 must pick one pixel per quadrant
    // (the ImageCodec.resize contract, per frame)
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    val cols = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, cols((y / 2) * 2 + (x / 2)))
    val avi = VideoCodec.encodeAvi(IndexedSeq(img, img), fps = 3, mjpeg = false)
    val out = VideoCodec.decode(VideoCodec.resize(avi, 2, 2))
    assert(out.width == 2 && out.height == 2 && out.fps == 3.0 && !out.mjpeg && out.frames.size == 2)
    for (i <- 0 until 2; y <- 0 until 2; x <- 0 until 2)
      assert((VideoCodec.frameImage(out, i).getRGB(x, y) & 0xffffff) == cols(y * 2 + x), s"f$i ($x,$y)")
    // MJPEG leg: codec preserved, dimensions change, frames re-decode
    val mj = VideoCodec.decode(VideoCodec.resize(VideoCodec.encodeAvi(IndexedSeq(solid(0x808080)), 2, mjpeg = true), 4, 4))
    assert(mj.mjpeg && mj.width == 4 && VideoCodec.frameImage(mj, 0).getHeight == 4)
  }

  test("audio-first mux: video at stream ordinal 1 decodes its 01dc/01db frames losslessly") {
    // a valid AVI with audio as stream 0 and video as stream 1 — real muxers
    // produce this for any file with an audio track; the decoder must follow
    // the video stream's ORDINAL, not hard-code 00dc/00db
    val all = IndexedSeq(solid(0xff0000, w = 6, h = 5), solid(0x00ff00, w = 6, h = 5))
    for (mjpeg <- Seq(false, true)) {
      val bytes = VideoCodec.encodeAvi(all, fps = 4, mjpeg = mjpeg, audioFirst = true)
      val avi = VideoCodec.decode(bytes)
      assert(avi.mjpeg == mjpeg && avi.width == 6 && avi.height == 5 && avi.fps == 4.0)
      assert(avi.frames.size == 2, s"audio-first mux must yield the video frames (mjpeg=$mjpeg)")
      if (!mjpeg)
        for (i <- all.indices; y <- 0 until 5; x <- 0 until 6)
          assert((VideoCodec.frameImage(avi, i).getRGB(x, y) & 0xffffff) == (all(i).getRGB(x, y) & 0xffffff))
      // the whole feature path works on the audio-first file too
      assert(VideoCodec.features(bytes, dims = 4).length == 4)
      // and the audio chunk (00wb, 8000 zero bytes) never leaks into frames
      assert(avi.frames.forall(_.length < 8000))
    }
    // video-first layout still decodes from 00dc (ordinal 0) — no regression
    val plain = VideoCodec.decode(VideoCodec.encodeAvi(all, fps = 4, mjpeg = false))
    assert(plain.frames.size == 2)
  }

  test("parser skips unknown chunks and rejects non-AVI or truncated bytes") {
    val ok = VideoCodec.encodeAvi(IndexedSeq(solid(0x112233)), fps = 1, mjpeg = false)
    // splice a JUNK chunk between hdrl and movi: parser must skip it by size
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
    val moviAt = {
      var i = 12
      var at = -1
      while (at < 0 && i + 12 <= ok.length) {
        if (new String(ok, i, 4, "US-ASCII") == "LIST" && new String(ok, i + 8, 4, "US-ASCII") == "movi") at = i
        else i += 1
      }
      at
    }
    assert(moviAt > 0)
    val spliced = ok.take(moviAt) ++ junk ++ ok.drop(moviAt)
    // outer RIFF size must cover the insertion
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val avi = VideoCodec.decode(spliced)
    assert(avi.frames.size == 1 && (VideoCodec.frameImage(avi, 0).getRGB(2, 2) & 0xffffff) == 0x112233)

    assert(!VideoCodec.isAvi("RIFFxxxxWAVE".getBytes("US-ASCII")))
    intercept[IllegalArgumentException] { VideoCodec.decode("not avi".getBytes("US-ASCII")) }
    intercept[IllegalArgumentException] { VideoCodec.decode(ok.take(ok.length - 3)) } // truncated chunk
  }

  test("decoder honors strf: 32bpp BGRX, top-down rows, unsupported codecs REJECT loudly") {
    val base = VideoCodec.encodeAvi(IndexedSeq(solid(0x336699, w = 4, h = 2)), fps = 1, mjpeg = false)
    def patched(f: Array[Byte] => Unit): Array[Byte] = { val b = base.clone(); f(b); b }
    def findChunk(b: Array[Byte], id: String): Int = {
      var i = 12; var at = -1
      while (at < 0 && i + 8 <= b.length) {
        if (new String(b, i, 4, "US-ASCII") == id) at = i else i += 1
      }
      assert(at > 0, s"no $id chunk"); at
    }
    val strfBody = findChunk(base, "strf") + 8
    val bb = java.nio.ByteOrder.LITTLE_ENDIAN

    // 32bpp BGRX: rebuild the single 4x2 frame payload as 4-byte pixels
    val px32 = {
      val b = new Array[Byte](4 * 4 * 2) // stride 16, no pad needed
      for (y <- 0 until 2; x <- 0 until 4) {
        val o = (1 - y) * 16 + x * 4 // bottom-up
        b(o) = 0x99.toByte; b(o + 1) = 0x66; b(o + 2) = 0x33; b(o + 3) = 0x7f // X byte arbitrary
      }
      b
    }
    val avi32bytes = {
      val with32 = patched { b =>
        java.nio.ByteBuffer.wrap(b).order(bb).putShort(strfBody + 14, 32) // biBitCount
      }
      // swap the 00db payload: old stride (4*3+3)&~3=12 → 24 bytes; new 32
      val at = findChunk(with32, "00db")
      val head = with32.take(at)
      val tailAfter = with32.drop(at + 8 + 24)
      val chunk = java.nio.ByteBuffer.allocate(8 + px32.length).order(bb)
      chunk.put("00db".getBytes("US-ASCII")).putInt(px32.length).put(px32)
      val out = head ++ chunk.array() ++ tailAfter
      java.nio.ByteBuffer.wrap(out).order(bb).putInt(4, out.length - 8) // fix RIFF size
      // fix the movi LIST size too: it grew by the same delta
      val moviAt = findChunk(out, "movi") - 8
      val oldSize = java.nio.ByteBuffer.wrap(out).order(bb).getInt(moviAt + 4)
      java.nio.ByteBuffer.wrap(out).order(bb).putInt(moviAt + 4, oldSize + (px32.length - 24))
      out
    }
    val avi32 = VideoCodec.decode(avi32bytes)
    assert(avi32.bitCount == 32 && !avi32.mjpeg)
    val img32 = VideoCodec.frameImage(avi32, 0)
    for (y <- 0 until 2; x <- 0 until 4) assert((img32.getRGB(x, y) & 0xffffff) == 0x336699, s"($x,$y)")

    // top-down: biHeight negative flips row order; encode a 2-row gradient
    val grad = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4) { grad.setRGB(x, 0, 0xff0000); grad.setRGB(x, 1, 0x0000ff) }
    val gradAvi = VideoCodec.encodeAvi(IndexedSeq(grad), fps = 1, mjpeg = false)
    val gBody = findChunk(gradAvi, "strf") + 8
    val topDown = gradAvi.clone()
    java.nio.ByteBuffer.wrap(topDown).order(bb).putInt(gBody + 8, -2) // biHeight = -2
    val td = VideoCodec.decode(topDown)
    assert(td.topDown)
    val tImg = VideoCodec.frameImage(td, 0)
    // payload rows were written bottom-up (row0-of-file = image row 1);
    // top-down interpretation reads them in file order → flipped image
    assert((tImg.getRGB(0, 0) & 0xffffff) == 0x0000ff && (tImg.getRGB(0, 1) & 0xffffff) == 0xff0000)

    // unsupported codec fourcc: loud reject, never silent garbage
    val h264 = patched { b =>
      val strhBody = findChunk(b, "strh") + 8
      System.arraycopy("H264".getBytes("US-ASCII"), 0, b, strhBody + 4, 4) // handler
      System.arraycopy("H264".getBytes("US-ASCII"), 0, b, strfBody + 16, 4) // biCompression
    }
    val ex = intercept[IllegalArgumentException] { VideoCodec.decode(h264) }
    assert(ex.getMessage.contains("unsupported AVI codec"), ex.getMessage)
    // 16bpp raw is likewise undecodable here
    val bpp16 = patched(b => java.nio.ByteBuffer.wrap(b).order(bb).putShort(strfBody + 14, 16))
    intercept[IllegalArgumentException] { VideoCodec.decode(bpp16) }

    // trailing padding after the declared RIFF size is legal and ignored
    val padded = base ++ Array.fill[Byte](7)(0x5a)
    assert(VideoCodec.decode(padded).frames.size == 1)

    // a streaming-writer dwSize of 0 falls back to the real length
    val zeroSize = patched(b => java.nio.ByteBuffer.wrap(b).order(bb).putInt(4, 0))
    assert(VideoCodec.decode(zeroSize).frames.size == 1)

    // a raw stream WITHOUT a parsed video strf must reject (bit depth and
    // compression would be a guess), even under a benign-looking handler —
    // rename the strf chunk so the walker skips it cleanly by size
    val strfAt = findChunk(base, "strf")
    val noStrf = patched(b => System.arraycopy("strx".getBytes("US-ASCII"), 0, b, strfAt, 4))
    val ex3 = intercept[IllegalArgumentException] { VideoCodec.decode(noStrf) }
    assert(ex3.getMessage.contains("no video strf"), ex3.getMessage)

    // a huge declared chunk size must fail the truncation guard, not wrap
    val huge = patched { b =>
      val at = findChunk(b, "00db")
      java.nio.ByteBuffer.wrap(b).order(bb).putInt(at + 4, 0x7ffffff0)
    }
    val ex2 = intercept[IllegalArgumentException] { VideoCodec.decode(huge) }
    assert(ex2.getMessage.contains("truncated AVI chunk"), ex2.getMessage)
  }

  test("synthetic corpus: AVI rows really decode, frame counts follow the duration metadata") {
    val docs = MediaOps.syntheticMedia(spark, 24).collect()
    val avis = docs.filter(_.mime == "video/avi")
    assert(avis.nonEmpty, "corpus must contain AVI rows")
    assert(docs.exists(_.mime == "video/mp4"), "corpus must keep stub mp4 rows")
    for (d <- avis) {
      val avi = VideoCodec.decode(d.media)
      assert(avi.width == d.width && avi.height == 16, s"doc ${d.doc_id}")
      // 2 fps × duration seconds, exactly the synthesizer's contract
      assert(avi.frames.size == 2 * (d.duration_ms / 1000), s"doc ${d.doc_id}")
      assert(avi.fps == 2.0)
      val f = VideoCodec.features(d.media, 8)
      assert(f.length == 8 && f.forall(v => v >= 0f && v <= 1f))
    }
    // both payload kinds appear across the corpus
    val kinds = avis.map(d => VideoCodec.decode(d.media).mjpeg).toSet
    assert(kinds == Set(true, false), s"need MJPEG and DIB rows: $kinds")
  }

  test("sampleFrames on AVI rows emits real frame payloads at the fps-derived indices") {
    val s = spark
    import s.implicits._
    val docs = MediaOps.syntheticMedia(s, 24).filter(d => d.mime == "video/avi")
    val frames = MediaOps.sampleFrames(docs, everyMs = 5000).collect()
    val byDoc = docs.collect().map(d => d.doc_id -> d).toMap
    assert(frames.nonEmpty)
    for (f <- frames) {
      val d = byDoc(f.doc_id)
      val avi = VideoCodec.decode(d.media)
      // HAND-derived index, not the implementation's formula: at 2 fps a
      // 5000 ms cadence is every 10th frame, clamped to the last one
      val idx = math.min(10 * f.frame_idx, avi.frames.size - 1)
      assert(f.frame.sameElements(avi.frames(idx)), s"doc ${f.doc_id} sample ${f.frame_idx}")
    }
    // count rule is the SHARED duration arithmetic
    val counts = frames.groupBy(_.doc_id).view.mapValues(_.length).toMap
    for ((id, n) <- counts) assert(n == math.max(byDoc(id).duration_ms / 5000, 1))
  }

  test("deep LIST nesting rejects with IAE, never StackOverflowError") {
    def aviList(payload: Array[Byte]) = {
      val size = 4 + payload.length
      "LIST".getBytes("US-ASCII") ++
        Array[Byte](size.toByte, (size >> 8).toByte, (size >> 16).toByte, (size >> 24).toByte) ++
        "hdrl".getBytes("US-ASCII") ++ payload
    }
    val nestedLists = (0 until 40).foldLeft(Array.emptyByteArray)((inner, _) => aviList(inner))
    val riffSize = 4 + nestedLists.length
    val nestedAvi = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](riffSize.toByte, (riffSize >> 8).toByte, (riffSize >> 16).toByte, (riffSize >> 24).toByte) ++
      "AVI ".getBytes("US-ASCII") ++ nestedLists
    val e = intercept[IllegalArgumentException](VideoCodec.decode(nestedAvi))
    assert(e.getMessage.contains("nesting"), e.getMessage)
  }

  test("decodeMeta parses identical metadata without copying frame payloads") {
    val bytes = VideoCodec.syntheticAvi(seed = 9, w = 8, h = 8, nFrames = 4, fps = 2, mjpeg = false)
    val full = VideoCodec.decode(bytes)
    val meta = VideoCodec.decodeMeta(bytes)
    assert((meta.width, meta.height, meta.fps, meta.mjpeg, meta.frames.size)
      == ((full.width, full.height, full.fps, full.mjpeg, full.frames.size)))
    assert(meta.frames.forall(_.isEmpty), "decodeMeta must not carry payloads")
    assert(full.frames.forall(_.nonEmpty), "full decode must")
  }
}
