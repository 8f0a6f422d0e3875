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
      val idx = math.min((f.frame_idx.toLong * 5000 * avi.fps / 1000.0).toInt, avi.frames.size - 1)
      assert(f.frame.sameElements(avi.frames(idx)), s"doc ${f.doc_id} sample ${f.frame_idx}")
    }
    // count rule is the SHARED duration arithmetic
    val counts = frames.groupBy(_.doc_id).view.mapValues(_.length).toMap
    for ((id, n) <- counts) assert(n == math.max(byDoc(id).duration_ms / 5000, 1))
  }
}
