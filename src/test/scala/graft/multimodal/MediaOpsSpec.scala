package graft.multimodal

import graft.ann.Ann
import graft.spark.SparkTestBase
import org.apache.spark.sql.functions._

/** Multimodal plumbing tests: binary schema survives parquet, batched
  * feature extraction is deterministic and partitioning-invariant, frame
  * sampling honors metadata, features feed the ANN operators.
  */
class MediaOpsSpec extends SparkTestBase {

  test("binary media columns roundtrip through parquet with typed metadata") {
    val s = spark
    import s.implicits._
    val docs = MediaOps.syntheticMedia(spark, 50)
    val out = java.nio.file.Files.createTempDirectory("graft_media").toString
    docs.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).as[MediaOps.MediaDoc]
    assert(back.count() == 50)
    val a = docs.collect().sortBy(_.doc_id)
    val b = back.collect().sortBy(_.doc_id)
    a.zip(b).foreach { case (x, y) =>
      assert(x.mime == y.mime && x.media.sameElements(y.media) && x.width == y.width)
    }
  }

  test("feature extraction is deterministic and partitioning-invariant") {
    val docs = MediaOps.syntheticMedia(spark, 40)
    val f1 = MediaOps.extractFeatures(docs.repartition(1)).collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    val f8 = MediaOps.extractFeatures(docs.repartition(8)).collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(f1 == f8)
    assert(f1.values.forall(_.length == 8))
  }

  test("frame sampling: one frame per cadence step from duration metadata") {
    val s = spark
    import s.implicits._
    val docs = MediaOps.syntheticMedia(spark, 30)
    val frames = MediaOps.sampleFrames(docs, everyMs = 5000)
    val perDoc = frames.groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durations = docs.collect().map(d => d.doc_id -> d.duration_ms).toMap
    perDoc.foreach { case (id, n) =>
      assert(n == math.max(durations(id) / 5000, 1), s"doc $id")
    }
    assert(frames.agg(sum(length(col("frame")))).head.getLong(0) > 0)
  }

  test("resizeMedia: images AND AVI video resample for real; other rows pass through") {
    val resized = MediaOps.resizeMedia(MediaOps.syntheticMedia(spark, 30), 32, 32).collect()
    resized.foreach { d =>
      if (d.mime.startsWith("image/")) {
        assert(d.width == 32 && d.height == 32)
        val img = ImageCodec.decode(d.media) // REAL decode of the resized PNG
        assert(img.getWidth == 32 && img.getHeight == 32)
      } else if (d.mime == "video/avi") {
        assert(d.width == 32 && d.height == 32)
        val avi = VideoCodec.decode(d.media) // REAL decode of the re-encoded AVI
        assert(avi.width == 32 && avi.height == 32 && avi.frames.nonEmpty)
        assert(VideoCodec.frameImage(avi, 0).getWidth == 32)
      } else if (d.mime == "video/mp4" || d.mime == "video/webm") assert(d.height == 16) // untouched
      else assert(d.height == 0) // wav untouched (audio has no dims)
    }
    // the ORIGINAL image-only pass keeps its semantics under the old name:
    // video rows (even decodable AVIs) pass through byte-identical, so
    // pre-existing callers never start decoding/re-encoding video
    val legacy = MediaOps.resizeImages(MediaOps.syntheticMedia(spark, 30), 32, 32).collect()
    val orig = MediaOps.syntheticMedia(spark, 30).collect().map(d => d.doc_id -> d).toMap
    legacy.foreach { d =>
      if (d.mime.startsWith("image/")) assert(d.width == 32 && d.height == 32)
      else
        assert(
          d.height == orig(d.doc_id).height && d.media.sameElements(orig(d.doc_id).media),
          s"doc ${d.doc_id} must pass through"
        )
    }
  }

  test("ImageCodec: PNG roundtrip is lossless, features match known pixels") {
    // 2×2 image: top row white, bottom row black → 2-band luma [1, 0]
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0x000000); img.setRGB(1, 1, 0x000000)
    val png = ImageCodec.encodePng(img)
    val back = ImageCodec.decode(png)
    for (y <- 0 until 2; x <- 0 until 2)
      assert((back.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff), s"($x,$y)")
    val f = ImageCodec.features(png, dims = 2)
    assert(math.abs(f(0) - 1.0f) < 1e-6f && math.abs(f(1)) < 1e-6f, f.toSeq.toString)
    // synthetic corpus: image rows really decode at declared dimensions
    val doc = MediaOps.syntheticMedia(spark, 3).collect().find(_.mime == "image/png").get
    val dimg = ImageCodec.decode(doc.media)
    assert(dimg.getWidth == doc.width && dimg.getHeight == doc.height)
  }

  test("AudioCodec: WAV roundtrip via the JDK parser, band energies match known waveform") {
    // hand-rolled container must decode through the REAL javax.sound parser
    val wav = AudioCodec.syntheticWav(seed = 7, nSamples = 800)
    val samples = AudioCodec.decode(wav)
    assert(samples.length == 800)
    // known waveform: first half silence, second half full-scale square →
    // 2-band RMS ≈ [0, 1] (container built by the SAME pcmWav the generator uses)
    val pcm = Array.tabulate(600)(i => if (i < 300) 0.toShort else (if (i % 2 == 0) Short.MaxValue else (-Short.MaxValue).toShort))
    val f = AudioCodec.features(AudioCodec.pcmWav(pcm), dims = 2)
    assert(math.abs(f(0)) < 1e-6f && math.abs(f(1) - 1.0f) < 1e-4f, f.toSeq.toString)
    // synthetic corpus: audio rows really decode
    val doc = MediaOps.syntheticMedia(spark, 3).collect().find(_.mime == "audio/wav").get
    assert(AudioCodec.decode(doc.media).length > 0)
    // non-16-bit WAVs are CONVERTED, not rejected: 8-bit unsigned PCM
    val dataLen = 200
    val bb8 = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb8.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb8.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb8.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until dataLen).foreach(i => bb8.put((if (i < 100) 128 else 255).toByte)) // silence then loud
    val s8 = AudioCodec.decode(bb8.array())
    assert(s8.length == 200 && math.abs(s8(0).toInt) <= 256 && s8(150) > 20000, s"${s8(0)} ${s8(150)}")
  }

  test("ImageCodec resize: nearest-neighbor picks exact source pixels") {
    // 4×4 quadrant image downsampled to 2×2 must pick one pixel per quadrant
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val cols = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, cols((y / 2) * 2 + (x / 2)))
    val small = ImageCodec.decode(ImageCodec.resize(ImageCodec.encodePng(img), 2, 2))
    for (y <- 0 until 2; x <- 0 until 2)
      assert((small.getRGB(x, y) & 0xffffff) == cols(y * 2 + x), s"($x,$y)")
  }

  test("VideoCodec resize: an fps an Int can't carry is rejected, not clamped") {
    // a foreign file can declare strh rate/scale giving fps > Int.MaxValue
    // (garbage) or < 0.5 (a valid timelapse); re-encoding must refuse both
    // rather than silently re-time the stream
    def patched(scale: Int, rate: Int): Array[Byte] = {
      val frame = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val avi = VideoCodec.encodeAvi(IndexedSeq(frame), 10, mjpeg = false)
      // patch the video strh's dwScale/dwRate (body+20 / body+24)
      val pat = "strh".getBytes("US-ASCII")
      val strh = (0 until avi.length - 4).find(i => avi.slice(i, i + 4).sameElements(pat)).get
      val bb = java.nio.ByteBuffer.wrap(avi).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(strh + 8 + 20, scale).putInt(strh + 8 + 24, rate)
      avi
    }
    val huge = patched(1, 0xffffffff)
    assert(math.round(VideoCodec.decode(huge).fps) > Int.MaxValue) // the patch took
    val eHuge = intercept[IllegalArgumentException](VideoCodec.resize(huge, 2, 2))
    assert(eHuge.getMessage.contains("not re-encodable"), eHuge.getMessage)
    val timelapse = patched(10, 1) // 0.1 fps: one frame per 10 s, decodes fine
    assert(math.abs(VideoCodec.decode(timelapse).fps - 0.1) < 1e-9)
    val eSlow = intercept[IllegalArgumentException](VideoCodec.resize(timelapse, 2, 2))
    assert(eSlow.getMessage.contains("not re-encodable"), eSlow.getMessage)
  }

  test("frozen golden features: decode drift fails even when the q24 fixture is regenerated") {
    // The q24 parquet fixture's expected_f0/expected_dims columns are written
    // by the SAME build that later runs the query, so a decode bug introduced
    // in a fixture-regenerating build would agree with its own goldens there.
    // These literals were computed ONCE from a verified decode path and are
    // frozen: any later change to PNG/WAV decode, luma/band-RMS math, the
    // synthetic corpus recipe, or the batched extraction plumbing fails HERE,
    // independent of fixture regeneration. If a change is INTENTIONAL, re-pin
    // these values and bump the media fixture version in SparkEntry together.
    val golden = Map(
      0L -> Array(0.51335526f, 0.5095413f, 0.49177462f, 0.49906716f, 0.45949498f, 0.48620296f, 0.50683784f, 0.47418922f), // image/png
      1L -> Array(0.35816646f, 0.35491943f, 0.34624016f, 0.3737333f, 0.33352304f, 0.37646368f, 0.34985647f, 0.36530262f), // audio/wav
      2L -> Array(0.4436275f, 0.46985295f, 0.47401962f, 0.5703432f, 0.46678928f, 0.55968136f, 0.5345589f, 0.4604167f), // video/mp4 (stub)
      5L -> Array(0.5016454f, 0.4975648f, 0.48492736f, 0.4959594f, 0.50957566f, 0.48984927f, 0.4890013f, 0.5057904f), // video/avi MJPEG (real)
      11L -> Array(0.4975335f, 0.5010764f, 0.511262f, 0.49998498f, 0.50015396f, 0.49430504f, 0.4960963f, 0.49809873f) // video/avi raw-DIB (real)
    )
    val got = MediaOps
      .extractFeatures(MediaOps.syntheticMedia(spark, 12))
      .collect()
      .map(f => f.doc_id -> f.feature)
      .toMap
      .filter { case (id, _) => golden.contains(id) }
    assert(got.keySet == golden.keySet)
    for ((id, exp) <- golden) {
      // zip would silently truncate — a dims regression must fail too
      assert(got(id).length == exp.length, s"doc $id dims drifted: ${got(id).length} vs ${exp.length}")
      // MJPEG doc 5 rides the JDK's LOSSY JPEG codec: a JDK vendor/version
      // change to quantization/IDCT rounding may legitimately shift band
      // luma slightly, so its pin is loose (1e-3) where the lossless
      // PNG/WAV/DIB paths stay exact (1e-6)
      val tol = if (id == 5L) 1e-3f else 1e-6f
      for ((e, g) <- exp.zip(got(id)))
        assert(math.abs(e - g) < tol, s"doc $id drifted: expected ${exp.toSeq}, got ${got(id).toSeq}")
    }
  }

  test("media features feed ANN cosine top-k") {
    val emb = MediaOps.toEmbeddings(MediaOps.extractFeatures(MediaOps.syntheticMedia(spark, 60)))
    val top = Ann.bruteForceTopK(emb, emb.where(col("vec_id") < 2), 5)
    assert(top.count() == 10) // 2 queries × top-5
  }
}
