package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

/** REAL video path for the AVI container — RIFF parsing is plain byte work
  * and the two classic AVI payloads decode with the JDK alone: MJPEG frames
  * are independent JPEGs (`javax.imageio`), and uncompressed BI_RGB frames
  * are raw bottom-up BGR device-independent bitmaps. This narrows the former
  * all-video stub to formats whose bitstreams genuinely have no offline
  * decoder (H.264/VP9 in MP4/WebM stay on `MediaOps.FakeCodec`).
  *
  * Everything is a pure function of the input bytes — executor-safe and
  * deterministic at any parallelism, like [[ImageCodec]]/[[AudioCodec]].
  * The writer emits the minimal standard layout (`hdrl(avih, strl(strh,
  * strf))` + `movi` with word-aligned `NNdc`/`NNdb` chunks, NN = the video
  * stream's ordinal) so fixtures are ordinary AVI files, and the parser is
  * chunk-walking: unknown chunks (`idx1`, `JUNK`, other streams' chunks)
  * are skipped by their declared size.
  */
object VideoCodec {

  /** decoded container: frame payloads stay raw (JPEG bytes / DIB rows) so
    * frame-sampling can emit them without re-encoding; [[frameImage]] turns
    * one into pixels on demand. `bitCount`/`topDown` come from `strf`
    * (BITMAPINFOHEADER: biBitCount, sign of biHeight) and matter only for
    * the raw-DIB path.
    */
  final case class Avi(
      width: Int,
      height: Int,
      fps: Double,
      mjpeg: Boolean,
      bitCount: Int,
      topDown: Boolean,
      frames: IndexedSeq[Array[Byte]]
  )

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI "

  // fourcc spellings that mean MJPEG, from strh's handler or strf's
  // biCompression (decode() runs per row on the executor hot path — constant)
  private val MjpegTags = Set("MJPG", "mjpg", "dmb1", "DMB1")

  private def fourcc(b: Array[Byte], at: Int): String =
    new String(b, at, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) | ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  /** parse an AVI: header fields from `avih`/`strh`/`strf` of the first
    * video stream, frame payloads from the `movi` list's chunks carrying
    * THAT stream's ordinal (`NNdc` compressed / `NNdb` uncompressed, where
    * NN is the video stream's position among the strh headers — an
    * audio-first mux puts video at `01dc`), in file order. Walks only
    * the declared RIFF payload (trailing padding after it is legal and
    * ignored) and REJECTS codecs it cannot decode — silent garbage pixels
    * are the worst failure mode for a decoder, so anything that is neither
    * MJPEG (strh handler or strf biCompression spelling it) nor
    * uncompressed 24/32-bit BI_RGB throws.
    */
  def decode(bytes: Array[Byte]): Avi = decode(bytes, keepFramePayloads = true)

  /** metadata-only parse: identical container walk, but frame payloads are
    * NOT copied out of the buffer (each frame is the shared empty array, so
    * `frames.size`/width/height/fps stay exact) — the metadata path reads a
    * large AVI without duplicating its whole movi payload in memory. The
    * result must not feed features/resize/frameImage.
    */
  private[multimodal] def decodeMeta(bytes: Array[Byte]): Avi = decode(bytes, keepFramePayloads = false)

  private val EmptyFrame = Array.emptyByteArray

  private def decode(bytes: Array[Byte], keepFramePayloads: Boolean): Avi = {
    require(isAvi(bytes), "not an AVI (RIFF/'AVI ' header missing)")
    var width = 0
    var height = 0
    var fps = 0.0
    var handler = ""
    var compression: Option[Long] = None // strf biCompression (0 = BI_RGB)
    var bitCount = 24
    var topDown = false
    // strf carries no stream id — it belongs to the strh that precedes it in
    // the same strl LIST, so only the one right after the video strh counts
    var expectVideoStrf = false
    // movi chunk ids carry the STREAM ORDINAL ("01dc" = stream 1 compressed):
    // count strh chunks in hdrl order to learn which ordinal the video
    // stream holds — an AVI muxed audio-first carries its frames as
    // '01dc'/'01db', and hard-coding stream 00 would decode it frame-less
    var streamOrdinal = -1
    var videoStream = -1
    var frameIdDc = "" // f"%02ddc" / f"%02ddb" of the video stream
    var frameIdDb = ""
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    // walk one chunk run [from, until); LISTs recurse into their payload.
    // Depth-bounded: crafted nesting must reject with the contract's IAE,
    // never StackOverflowError
    def walk(from: Int, until: Int, depth: Int): Unit = {
      require(depth <= 32, "AVI LIST nesting deeper than 32 levels")
      var p = from
      while (p + 8 <= until) {
        val id = fourcc(bytes, p)
        val size = u32(bytes, p + 4) // Long: a huge declared size must not wrap the bound check
        val body = p + 8
        require(body.toLong + size <= until, s"truncated AVI chunk '$id' at $p")
        id match {
          case "LIST" if size >= 4 => walk(body + 4, body + size.toInt, depth + 1) // skip the list type fourcc
          case "avih" =>
            require(size >= 40, s"avih chunk too short ($size bytes)")
            val mspf = u32(bytes, body) // dwMicroSecPerFrame
            if (mspf > 0) fps = 1e6 / mspf
            width = u32(bytes, body + 32).toInt
            height = u32(bytes, body + 36).toInt
          case "strh" =>
            // EVERY strh claims the next ordinal, even a malformed short one —
            // skipping it would shift all later streams' chunk ids
            streamOrdinal += 1
            if (size >= 28 && fourcc(bytes, body) == "vids" && handler.isEmpty) {
              val scale = u32(bytes, body + 20)
              val rate = u32(bytes, body + 24)
              if (scale > 0 && rate > 0) fps = rate.toDouble / scale
              handler = fourcc(bytes, body + 4)
              videoStream = streamOrdinal
              frameIdDc = f"$videoStream%02ddc"
              frameIdDb = f"$videoStream%02ddb"
              expectVideoStrf = true
            } else expectVideoStrf = false // an audio/other stream's strf follows
          case "strf" if size >= 20 && expectVideoStrf =>
            // BITMAPINFOHEADER: biHeight's sign carries row order
            expectVideoStrf = false
            val biHeight = u32(bytes, body + 8).toInt
            topDown = biHeight < 0
            bitCount = ((bytes(body + 14) & 0xff) | ((bytes(body + 15) & 0xff) << 8))
            compression = Some(u32(bytes, body + 16))
          case fid if videoStream >= 0 && (fid == frameIdDc || fid == frameIdDb) =>
            frames += (if (keepFramePayloads) java.util.Arrays.copyOfRange(bytes, body, body + size.toInt) else EmptyFrame)
          case _ => () // idx1, JUNK, other streams' chunks
        }
        p = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
    }
    // bound by the declared RIFF size: bytes after it are legal trailing
    // padding. Streaming writers leave dwSize = 0 (or nonsense smaller than
    // one chunk header) in files players still accept — fall back to the
    // real length for those; an understated-but-plausible size is honored
    // (that is the padding contract, and a frame-less result fails loud in
    // features()/sampleFrames, never silently).
    val declaredEnd = 8L + u32(bytes, 4)
    walk(12, if (declaredEnd < 20) bytes.length else math.min(bytes.length.toLong, declaredEnd).toInt, 0)
    require(width > 0 && height > 0, "AVI without avih dimensions")
    require(fps > 0, "AVI without a frame rate")
    def fourccOf(v: Long): String = new String(Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte), "ISO-8859-1")
    val mjpeg = MjpegTags.contains(handler) || compression.exists(c => MjpegTags.contains(fourccOf(c)))
    if (!mjpeg) {
      // the raw-DIB path NEEDS a parsed video strf: without one, bit depth
      // and compression would be a silent-garbage guess — `contains(0)`,
      // not a default, so a missing/short strf (or one skipped because its
      // vids strh was short) REJECTS instead of assuming 24bpp BI_RGB
      val rawRgb = compression.contains(0L) && (bitCount == 24 || bitCount == 32)
      require(
        rawRgb,
        s"unsupported AVI codec (handler='$handler', biCompression=${compression.map(fourccOf).getOrElse("<no video strf>")}, " +
          s"biBitCount=$bitCount): only MJPEG and uncompressed 24/32-bit BI_RGB decode offline"
      )
    }
    Avi(width, height, fps, mjpeg, bitCount, topDown, frames.toIndexedSeq)
  }

  /** one frame payload → pixels: JPEG via ImageIO, or raw BI_RGB DIB rows —
    * 24 or 32 bpp BGR(X), rows padded to 4 bytes, bottom-up unless strf's
    * biHeight was negative (top-down)
    */
  def frameImage(avi: Avi, i: Int): BufferedImage = {
    val payload = avi.frames(i)
    if (avi.mjpeg) {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, s"undecodable MJPEG frame $i")
      img
    } else {
      val bpp = avi.bitCount / 8
      val stride = (avi.width * bpp + 3) & ~3
      require(payload.length >= stride * avi.height, s"short DIB frame $i")
      val img = new BufferedImage(avi.width, avi.height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < avi.height) {
        val row = (if (avi.topDown) y else avi.height - 1 - y) * stride
        var x = 0
        while (x < avi.width) {
          val o = row + x * bpp // 32bpp: 4th byte (BGRX padding) ignored
          val bgr = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) | ((payload(o + 2) & 0xff) << 16)
          img.setRGB(x, y, bgr)
          x += 1
        }
        y += 1
      }
      img
    }
  }

  /** dims-wide feature vector: per-frame [[ImageCodec.featuresOf]] band
    * luma, averaged over all frames — a real temporal-mean pixel feature
    * with the same shape as the image/audio features.
    */
  def features(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
    val avi = decode(bytes)
    require(avi.frames.nonEmpty, "AVI with no video frames")
    val acc = new Array[Double](dims)
    var i = 0
    while (i < avi.frames.size) {
      val f = ImageCodec.featuresOf(frameImage(avi, i), dims)
      var d = 0
      while (d < dims) { acc(d) += f(d); d += 1 }
      i += 1
    }
    Array.tabulate(dims)(d => (acc(d) / avi.frames.size).toFloat)
  }

  /** deterministic synthetic AVI (tests/fixtures — no external data): seeded
    * frames written through the real container layout, MJPEG (JDK JPEG
    * encoder) or lossless raw DIB.
    */
  def syntheticAvi(seed: Long, w: Int, h: Int, nFrames: Int, fps: Int, mjpeg: Boolean): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val frames = IndexedSeq.tabulate(nFrames) { _ =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rnd.nextInt(0x1000000)); x += 1 }
        y += 1
      }
      img
    }
    encodeAvi(frames, fps, mjpeg)
  }

  /** nearest-neighbor per-frame resize, re-encoded in the SAME codec and at
    * the same fps — the video analog of [[ImageCodec.resize]] (integer-math
    * sampling, deterministic; the raw-DIB path is pixel-exact, MJPEG pays
    * one JPEG re-encode)
    */
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val avi = decode(bytes)
    require(avi.frames.nonEmpty, "AVI with no video frames")
    val resized = IndexedSeq.tabulate(avi.frames.size)(i => ImageCodec.resizeOf(frameImage(avi, i), w, h))
    // encodeAvi takes integer fps; container fps is rate/scale and our
    // writer always emitted integers, so rounding only touches foreign
    // files. Round in Long and REJECT anything an integer can't carry —
    // both a garbage multi-billion fps AND a sub-0.5-fps timelapse (which
    // rounds to 0): clamping either would silently re-time the stream
    val fps = math.round(avi.fps)
    require(fps >= 1 && fps <= Int.MaxValue, s"fps ${avi.fps} not re-encodable as a positive Int frame rate")
    encodeAvi(resized, fps.toInt, avi.mjpeg)
  }

  /** write frames as a standard minimal AVI. `audioFirst` muxes a silent
    * PCM audio stream as stream 0 (auds strl before the video strl, one
    * `00wb` chunk in movi) so the video stream lands at ordinal 1 with
    * `01dc`/`01db` frame chunks — the layout real muxers produce for files
    * with an audio track, used by fixtures to pin the ordinal-tracking
    * decode path.
    */
  def encodeAvi(frames: IndexedSeq[BufferedImage], fps: Int, mjpeg: Boolean, audioFirst: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "encodeAvi needs frames and a positive fps")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val payloads = frames.map { img =>
      require(img.getWidth == w && img.getHeight == h, "all frames must share one size")
      if (mjpeg) {
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      } else {
        val stride = (w * 3 + 3) & ~3
        val b = new Array[Byte](stride * h)
        var y = 0
        while (y < h) {
          val row = (h - 1 - y) * stride
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            b(row + x * 3) = (rgb & 0xff).toByte
            b(row + x * 3 + 1) = ((rgb >> 8) & 0xff).toByte
            b(row + x * 3 + 2) = ((rgb >> 16) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        b
      }
    }

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + body.length + (body.length & 1)).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array() // trailing pad byte (if odd) is already zero
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
    avih.putInt(frames.size).putInt(0).putInt(if (audioFirst) 2 else 1).putInt(0)
    avih.putInt(w).putInt(h) // + 4 reserved ints, zero
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put((if (mjpeg) "MJPG" else "DIB ").getBytes("US-ASCII"))
    strh.putInt(0).putInt(0).putInt(0)
    strh.putInt(1).putInt(fps) // dwScale / dwRate
    strh.putInt(0).putInt(frames.size).putInt(0).putInt(0).putInt(0)
    strh.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    if (mjpeg) strf.put("MJPG".getBytes("US-ASCII")) else strf.putInt(0) // biCompression (BI_RGB = 0)
    strf.putInt(payloads.map(_.length).max) // biSizeImage (informational)

    // optional leading audio stream: 8 kHz 8-bit mono PCM silence
    val audioStrl = if (!audioFirst) Array.emptyByteArray
    else {
      val astrh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      astrh.put("auds".getBytes("US-ASCII")).putInt(0) // no handler fourcc for PCM
      astrh.putInt(0).putInt(0).putInt(0)
      astrh.putInt(1).putInt(8000) // dwScale / dwRate
      astrh.putInt(0).putInt(8000).putInt(0).putInt(0).putInt(0)
      val wfx = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN) // WAVEFORMATEX sans cbSize
      wfx.putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
      list("strl", chunk("strh", astrh.array()) ++ chunk("strf", wfx.array()))
    }
    val vidOrd = if (audioFirst) "01" else "00"
    val hdrl = list(
      "hdrl",
      chunk("avih", avih.array()) ++ audioStrl ++
        list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array()))
    )
    val audioChunk = if (audioFirst) chunk("00wb", new Array[Byte](8000)) else Array.emptyByteArray
    val movi = list("movi", audioChunk ++ payloads.toArray.flatMap(p => chunk((if (mjpeg) vidOrd + "dc" else vidOrd + "db"), p)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }
}
