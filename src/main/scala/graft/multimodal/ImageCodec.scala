package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image path — `javax.imageio` ships with the JDK, so PNG/JPEG decode
  * needs no external library. This replaces the FakeCodec stub for image
  * MIME rows: bytes are decoded to actual pixels, features are computed
  * from pixel luma, and resize is a deterministic nearest-neighbor resample
  * (manual integer-math sampling, NOT AWT rendering — Graphics2D
  * interpolation can vary with rendering hints/platform; `x·srcW/dstW`
  * cannot). FakeCodec remains, clearly fenced, for audio/video only.
  *
  * Everything here is a pure function of the input bytes: safe in executors
  * (no display needed; BufferedImage/ImageIO are headless-capable) and
  * deterministic at any parallelism.
  */
object ImageCodec {

  /** deterministic synthetic PNG (tests/fixtures — no external data): pixels
    * from a seeded generator, losslessly encoded, so decode(encode(px)) == px
    * regardless of encoder byte layout.
    */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, rnd.nextInt(0x1000000))
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image bytes")
    img
  }

  /** dims-wide feature vector: mean luma (Rec.601 weights, normalized to
    * [0,1]) of `dims` horizontal bands — a real, deterministic pixel-space
    * feature with the same shape FakeCodec emits for the other modalities.
    */
  def features(bytes: Array[Byte], dims: Int = 8): Array[Float] =
    featuresOf(decode(bytes), dims)

  /** the same band-luma feature over an already-decoded image (shared with
    * [[VideoCodec]], whose frames arrive as `BufferedImage`s)
    */
  def featuresOf(img: BufferedImage, dims: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val acc = new Array[Double](dims)
    val cnt = new Array[Long](dims)
    var y = 0
    while (y < h) {
      val band = math.min(y * dims / h, dims - 1)
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        acc(band) += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        cnt(band) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(dims)(i => if (cnt(i) == 0) 0.0f else (acc(i) / cnt(i)).toFloat)
  }

  /** nearest-neighbor resize, re-encoded as PNG */
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    encodePng(resizeOf(decode(bytes), w, h))

  /** the nearest-neighbor kernel on an already-decoded image — ONE copy of
    * the integer-math sampling rule, shared with [[VideoCodec.resize]]'s
    * per-frame path (like [[featuresOf]] for the band-luma feature)
    */
  def resizeOf(src: BufferedImage, w: Int, h: Int): BufferedImage = {
    val sw = src.getWidth
    val sh = src.getHeight
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = math.min(y * sh / h, sh - 1)
      var x = 0
      while (x < w) {
        val sx = math.min(x * sw / w, sw - 1)
        dst.setRGB(x, y, src.getRGB(sx, sy) & 0xffffff)
        x += 1
      }
      y += 1
    }
    dst
  }
}
