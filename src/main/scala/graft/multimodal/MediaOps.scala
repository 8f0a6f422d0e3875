package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY columns with typed
  * metadata, processed in partition-batched passes (the Scala analog of
  * mapInPandas — one JVM pass per partition over an iterator of rows, so a
  * real codec would amortize its setup per batch exactly like a Pandas UDF).
  *
  * IMAGE decode is REAL (`ImageCodec`, JDK `javax.imageio`: bytes → pixels
  * → luma features + nearest-neighbor resize), AUDIO decode is REAL
  * (`AudioCodec`, JDK `javax.sound.sampled`: WAV → PCM samples → band RMS
  * features), and VIDEO decode is REAL for the AVI container
  * (`VideoCodec`: RIFF parsing + per-frame JPEG via `javax.imageio` for
  * MJPEG, raw bottom-up BGR rows for uncompressed BI_RGB), and MP4/WebM
  * CONTAINER METADATA is REAL (`Mp4Codec`: ISO BMFF moov/mvhd/tkhd →
  * duration/dims/sample count, mdat → the bitstream payload; `EbmlCodec`:
  * EBML Info/Tracks → duration/timecode-scale/dims, Cluster SimpleBlock →
  * the bitstream payload). Only the H.264/VP9 BITSTREAM decode itself —
  * features and frame payloads for MP4/WebM rows — remains on the clearly
  * marked STUB (`FakeCodec`), a
  * deterministic pure function of the bytes. The surrounding dataflow —
  * schema, partitioning, batch iteration, feature/resize/frame-sample
  * plans — is identical for all modalities; swapping FakeCodec for e.g. a
  * JNI ffmpeg binding changes no plan shape.
  */
object MediaOps {

  /** typed media row: media bytes + mime + metadata struct */
  final case class MediaDoc(
      doc_id: Long,
      mime: String,
      media: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Int
  )

  final case class MediaFeature(doc_id: Long, mime: String, feature: Array[Float])

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** rows routed to the REAL [[VideoCodec]] path (one predicate for
    * extractFeatures and sampleFrames, so the two can never drift apart)
    */
  private def isAviMime(mime: String): Boolean =
    mime == "video/avi" || mime == "video/x-msvideo" || mime == "video/vnd.avi"

  /** ======== STUB BOUNDARY (codec-less video BITSTREAMS only — images use
    * ImageCodec, audio uses AudioCodec, AVI video uses VideoCodec, and
    * MP4/WebM CONTAINER METADATA is real via Mp4Codec/EbmlCodec:
    * duration/dims parse from moov/mvhd/tkhd resp. Info/Tracks, and the
    * bytes handed to this stub are the actual `mdat` / Cluster-SimpleBlock
    * bitstream payload, not container headers) ================
    * A real implementation decodes the bitstream with a video codec; the
    * JDK has none for H.264/VP9, so for MP4/WebM rows this deterministic
    * fake stands in for FEATURES and FRAME PAYLOADS only: "frames" are
    * byte slices, features are a fixed-width fold of the bytes. Replace
    * with a codec binding; signatures stay identical (VideoCodec
    * demonstrates the swap for AVI).
    */
  object FakeCodec {
    /** "decode" = hand the stub the real bitstream: for a parseable MP4
      * that is the `mdat` payload, for a parseable WebM the first Cluster's
      * SimpleBlock frame (container headers are metadata, not pixels); for
      * anything else the bytes as-is
      */
    def decode(media: Array[Byte]): Array[Byte] =
      if (Mp4Codec.isMp4(media)) Mp4Codec.mdatPayload(media).getOrElse(media)
      else if (EbmlCodec.isEbml(media)) EbmlCodec.clusterPayload(media).getOrElse(media)
      else media

    def features(media: Array[Byte], dims: Int = 8): Array[Float] = {
      val acc = new Array[Float](dims)
      var i = 0
      while (i < media.length) {
        acc(i % dims) += (media(i) & 0xff) / 255.0f
        i += 1
      }
      val n = math.max(media.length / dims, 1)
      acc.map(_ / n)
    }

    def resize(media: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // fake: proportional byte resample
      val target = math.max(w * h / 64, 1)
      Array.tabulate(math.min(target, math.max(media.length, 1)))(i => media(i % math.max(media.length, 1)))
    }
  }
  // ======== END STUB BOUNDARY ================================================

  /** deterministic synthetic media corpus (tests/benches — no external data) */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaDoc] = {
    import spark.implicits._
    spark
      .range(n.toLong)
      .map { id =>
        val w = 16 + (id % 48).toInt
        val mime = (id % 3) match {
          case 0 => "image/png"
          case 1 => "audio/wav"
          case _ =>
            if (id % 6 == 5) "video/avi"
            else if ((id / 6) % 2 == 1) "video/webm"
            else "video/mp4"
        }
        // image rows carry REAL (decodable) PNG bytes, audio rows REAL WAV
        // bytes, half the video rows REAL AVI bytes (alternating MJPEG /
        // lossless raw-DIB payloads, frame count matching the duration
        // metadata at 2 fps), and the mp4/webm rows a REAL container — ISO
        // BMFF with parseable moov/mvhd/tkhd metadata, or EBML/Matroska
        // with parseable Info/Tracks metadata — whose mdat / Cluster
        // bitstream is seeded opaque bytes for the FakeCodec stub path
        val durationMs = 1000 * (1 + (id % 30)).toInt
        val nSamples = 400 + (id % 400).toInt
        val bytes = (id % 3) match {
          case 0 => ImageCodec.syntheticPng(seed = id, w = w, h = 16)
          case 1 => AudioCodec.syntheticWav(seed = id, nSamples = nSamples)
          case _ if id % 6 == 5 =>
            VideoCodec.syntheticAvi(
              seed = id,
              w = w,
              h = 16,
              nFrames = 2 * (1 + (id % 30)).toInt,
              fps = 2,
              mjpeg = (id / 6) % 2 == 0
            )
          case _ if (id / 6) % 2 == 1 =>
            EbmlCodec.syntheticWebm(
              seed = id,
              w = w,
              h = 16,
              durationMs = durationMs.toLong,
              audioTrackFirst = (id / 3) % 2 == 0, // half audio-first: dims must come from the TrackType-1 entry
              unknownSizeSegment = (id / 3) % 4 == 1 // quarter streaming-mux open Segment size
            )
          case _ =>
            Mp4Codec.syntheticMp4(
              seed = id,
              w = w,
              h = 16,
              durationMs = durationMs.toLong,
              nSamples = 2L * (1 + (id % 30)), // 2 fps, like the AVI rows
              audioTrackFirst = (id / 3) % 2 == 0, // half audio-first: dims must come from the 'vide' trak
              v1Boxes = (id / 3) % 4 == 1 // quarter 64-bit mvhd/tkhd
            )
        }
        // metadata columns are HONEST per modality — they state exactly what
        // the container bytes carry, so extractMetadata's live byte parse
        // can be oracle-compared against them column-for-column:
        // images have no duration; audio has no dims and a duration that
        // follows its sample count; video carries all three
        (id % 3) match {
          case 0 => MediaDoc(id, mime, bytes, w, 16, 0)
          case 1 => MediaDoc(id, mime, bytes, 0, 0, math.round(nSamples * 1000.0 / 8000).toInt)
          case _ => MediaDoc(id, mime, bytes, w, 16, durationMs)
        }
      }
  }

  /** parsed-from-bytes media metadata — every column re-derived from the
    * binary payload by the REAL container parsers
    */
  final case class MediaMeta(doc_id: Long, mime: String, width: Int, height: Int, duration_ms: Int)

  /** partition-batched metadata extraction: REAL container parse for every
    * modality — PNG dims via ImageIO, WAV duration via javax.sound, AVI via
    * the RIFF walker, MP4 via the ISO BMFF walker (moov/mvhd/tkhd), WebM
    * via the EBML walker (Info/Tracks) — no stub anywhere on this path.
    * Unknown mimes REJECT loudly: emitting zeros would read as real
    * metadata downstream.
    */
  def extractMetadata(media: Dataset[MediaDoc]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    // EVERY modality's ms conversion goes through one guard: a duration an
    // Int can't carry (hostile WAV frame counts, an avih dwMicroSecPerFrame
    // near 2^32 giving fps ≈ 2e-4, the MP4 'unknown duration' sentinel)
    // must reject loudly, never .toInt-wrap into plausible garbage — silent
    // wrong metadata is the failure mode this path exists to avoid
    def intMs(docId: Long, v: Long): Int = {
      require(v >= 0 && v <= Int.MaxValue, s"doc $docId: duration ${v}ms outside Int range")
      v.toInt
    }
    media.mapPartitions { batch =>
      batch.map { d =>
        if (d.mime.startsWith("image/")) {
          val img = ImageCodec.decode(d.media)
          MediaMeta(d.doc_id, d.mime, img.getWidth, img.getHeight, 0)
        } else if (d.mime.startsWith("audio/")) {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(d.media))
          val ms = intMs(d.doc_id, math.round(ais.getFrameLength * 1000.0 / ais.getFormat.getFrameRate))
          MediaMeta(d.doc_id, d.mime, 0, 0, ms)
        } else if (isAviMime(d.mime)) {
          // decodeMeta: same container walk, frame PAYLOADS not copied —
          // metadata needs only count/dims/fps, not a second movi in memory
          val avi = VideoCodec.decodeMeta(d.media)
          MediaMeta(d.doc_id, d.mime, avi.width, avi.height, intMs(d.doc_id, math.round(avi.frames.size * 1000.0 / avi.fps)))
        } else if (Mp4Codec.isMp4(d.media)) {
          val m = Mp4Codec.parseMeta(d.media)
          MediaMeta(d.doc_id, d.mime, m.width, m.height, intMs(d.doc_id, m.durationMs))
        } else if (EbmlCodec.isEbml(d.media)) {
          val m = EbmlCodec.parseMeta(d.media)
          MediaMeta(d.doc_id, d.mime, m.width, m.height, intMs(d.doc_id, m.durationMs))
        } else
          throw new IllegalArgumentException(s"doc ${d.doc_id}: no metadata parser for mime '${d.mime}'")
      }
    }
  }

  /** partition-batched feature extraction (mapInPandas-shaped: per-partition
    * setup, then a streaming pass over the rows).
    */
  def extractFeatures(media: Dataset[MediaDoc], dims: Int = 8): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      // per-batch codec setup would happen HERE (ImageIO needs none)
      batch.map { d =>
        val f =
          if (d.mime.startsWith("image/")) ImageCodec.features(d.media, dims) // REAL decode
          else if (d.mime.startsWith("audio/")) AudioCodec.features(d.media, dims) // REAL decode
          else if (isAviMime(d.mime)) VideoCodec.features(d.media, dims) // REAL decode (per-frame mean)
          else FakeCodec.features(FakeCodec.decode(d.media), dims) // stub (codec-less video only)
        MediaFeature(d.doc_id, d.mime, f)
      }
    }
  }

  /** resize pass: REAL nearest-neighbor pixel resample for images
    * (ImageCodec) and AVI video (VideoCodec, per frame, same codec);
    * metadata updated; rows of other modalities pass through untouched
    */
  def resizeMedia(media: Dataset[MediaDoc], w: Int, h: Int): Dataset[MediaDoc] =
    resizePass(media, w, h, includeVideo = true)

  /** the original image-ONLY resize pass, kept with its original semantics:
    * every non-image row — including AVI video — passes through untouched,
    * so existing callers never start decoding (and possibly rejecting or
    * re-encoding) video rows under the old name. Use [[resizeMedia]] for
    * the image+video pass.
    */
  def resizeImages(media: Dataset[MediaDoc], w: Int, h: Int): Dataset[MediaDoc] =
    resizePass(media, w, h, includeVideo = false)

  /** ONE copy of the per-row resize rule (mime dispatch + metadata update)
    * behind both public passes, so the image branch can never drift between
    * them — only the video leg is switched
    */
  private def resizePass(media: Dataset[MediaDoc], w: Int, h: Int, includeVideo: Boolean): Dataset[MediaDoc] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { d =>
        if (d.mime.startsWith("image/")) d.copy(media = ImageCodec.resize(d.media, w, h), width = w, height = h)
        else if (includeVideo && isAviMime(d.mime)) d.copy(media = VideoCodec.resize(d.media, w, h), width = w, height = h)
        else d
      }
    }
  }

  /** frame sampling: one row per sampled frame, `everyMs` cadence from the
    * duration metadata (one shared count rule for every video row). AVI rows
    * emit the REAL frame payload nearest each sample instant (frame index =
    * sample time × container fps); codec-less rows emit stub byte slices.
    */
  def sampleFrames(media: Dataset[MediaDoc], everyMs: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(_.mime.startsWith("video/"))
      .flatMap { d =>
        val n = math.max(d.duration_ms / everyMs, 1)
        if (isAviMime(d.mime)) {
          val avi = VideoCodec.decode(d.media)
          // decode() permits a frame-less container (header inspection);
          // sampling one has no frames to emit — fail loud, not frames(-1)
          require(avi.frames.nonEmpty, s"AVI doc ${d.doc_id} has no video frames to sample")
          (0 until n).iterator.map { i =>
            val idx = math.min((i.toLong * everyMs * avi.fps / 1000.0).toInt, avi.frames.size - 1)
            Frame(d.doc_id, i, avi.frames(idx))
          }
        } else {
          // stub slices cut the BITSTREAM (mdat payload for MP4, Cluster
          // SimpleBlock for WebM), not container headers — same boundary
          // as FakeCodec.features
          val payload = FakeCodec.decode(d.media)
          val chunk = math.max(payload.length / n, 1)
          (0 until n).iterator.map { i =>
            val from = math.min(i * chunk, math.max(payload.length - 1, 0))
            val until = math.min(from + chunk, payload.length)
            Frame(d.doc_id, i, java.util.Arrays.copyOfRange(payload, from, until))
          }
        }
      }
  }

  /** media features → embeddings table compatible with graft.ann.Ann */
  def toEmbeddings(features: Dataset[MediaFeature]): DataFrame =
    features.toDF().select(
      col("doc_id").as("vec_id"),
      transform(col("feature"), _.cast("double")).as("embedding")
    )
}
