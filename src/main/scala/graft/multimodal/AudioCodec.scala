package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** REAL audio path — `javax.sound.sampled` ships with the JDK, so WAV/PCM
  * decode needs no external library (same move as ImageCodec for PNG/JPEG).
  * This replaces the FakeCodec stub for audio MIME rows: bytes are parsed by
  * the JDK's actual WAV reader into PCM samples, and features are per-band
  * RMS energy over the real waveform. Only VIDEO decode remains stubbed
  * (the JDK has no H.264/VP9 decoder; that genuinely needs an external
  * codec binding).
  *
  * Pure functions of the input bytes — deterministic at any parallelism,
  * headless-safe in executors.
  */
object AudioCodec {

  /** deterministic synthetic WAV (tests/fixtures — no external data):
    * seeded PCM16 mono samples in a hand-rolled RIFF container (byte-stable
    * across JVMs, unlike encoder round-trips). Decodable by any WAV reader.
    */
  /** PCM16 mono samples → RIFF/WAVE container bytes (shared by the
    * synthetic generator and the known-waveform specs, so the header layout
    * has ONE definition).
    */
  def pcmWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1) // PCM
    out.putShort(1) // mono
    out.putInt(sampleRate)
    out.putInt(sampleRate * 2) // byte rate
    out.putShort(2) // block align
    out.putShort(16) // bits/sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  def syntheticWav(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val samples = Array.tabulate(nSamples) { i =>
      // seeded tone + noise: audibly structured, deterministic
      val tone = math.sin(2 * math.Pi * (220.0 + (seed % 7) * 55.0) * i / sampleRate)
      val s = ((tone * 0.5 + (rnd.nextDouble() - 0.5) * 0.2) * Short.MaxValue).toInt
      math.max(Short.MinValue.toInt, math.min(Short.MaxValue.toInt, s)).toShort
    }
    pcmWav(samples, sampleRate)
  }

  /** REAL decode via the JDK's WAV parser → PCM16 samples (mono: channel 0
    * when multi-channel). Non-16-bit encodings (8/24/32-bit, float, a-law)
    * are CONVERTED by the JDK pipeline rather than rejected — those bytes
    * are decodable, and one odd row must not fail a whole Spark stage.
    * Throws only on genuinely unparsable bytes.
    */
  def decode(bytes: Array[Byte]): Array[Short] = {
    val src = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val srcFmt = src.getFormat
    val needsConversion =
      srcFmt.getSampleSizeInBits != 16 ||
        srcFmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
    val in =
      if (!needsConversion) src
      else
        AudioSystem.getAudioInputStream(
          new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            srcFmt.getSampleRate,
            16,
            srcFmt.getChannels,
            srcFmt.getChannels * 2,
            srcFmt.getSampleRate,
            false
          ),
          src
        )
    try {
      val fmt = in.getFormat
      val frameSize = fmt.getFrameSize
      val raw = in.readAllBytes()
      val n = raw.length / frameSize
      val bb = java.nio.ByteBuffer.wrap(raw).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN
      )
      Array.tabulate(n)(i => bb.getShort(i * frameSize)) // channel 0 of each frame
    } finally in.close()
  }

  /** dims-wide feature vector: RMS energy (normalized to [0,1]) of `dims`
    * consecutive time bands of the real decoded waveform — the audio analog
    * of ImageCodec's luma bands.
    */
  def features(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
    val samples = decode(bytes)
    val acc = new Array[Double](dims)
    val cnt = new Array[Long](dims)
    val n = samples.length
    var i = 0
    while (i < n) {
      // long arithmetic: i * dims overflows Int past ~2^31/dims samples
      // (a ~90-minute 48 kHz stereo file is enough to hit it)
      val band = math.min((i.toLong * dims / math.max(n, 1)).toInt, dims - 1)
      val x = samples(i).toDouble / Short.MaxValue
      acc(band) += x * x
      cnt(band) += 1
      i += 1
    }
    Array.tabulate(dims)(b => if (cnt(b) == 0) 0.0f else math.sqrt(acc(b) / cnt(b)).toFloat)
  }
}
