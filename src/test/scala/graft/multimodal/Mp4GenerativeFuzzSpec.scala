package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer

/** GENERATION-based MP4 fuzz (vs `ContainerFuzzSpec`'s mutation fuzz): a
  * seeded generator assembles box trees from scratch with its OWN low-level
  * writer — independent of `Mp4Codec.syntheticMp4`, so writer bugs cannot
  * mask parser bugs — and walks a much wider structural space:
  *
  *  - every size encoding the walker accepts: 32-bit, 64-bit `largesize`
  *    (including on container boxes), and `size == 0` (to-end-of-container,
  *    last box only);
  *  - v0/v1 mvhd+tkhd mixed per box, not per file;
  *  - zero-length unknown leaves, `free` padding, unknown containers with
  *    hostile interiors the walker must skip WITHOUT descending;
  *  - decoy traks (audio, no-hdlr, 0×0 vide-after-vide) around the real one;
  *  - structurally-valid-but-hostile cases that must reject LOUDLY
  *    (IllegalArgumentException, never ArrayIndexOutOfBounds / negative-size
  *    / StackOverflow / OOM): `largesize` near Long.MaxValue (the `p +
  *    boxSize` overflow wrap), largesize smaller than its own 16-byte
  *    header, short known leaves at every parsed type, the all-ones
  *    duration sentinel in both mvhd versions, v1 durations past the ms-
  *    conversion overflow gate, and a > 32-level nesting bomb;
  *  - truncation at EVERY byte boundary of every parsed box (a full
  *    per-byte sweep of whole files — same-answer-or-loud-reject).
  *
  * Case count: `2 * N_GEN` generated trees (valid + hostile) plus the
  * per-byte truncation sweeps — ≥ 2000 hostile-or-valid cases at the
  * default sizing, matching the AVI/MP4 mutation fuzzer's width.
  */
class Mp4GenerativeFuzzSpec extends AnyFunSuite {

  // 800 valid trees + 800 hostile trees + ~24 full truncation sweeps of
  // ~700-1700-byte files (≈ 30k truncation parses) ≥ the 2000-case bar
  private val N_GEN = sys.props.getOrElse("graft.genFixtures", "800").toInt
  private val N_SWEEP = sys.props.getOrElse("graft.sweepFixtures", "24").toInt

  private def loudOnly[A](what: String)(body: => A): Option[A] =
    try Some(body)
    catch {
      case _: IllegalArgumentException => None
      case e: Throwable => fail(s"$what must reject with IllegalArgumentException, threw ${e.getClass.getName}: ${e.getMessage}")
    }

  // ---- independent low-level writer ----------------------------------------

  private def be32(v: Long): Array[Byte] = ByteBuffer.allocate(4).putInt(v.toInt).array()
  private def be64(v: Long): Array[Byte] = ByteBuffer.allocate(8).putLong(v).array()

  /** size32 header (the common case) */
  private def b32(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** 64-bit largesize header carrying the CORRECT size — must parse
    * identically to the size32 form
    */
  private def b64(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(1L) ++ typ.getBytes("US-ASCII") ++ be64(16L + payload.length) ++ payload

  /** size==0: box extends to the end of its container — legal only as the
    * LAST box of whatever contains it
    */
  private def bEnd(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(0L) ++ typ.getBytes("US-ASCII") ++ payload

  /** a LYING largesize header: declares `declared` regardless of payload */
  private def b64Lie(typ: String, payload: Array[Byte], declared: Long): Array[Byte] =
    be32(1L) ++ typ.getBytes("US-ASCII") ++ be64(declared) ++ payload

  private def sized(rnd: scala.util.Random, typ: String, payload: Array[Byte], last: Boolean): Array[Byte] =
    rnd.nextInt(if (last) 5 else 4) match {
      case 0 | 1 => b32(typ, payload)
      case 2 | 3 => b64(typ, payload)
      case _     => bEnd(typ, payload) // only offered when last
    }

  private def ftyp: Array[Byte] =
    b32("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200L) ++ "mp41".getBytes("US-ASCII"))

  private def mvhd(timescale: Long, duration: Long, v1: Boolean): Array[Byte] = {
    val bb = ByteBuffer.allocate(if (v1) 112 else 100)
    bb.put((if (v1) 1 else 0).toByte).put(new Array[Byte](3))
    if (v1) bb.putLong(0L).putLong(0L).putInt(timescale.toInt).putLong(duration)
    else bb.putInt(0).putInt(0).putInt(timescale.toInt).putInt(duration.toInt)
    // rate/volume/matrix/etc — the walker never reads past the duration,
    // but a real file carries them; fill with zeros
    b32("mvhd", bb.array())
  }

  private def tkhd(duration: Long, w: Int, h: Int, v1: Boolean): Array[Byte] = {
    val bb = ByteBuffer.allocate(if (v1) 96 else 84)
    bb.put((if (v1) 1 else 0).toByte).put(Array[Byte](0, 0, 7))
    if (v1) bb.putLong(0L).putLong(0L).putInt(1).putInt(0).putLong(duration)
    else bb.putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration.toInt)
    bb.position(bb.capacity - 8)
    bb.putInt(w << 16).putInt(h << 16)
    b32("tkhd", bb.array())
  }

  private def hdlr(handler: String): Array[Byte] =
    b32("hdlr", be32(0L) ++ be32(0L) ++ handler.getBytes("US-ASCII") ++ new Array[Byte](12))

  private def stsz(n: Long): Array[Byte] = b32("stsz", be32(0L) ++ be32(0L) ++ be32(n))

  private def trak(rnd: scala.util.Random, handler: String, dur: Long, w: Int, h: Int, n: Long): Array[Byte] = {
    val v1 = rnd.nextBoolean()
    // hdlr before or after minf — the walker is order-independent inside mdia
    val mdiaKids =
      if (rnd.nextBoolean()) hdlr(handler) ++ b32("minf", b32("stbl", stsz(n)))
      else b32("minf", b32("stbl", stsz(n))) ++ hdlr(handler)
    b32("trak", tkhd(dur, w, h, v1) ++ sized(rnd, "mdia", mdiaKids, last = true))
  }

  /** an unknown container whose interior is hostile garbage the walker must
    * skip by declared size WITHOUT descending (it would reject if it did)
    */
  private def opaqueJunk(rnd: scala.util.Random): Array[Byte] = {
    val junk = new Array[Byte](rnd.nextInt(64))
    rnd.nextBytes(junk)
    val typ = Seq("udta", "skip", "wide", "uuid", "meta")(rnd.nextInt(5))
    rnd.nextInt(3) match {
      case 0 => b32(typ, junk)
      case 1 => b64(typ, junk)
      case _ => b32(typ, Array.emptyByteArray) // zero-length leaf
    }
  }

  /** a structurally VALID tree with randomized encodings; returns the bytes
    * and the exact metadata the parser must report
    */
  private def genValid(seed: Int): (Array[Byte], Mp4Codec.Mp4Meta) = {
    val rnd = new scala.util.Random(0x6E6E + seed * 48271)
    val w = 1 + rnd.nextInt(8192)
    val h = 1 + rnd.nextInt(8192)
    val timescale = 1L + rnd.nextInt(1000000)
    val duration = rnd.nextLong(Long.MaxValue / 1000) // inside the overflow gate
    val n = rnd.nextInt(Int.MaxValue).toLong
    val v1 = duration > 0xFFFFFFFEL || rnd.nextBoolean() // v0 can't carry 64-bit durations

    // decoys BEFORE the real vide trak: an audio trak, a trak with no hdlr
    // at all, each with junk dims that must NOT win
    val decoys = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    if (rnd.nextBoolean()) decoys += trak(rnd, "soun", duration, 1 + rnd.nextInt(100), 1 + rnd.nextInt(100), 7L)
    if (rnd.nextBoolean()) decoys += b32("trak", tkhd(duration, 999, 999, rnd.nextBoolean()))
    val real = trak(rnd, "vide", duration, w, h, n)
    // a SECOND vide trak after the real one must not override (first wins)
    val shadow = if (rnd.nextBoolean()) trak(rnd, "vide", duration, w + 1, h + 1, n + 1) else Array.emptyByteArray

    var moovKids = Array.empty[Byte]
    if (rnd.nextBoolean()) moovKids ++= opaqueJunk(rnd)
    moovKids ++= mvhd(timescale, duration, v1)
    decoys.foreach(moovKids ++= _)
    if (rnd.nextBoolean()) moovKids ++= opaqueJunk(rnd)
    moovKids ++= real
    moovKids ++= shadow

    val bits = new Array[Byte](rnd.nextInt(128))
    rnd.nextBytes(bits)
    var top = ftyp
    if (rnd.nextBoolean()) top ++= opaqueJunk(rnd)
    // mdat-before-moov is a legal (and common, for streaming muxers) top-level
    // order; only when moov is the LAST top-level box may it use the to-end
    // (size == 0) encoding
    val mdatFirst = rnd.nextBoolean()
    if (mdatFirst) top ++= b32("mdat", bits)
    top ++= sized(rnd, "moov", moovKids, last = mdatFirst)
    if (!mdatFirst) top ++= b32("mdat", bits)
    (top, Mp4Codec.Mp4Meta(w, h, duration * 1000L / timescale, timescale, n))
  }

  /** a structurally-valid-but-HOSTILE tree: must reject loudly (or, for the
    * skip-class cases, parse to exactly the benign expectation) — never an
    * accidental crash. Returns (bytes, expected) where expected=None means
    * any loud outcome is acceptable.
    */
  private def genHostile(seed: Int): (String, Array[Byte], Option[Mp4Codec.Mp4Meta]) = {
    val rnd = new scala.util.Random(0xBAD5EED + seed * 69621)
    val w = 1 + rnd.nextInt(640)
    val h = 1 + rnd.nextInt(480)
    val dur = 1L + rnd.nextInt(1000000)
    val benign = mvhd(1000L, dur, v1 = false) ++ trak(rnd, "vide", dur, w, h, 5L)
    val meta = Mp4Codec.Mp4Meta(w, h, dur, 1000L, 5L)

    rnd.nextInt(10) match {
      case 0 =>
        // largesize near Long.MaxValue on a top-level box: p + boxSize wraps
        val near = Long.MaxValue - rnd.nextInt(32)
        ("largesize-near-max", ftyp ++ b64Lie("moov", benign, near), None)
      case 1 =>
        // largesize SMALLER than its own 16-byte header (negative body)
        ("largesize-under-header", ftyp ++ b64Lie("moov", benign, rnd.nextInt(16).toLong), None)
      case 2 =>
        // largesize near max on a NESTED box — the inner walk must gate it
        val inner = b64Lie("mdia", hdlr("vide"), Long.MaxValue - rnd.nextInt(8))
        ("nested-largesize-near-max", ftyp ++ b32("moov", benign ++ b32("trak", inner)), None)
      case 3 =>
        // all-ones duration sentinel, both versions
        val v1 = rnd.nextBoolean()
        val sentinel = if (v1) -1L else 0xFFFFFFFFL
        ("unknown-duration-sentinel", ftyp ++ b32("moov", mvhd(4296L + rnd.nextInt(1000), sentinel, v1) ++ trak(rnd, "vide", 1L, w, h, 1L)), None)
      case 4 =>
        // v1 duration past the ms-conversion overflow gate
        val big = Long.MaxValue / 1000 + 1 + rnd.nextLong(1L << 40)
        ("ms-overflow-duration", ftyp ++ b32("moov", mvhd(1000L, big, v1 = true) ++ trak(rnd, "vide", 1L, w, h, 1L)), None)
      case 5 =>
        // short known leaf at every parsed type: declared size valid, payload
        // shorter than the fields the parser reads
        val typ = Seq("mvhd", "tkhd", "hdlr", "stsz")(rnd.nextInt(4))
        val isV1 = rnd.nextBoolean()
        // v0 minimum, or — with the v1 marker set — anything short of the v1
        // minimum, which exercises the wider v1-specific length gate on
        // payloads that PASS the v0 gate (e.g. a 20..31-byte v1 mvhd)
        val hi = (typ, isV1) match {
          case ("mvhd", true) => 32
          case ("tkhd", true) => 96
          case (t, _)         => Map("mvhd" -> 20, "tkhd" -> 84, "hdlr" -> 12, "stsz" -> 12)(t)
        }
        val short = new Array[Byte](rnd.nextInt(hi))
        if (short.nonEmpty && isV1) short(0) = 1
        val wrap = if (typ == "hdlr" || typ == "stsz") (p: Array[Byte]) => b32("trak", b32("mdia", b32("minf", b32("stbl", p)))) else (p: Array[Byte]) => p
        (s"short-leaf-$typ", ftyp ++ b32("moov", wrap(b32(typ, short))), None)
      case 6 =>
        // nesting bomb: > 32 container levels
        var bomb = hdlr("vide")
        for (_ <- 0 until 34 + rnd.nextInt(16)) bomb = b32(Seq("moov", "mdia", "minf", "stbl")(rnd.nextInt(4)), bomb)
        ("nesting-bomb", ftyp ++ bomb, None)
      case 7 =>
        // box size 3..7: smaller than its OWN 8-byte header
        ("size-under-8", ftyp ++ (be32(3L + rnd.nextInt(5)) ++ "moov".getBytes("US-ASCII")) ++ b32("moov", benign), None)
      case 8 =>
        // size==0 on a NON-last top-level box: swallows the real moov — the
        // walker reads it as to-end, so the required mvhd is never seen at
        // top level → must reject for a MISSING field, not crash
        ("to-end-shadowing", ftyp ++ bEnd("free", new Array[Byte](rnd.nextInt(32))) ++ b32("moov", benign), None)
      case _ =>
        // SKIP-class: a hostile interior inside an UNKNOWN container — the
        // walker must skip by declared size without descending, so the file
        // parses to exactly the benign metadata
        val evil = b64Lie("junk", Array.emptyByteArray, Long.MaxValue - 3)
        ("hostile-interior-skipped", ftyp ++ b32("udta", evil) ++ b32("moov", benign), Some(meta))
    }
  }

  // ---- properties -----------------------------------------------------------

  test(s"generated VALID trees parse to their declared metadata over $N_GEN seeds") {
    for (seed <- 0 until N_GEN) {
      val (bytes, want) = genValid(seed)
      val got = Mp4Codec.parseMeta(bytes)
      assert(got == want, s"seed $seed: $got != $want")
    }
  }

  test(s"generated HOSTILE trees reject loudly (or skip to the benign answer) over $N_GEN seeds") {
    val seen = scala.collection.mutable.Set[String]()
    for (seed <- 0 until N_GEN) {
      val (kind, bytes, expected) = genHostile(seed)
      seen += kind
      val got = loudOnly(s"seed $seed [$kind]")(Mp4Codec.parseMeta(bytes))
      expected match {
        case Some(want) =>
          assert(got.contains(want), s"seed $seed [$kind]: $got != Some($want)")
        case None =>
          got.foreach(m => fail(s"seed $seed [$kind]: hostile tree PARSED as $m instead of rejecting"))
      }
      // the payload scan shares the size arithmetic — same no-crash bar
      loudOnly(s"seed $seed [$kind] mdat")(Mp4Codec.mdatPayload(bytes))
    }
    // vacuity guard: every hostile construction must actually occur, including
    // all four short-leaf types — a narrowed generator would pass emptily
    val allKinds = Set(
      "largesize-near-max", "largesize-under-header", "nested-largesize-near-max",
      "unknown-duration-sentinel", "ms-overflow-duration", "nesting-bomb",
      "size-under-8", "to-end-shadowing", "hostile-interior-skipped",
      "short-leaf-mvhd", "short-leaf-tkhd", "short-leaf-hdlr", "short-leaf-stsz"
    )
    assert(allKinds.subsetOf(seen.toSet), s"hostile kinds never generated: ${allKinds -- seen}")
  }

  test(s"truncation at EVERY byte of $N_SWEEP generated files: same answer or loud reject") {
    for (seed <- 0 until N_SWEEP) {
      val (bytes, want) = genValid(seed * 37)
      for (cut <- 1 until bytes.length) {
        loudOnly(s"seed ${seed * 37} truncated at $cut/${bytes.length}")(
          Mp4Codec.parseMeta(java.util.Arrays.copyOf(bytes, cut))
        ).foreach { m =>
          // to-end / size-0 encodings legitimately rescale with the file end;
          // what is NEVER acceptable is a DIFFERENT successful answer
          assert(m == want, s"seed ${seed * 37}: truncation at $cut parsed to a DIFFERENT answer $m (want $want)")
        }
      }
    }
  }
}
