package graft.kernel

import scala.util.Random

/** Shared seeded adversarial-fixture generator for the randomized
  * differential suites ([[KernelRandomDifferentialSpec]],
  * `graft.spark.SparkRandomDetectSpec`): random-walk values with spikes,
  * ~15% gaps, same-bucket duplicate rows, exact-duplicate timestamps,
  * optional error series, optional `.settings` rollup overrides plus
  * reference-inert settings keys (`forecast_periods`, unknown keys — stored
  * but never applied by `AbstractDataLoader.setConfig`), and magnitudes
  * spanning 1× to 1e6× so the auto-log-normalize path triggers on some
  * seeds.
  *
  * Raw values are DYADIC (0.25 steps): the reference's initial bucket sum
  * runs in JDK-HashMap iteration order of the raw ts strings while the
  * kernel sums in ascending-ts order — a documented divergence
  * ([[SeriesKernel.bucketSum]]) that is unobservable when per-bucket sums
  * are exact in any order, which dyadic values of bounded magnitude
  * guarantee. Every DOWNSTREAM sum (rollup ladder, gap fill) runs in
  * sorted order on both sides, so post-normalization non-integral values
  * still compare bit-for-bit.
  */
object RandomFixtures {

  private val dir = OracleHarness.tempDir("rand_fixtures")

  // deterministic per index; memoized so every consuming test is
  // self-sufficient. Sequential java.util.Random seeds correlate on their
  // first draws (all-same step across 10 fixtures); the golden-ratio
  // multiply decorrelates them
  private val memo = scala.collection.mutable.Map.empty[Int, String]
  def path(i: Int): String = memo.synchronized {
    memo.getOrElseUpdate(i, writeFixture(new Random((9000L + i) * 0x9E3779B97F4A7C15L), i))
  }

  // sibling copies with a generated .errors sidecar — SEPARATE files so the
  // validated-outlier differential on [[path]] never enters the reference's
  // expected-error loop, which NPE-unboxes (`AbstractDataLoader.java:317-319`)
  // when an expected ts has zero outlier records
  // (path, picks written, aiming outlierTs, aiming resolution)
  private val memoErrors = scala.collection.mutable.Map.empty[Int, (String, Seq[Long], Seq[Long], Long)]

  /** The fixture [[path]](i) plus a generated `.errors` sidecar, under a
    * sibling name; returns the path AND the raw picks written (so callers
    * never re-parse the sidecar format). Picks are seed-driven from two
    * pools so BOTH reference branches occur across the sweep: `outlierTs`
    * (final-resolution bucket ts the kernel flagged as outliers — offsets
    * < `resolution` collapse back onto them in the reference's
    * rebucket+dedupe, `AbstractDataLoader.java:400-409`) and raw data-line
    * ts that usually carry no outlier record, which make the reference's
    * `validate()` NPE-unbox. Using kernel outputs to AIM the sidecar is
    * sound: the differential then checks the reference AGREES the aimed ts
    * are found. Memoized per index; a repeat call must pass the SAME aiming
    * arguments (the sidecar on disk was generated for the first caller's).
    */
  def errorsPath(i: Int, outlierTs: Seq[Long], resolution: Long): (String, Seq[Long]) =
    memoErrors.synchronized {
      val (p, picks, memoOutliers, memoRes) = memoErrors.getOrElseUpdate(
        i, {
          import java.nio.file.{Files, Paths, StandardCopyOption}
          val base = Paths.get(path(i))
          val rnd = new Random((7000L + i) * 0x9E3779B97F4A7C15L)
          val f = dir.resolve(s"ke_$i.tsv")
          Files.copy(base, f, StandardCopyOption.REPLACE_EXISTING)
          val settings = Paths.get(path(i) + ".settings") // derived, not re-spelled
          if (Files.exists(settings))
            Files.copy(settings, Paths.get(f.toString + ".settings"), StandardCopyOption.REPLACE_EXISTING)
          import scala.jdk.CollectionConverters._
          val dataTs = Files.readAllLines(base).asScala.drop(1).map(_.split("\t")(0).trim.toLong).toIndexedSeq
          val picks = pickExpectedErrors(rnd, outlierTs, resolution, dataTs, npeProb = 0.6)
          Files.write(
            Paths.get(f.toString + ".errors"),
            s"""{"errors":[${picks.mkString(",")}]}""".getBytes("UTF-8")
          )
          (f.toString, picks, outlierTs, resolution)
        }
      )
      require(
        memoOutliers == outlierTs && memoRes == resolution,
        s"errorsPath($i) re-invoked with different aiming arguments than the memoized sidecar was generated for"
      )
      (p, picks)
    }

  /** seed-driven expected-error picks from the two pools (shared with
    * `graft.api.MutableRandomDifferentialSpec`, which uses a different
    * `npeProb`): offsets onto kernel-flagged buckets (collapse back in the
    * reference's rebucket+dedupe, `AbstractDataLoader.java:400-409`), and —
    * on ~`npeProb` of seeds, or as a fallback so picks are never empty —
    * raw data-line ts that usually carry no outlier record (the reference's
    * NPE-unbox pool), plus an out-of-range tail.
    */
  def pickExpectedErrors(
      rnd: Random,
      outlierTs: Seq[Long],
      resolution: Long,
      dataTs: IndexedSeq[Long],
      npeProb: Double
  ): Seq[Long] = {
    val flagged = outlierTs.distinct.sorted.toIndexedSeq
    val picks = scala.collection.mutable.ArrayBuffer.empty[Long]
    if (flagged.nonEmpty)
      for (_ <- 0 to rnd.nextInt(3))
        picks += flagged(rnd.nextInt(flagged.size)) + rnd.nextInt(resolution.toInt)
    if (rnd.nextDouble() < npeProb || picks.isEmpty) {
      for (_ <- 0 to rnd.nextInt(2))
        picks += dataTs(rnd.nextInt(dataTs.size)) + rnd.nextInt(30)
      if (rnd.nextBoolean()) picks += dataTs.max + 86400L
    }
    picks.toSeq
  }

  private def writeFixture(rnd: Random, i: Int): String = {
    val step = if (rnd.nextBoolean()) 60L else 300L
    // wide enough that some seeds keep >1440 buckets after ~15% gaps and so
    // enter the reference's auto-rollup ladder (`AbstractDataLoader.java:263`)
    val n = 60 + rnd.nextInt(2600)
    val base = 1400000000L + rnd.nextInt(100000)
    val hasError = rnd.nextDouble() < 0.5
    // scale 1e6 pushes the series mean over the reference's
    // auto-log-normalize threshold on some seeds; scale 1 with negatives
    // exercises the ln-of-negative quirk path
    val scale = rnd.nextInt(3) match { case 0 => 1.0; case 1 => 100.0; case _ => 1e6 }
    val allowNegative = scale == 1.0 && rnd.nextDouble() < 0.5
    var v = (200 + rnd.nextInt(201)) * 0.25 // dyadic start in [50, 100]

    val lines = scala.collection.mutable.ArrayBuffer[String]()
    lines += (if (hasError) "ts\tregular\terror" else "ts\tregular")
    for (k <- 0 until n) {
      if (rnd.nextDouble() >= 0.15) { // ~15% gaps
        val ts = base + k * step
        def emit(t: Long): Unit = {
          v = v + (rnd.nextInt(41) - 20) * 0.25 // dyadic walk, ±5 per step
          if (!allowNegative && v < 0.25) v = 0.25
          val value = (if (rnd.nextDouble() < 0.02) v * 8 else v) * scale
          val err = rnd.nextInt(5)
          lines += (if (hasError) s"$t\t$value\t$err" else s"$t\t$value")
        }
        emit(ts)
        // a second raw row inside the same bucket: processData SUMS it
        if (rnd.nextDouble() < 0.2) emit(ts + step / 2)
        // an exact-duplicate ts string: raw map last-wins, never summed
        if (rnd.nextDouble() < 0.05) emit(ts)
      }
    }
    val f = dir.resolve(s"kr_$i.tsv")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    val settingsEntries = scala.collection.mutable.ArrayBuffer.empty[String]
    if (rnd.nextDouble() < 0.4)
      settingsEntries += s""""rollup":${step * (1 + rnd.nextInt(5))}""" // draw order unchanged
    // keys the reference's settings path STORES BUT NEVER APPLIES (setConfig
    // honors only rollup, `AbstractDataLoader.java:57-62`): forecast_periods
    // would shift the train/classify split if wrongly honored (≠ default 10),
    // and its non-numeric spelling pins that inert means UNPARSED (the
    // reference never throws on it). Drawn AFTER every pre-existing rnd use,
    // so memoized fixture data and rollup values are byte-identical.
    if (rnd.nextDouble() < 0.5)
      // spelling alternates by INDEX (not a draw) so both always appear
      settingsEntries += s""""forecast_periods":${if (i % 2 == 0) "3" else "\"x1.5\""}"""
    if (rnd.nextDouble() < 0.3) settingsEntries += s""""zz_unknown":${rnd.nextInt(9)}"""
    if (settingsEntries.nonEmpty)
      java.nio.file.Files.write(
        dir.resolve(s"kr_$i.tsv.settings"),
        ("{" + settingsEntries.mkString(",") + "}").getBytes("UTF-8")
      )
    f.toString
  }
}
