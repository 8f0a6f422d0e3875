package graft.kernel

import graft.model.{EngineConfig, Flag}
import nl.us2.timeseriesoutlierdetection._
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests: kernel pipeline + analyzers vs the actual reference
  * classes (prebuilt jar, test classpath) over the whole fixture corpus.
  * Exact double equality — the kernel replicates FP operation order.
  */
class KernelVsReferenceSpec extends AnyFunSuite {

  private def kernelProcess(fixture: String): ScopePipeline.Processed = {
    val raw = OracleHarness.parseTsv(fixture)
    val settings = OracleHarness.settings(fixture)
    val cfg = EngineConfig(resolution = settings.get("rollup").map(_.toLong).getOrElse(60L))
    ScopePipeline.process(raw.view.mapValues(_.toIterable).toMap, cfg)
  }

  private val analyzerPairs = OracleHarness.analyzerPairs
  private def canon(fs: Seq[Flag]) = OracleHarness.canonFlags(fs)

  for (fixture <- OracleHarness.fixtureNames) {
    test(s"processed series parity: $fixture") {
      val oracle = OracleHarness.load(fixture)
      val mine = kernelProcess(fixture)
      assert(mine.resolution == oracle.resolution, "final resolution")
      assert(mine.series.keySet == oracle.series.keySet, "series names")
      for ((name, ks) <- mine.series) {
        val ref = oracle.series(name)
        val refData = {
          import scala.jdk.CollectionConverters._
          ref.getData.entrySet().iterator().asScala
            .map(e => Pt(e.getKey.longValue(), e.getValue.doubleValue())).toSeq
        }
        assert(ks.data.toSeq == refData, s"series $name points")
        // train stats parity (post-sanitize)
        assert(ks.stats.avg == ref.getTrainAvg, s"series $name trainAvg")
        assert(ks.stats.stdDev == ref.getTrainStdDev, s"series $name trainStdDev")
        assert(ks.stats.minVal == ref.getTrainMinVal, s"series $name trainMin")
        assert(ks.stats.maxVal == ref.getTrainMaxVal, s"series $name trainMax")
      }
    }

    for ((mineA, refA) <- analyzerPairs) {
      test(s"analyzer parity: ${mineA.name} on $fixture") {
        val oracle = OracleHarness.load(fixture)
        val mine = kernelProcess(fixture)
        val myFlags = mineA.analyze(fixture, mine.series.values)
        val refFlags = OracleHarness.analyze(oracle, refA(), mineA.name, fixture)
        assert(canon(myFlags) == canon(refFlags))
      }
    }
  }
}
