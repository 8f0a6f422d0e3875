package graft.kernel

/** All analyzers in the reference suite order (`TestRunner.java:36-47`).
  * Scoring is order-insensitive (canonical contribution ordering in
  * `ScopePipeline.score`), so this order is documentation, not semantics.
  */
object AnalyzerRegistry {
  val all: Seq[KAnalyzer] = Seq(
    NoopAnalyzer,
    NormalDistributionAnalyzer,
    LogNormalDistributionAnalyzer,
    SimpleRegressionAnalyzer,
    MovingAverageAnalyzer,
    PolynomialRegressionAnalyzer,
    IntervalInterceptorAnalyzer,
    RandomWalkRegressionAnalyzer,
    OneClassSvmAnalyzer,
    TimeBucketSimpleRegressionAnalyzer,
    MultipleLinearRegressionAnalyzer,
    SimpleExponentialSmoothingAnalyzer
  )

  /** all but the SVM — the subset with a runnable offline oracle */
  val oracleSubset: Seq[KAnalyzer] = all.filterNot(_ == OneClassSvmAnalyzer)

  def byName(name: String): KAnalyzer = all.find(_.name == name).get
}
