package graft.jobs

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic transcript synthesis (BASELINE.json input_hint: no external
  * data; synthesize at small scale for tests and benches).
  *
  * Two generators:
  *  - fromSeries: reference-fixture rows → turns (FIXTURES.md §4 mapping):
  *    per (ts, regular=r, error=e) emit r assistant turns and e tool-ERROR
  *    turns at that ts, turn_idx consecutive in row order, text a pure
  *    function of (conv_id, turn_idx) — the per-turn text-equality invariant.
  *  - synthetic: seed-free closed-form skewed corpus for benches — conv c's
  *    size is a deterministic power-law of c (hot conversations exercise
  *    salting/AQE), every column a pure function of (conv, turn_idx), built
  *    distributedly via range + sequence + explode (no driver-side loops).
  */
object FixtureGen {

  def turnText(convId: String, turnIdx: Int): String = s"$convId#$turnIdx"

  /** fixture rows (ts → metric → value) → transcript turns (local; test-scale) */
  def fromSeries(spark: SparkSession, convId: String, rows: Seq[(Long, Map[String, Double])]): DataFrame = {
    import spark.implicits._
    var idx = 0
    val turns = rows.flatMap { case (ts, metrics) =>
      val r = metrics.getOrElse("regular", 0.0).toInt
      val e = metrics.getOrElse("error", 0.0).toInt
      val regulars = (0 until r).map { _ =>
        val t = Turn(convId, idx, "assistant", turnText(convId, idx), null, new java.sql.Timestamp(ts * 1000L))
        idx += 1
        t
      }
      val errors = (0 until e).map { _ =>
        val t = Turn(convId, idx, "tool", s"ERROR ${turnText(convId, idx)}", "search", new java.sql.Timestamp(ts * 1000L))
        idx += 1
        t
      }
      // an observed-but-idle bucket (regular=0, error=0) still exists in the
      // reference series; mark it with a zero-weight system turn so Derive
      // emits the bucket with regular=0 instead of a gap
      val placeholder = if (r == 0 && e == 0) {
        val t = Turn(convId, idx, "system", turnText(convId, idx), null, new java.sql.Timestamp(ts * 1000L))
        idx += 1
        Seq(t)
      } else Seq.empty
      regulars ++ errors ++ placeholder
    }
    turns.toDF()
  }

  /** Distributed synthetic corpus: nConvs conversations, conv c sized
    * ~ maxTurns / (1 + c)^alpha (power-law skew, conv_0 hottest), one turn
    * per `stepSeconds`. Deterministic: every column is a closed form of
    * (c, turn_idx) — no RNG, safe to regenerate identically at any
    * parallelism.
    */
  def synthetic(
      spark: SparkSession,
      nConvs: Long,
      maxTurns: Long,
      alpha: Double = 0.7,
      stepSeconds: Long = 60L,
      baseEpoch: Long = 1700000000L,
      partitions: Int = 64
  ): DataFrame = {
    spark
      .range(0, nConvs, 1, partitions)
      .select(
        concat(lit("conv_"), col("id")).as("conv_id"),
        col("id").as("_c"),
        greatest(
          (lit(maxTurns.toDouble) / pow(col("id").cast("double") + 1.0, alpha)).cast("long"),
          lit(3L)
        ).as("_size")
      )
      .select(col("conv_id"), col("_c"), explode(sequence(lit(0L), col("_size") - 1)).as("_i"))
      // re-spread the hot conversations' exploded rows across the cluster
      .repartition(partitions, col("conv_id"), pmod(col("_i"), lit(997)))
      .select(
        col("conv_id"),
        col("_i").cast("int").as("turn_idx"),
        when(pmod(col("_i"), lit(7)) === 0, "tool")
          .when(pmod(col("_i"), lit(2)) === 0, "assistant")
          .otherwise("user")
          .as("role"),
        when(
          pmod(col("_i"), lit(7)) === 0 && pmod(col("_i"), lit(21)) === 0,
          concat(lit("ERROR "), col("conv_id"), lit("#"), col("_i"))
        ).otherwise(concat(col("conv_id"), lit("#"), col("_i"), lit(" "), repeat(lit("lorem "), 8)))
          .as("text"),
        when(pmod(col("_i"), lit(7)) === 0, lit("search")).otherwise(lit(null).cast("string")).as("tool"),
        timestamp_seconds(lit(baseEpoch) + pmod(col("_c"), lit(86400L)) + col("_i") * stepSeconds).as("ts")
      )
  }
}
