package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ForecastPipeline
import graft.queries.FlagshipCatalog

/** The two daily-precip formulations must agree exactly: the
  * reference-shaped per-field trio (three chosenDuration/dailyField
  * pipelines chained through FULL OUTER joins — the weather_data.rs
  * structure verbatim) and the shipped single-exchange unpivoted
  * variant (r10: one (station, day, field) window serving chain
  * detection, the min-duration fallback AND the chosen join). This
  * differential is the regression gate for the r10 restructure — a
  * chain-semantics slip in the fused window (block edges, tie order,
  * fallback grain) diverges the two long before the oracle would
  * catch it on friendlier data — and it is why the per-field trio
  * stays in the codebase: it's the executable spec of the reference
  * shape, not dead code.
  */
class ForecastPipelineSpec extends AnyFunSuite {

  test("per-field FULL OUTER trio == single-exchange unpivoted variant, exactly") {
    val spark = TestSpark.spark
    val synth = FlagshipCatalog.synthForecasts(spark, TestSpark.sfDir)
    val pr = ForecastPipeline.precipRows(ForecastPipeline.dedupLatest(synth))
      .localCheckpoint(true)

    val cols = Seq("station_id", "day", "total_qpf", "snow_out", "avg_snow_ratio", "ice_out")
    val trio = ForecastPipeline.dailyPrecip(pr)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val fused = ForecastPipeline.dailyPrecipUnpivoted(pr)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet

    assert(trio.nonEmpty, "empty precip table — test input lost its teeth")
    val onlyTrio = trio -- fused
    val onlyFused = fused -- trio
    assert(onlyTrio.isEmpty && onlyFused.isEmpty,
      s"formulations diverge: trio-only=${onlyTrio.take(3)} fused-only=${onlyFused.take(3)}")
  }
}
