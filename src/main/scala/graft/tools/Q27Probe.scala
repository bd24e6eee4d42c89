package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.ForecastPipeline
import graft.queries.FlagshipCatalog

/** Stage anatomy for q27_forecast_daily (r10: 3.6× vs DuckDB at sf1
  * and GROWING with scale — find the stage that scales badly).
  * Warm min-of-2 per stage against a replica dir.
  */
object Q27Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/events.parquet").count()

    def time(name: String)(mk: => DataFrame): Unit = {
      def once: Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      once // warm
      println(f"Q27PROBE $name ${math.min(once, once)}%.2f s")
    }

    val lo = 1704412800L; val hi = 1709251200L
    def synth = FlagshipCatalog.synthForecasts(spark, sfDir)

    time("synth_scan")(synth)
    time("dedup_latest")(ForecastPipeline.dedupLatest(synth))
    time("dedup_plus_daily") {
      ForecastPipeline.dailyForecasts(ForecastPipeline.dedupLatest(synth))
    }
    time("dedup_plus_precip") {
      ForecastPipeline.dailyPrecipUnpivoted(
        ForecastPipeline.precipRows(ForecastPipeline.dedupLatest(synth)))
    }
    time("full_run")(ForecastPipeline.run(synth, lo, hi))
    time("full_run_sorted")(ForecastPipeline.run(synth, lo, hi)
      .orderBy(col("station_id"), col("day")))

    // variant: no persist at all — dedup recomputed by both branches
    def runNoPersist: DataFrame = {
      val deduped = ForecastPipeline.dedupLatest(synth)
      val pr = ForecastPipeline.precipRows(deduped)
      ForecastPipeline.dailyForecasts(deduped)
        .join(ForecastPipeline.dailyPrecipUnpivoted(pr), Seq("station_id", "day"), "left")
    }
    time("full_no_persist")(runNoPersist)
    // variant: localCheckpoint instead of persist
    def runLocalCk: DataFrame = {
      val deduped = ForecastPipeline.dedupLatest(synth).localCheckpoint(true)
      val pr = ForecastPipeline.precipRows(deduped)
      ForecastPipeline.dailyForecasts(deduped)
        .join(ForecastPipeline.dailyPrecipUnpivoted(pr), Seq("station_id", "day"), "left")
    }
    time("full_local_ck")(runLocalCk)
    spark.stop()
  }
}
