package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rollup / windowing operators modeled on the reference oracle's
  * canned DuckDB queries (crates/oracle/src/db/weather_data.rs).
  *
  * All operators are single-shuffle where possible: window functions
  * partition on the same keys the downstream groupBy uses, so
  * Catalyst reuses one exchange. No driver-side collection anywhere.
  */
object Rollups {

  /** `DISTINCT ON (keys) ... ORDER BY ord DESC` — keep the newest row
    * per key group (deduped_forecasts, weather_data.rs:213-235).
    * One shuffle on `keys`; at lake scale, pre-bucketing on `keys`
    * makes this exchange-free.
    */
  def latestPerKey(df: DataFrame, keys: Seq[Column], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ord.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Single-pass variant of latestPerKey via max_by: one aggregation
    * (partial + final, no window sort) — preferred at scale when only
    * the newest row's values are needed, since map-side combine
    * reduces shuffle volume to one row per key per mapper. `ord` must
    * be totally ordered (add a tiebreak column).
    */
  def latestPerKeyAgg(df: DataFrame, keys: Seq[Column], ord: Column, values: Seq[String]): DataFrame = {
    val aggs = values.map(v => max_by(col(v), ord).as(v))
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Gap-based sessionization (gaps-and-islands): rows sorted by
    * `tsMs` within each key start a new session when the gap from the
    * previous row exceeds `gapMs`. Returns input plus `session_idx`
    * (0-based per key). Streaming analog lives in graft.streaming.
    */
  def sessionize(df: DataFrame, key: Column, tsMs: Column, tieBreak: Column, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsMs.asc, tieBreak.asc)
    val prev = lag(tsMs, 1).over(w)
    val isNew = when(prev.isNull || (tsMs - prev) > gapMs, 1).otherwise(0)
    df.withColumn("__new", isNew)
      .withColumn("session_idx", sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__new")
  }

  /** LEAD-based chain detection (qpf_duration, weather_data.rs:256-266):
    * per (key, bucket), count rows and rows whose successor starts
    * within `chainMs`. Returns key, bucket, row_count, chain_count.
    */
  def leadChain(df: DataFrame, key: Column, bucket: Column, tsMs: Column, chainMs: Long): DataFrame = {
    val w = Window.partitionBy(col("key"), col("bucket")).orderBy(col("ts_ms").asc)
    df.select(key.as("key"), bucket.as("bucket"), tsMs.as("ts_ms"))
      .withColumn("__next", lead(col("ts_ms"), 1).over(w))
      .groupBy(col("key"), col("bucket"))
      .agg(
        count(lit(1)).as("row_count"),
        sum(when(col("__next").isNotNull && (col("__next") - col("ts_ms")) <= chainMs, 1).otherwise(0)).as("chain_count"))
  }

  /** `DISTINCT ON (key) ... ORDER BY ratio DESC, tiebreak ASC` over a
    * computed ranking (best_qpf_duration, weather_data.rs:267-271):
    * keep the best `bucket` per key by chain_count/row_count ratio.
    */
  def bestByRatio(chains: DataFrame): DataFrame = {
    val ratio = col("chain_count").cast("double") / col("row_count")
    val w = Window.partitionBy(col("key")).orderBy(ratio.desc, col("bucket").asc)
    chains.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
