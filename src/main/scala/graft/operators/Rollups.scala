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

  /** As-of join (the operator Spark's API lacks natively): for each
    * left row, the latest right value with rTime <= lTime within the
    * same key. The reference does exactly this when it scores against
    * the last forecast generated at-or-before a cutoff
    * (oracle.rs:484-770; weather_data.rs deduped_forecasts).
    *
    * Implementation is the scalable union trick, per the brief's
    * preference for composing existing operators: tag right rows,
    * union both sides, and take last_value(value, ignoreNulls) over a
    * (key)-partitioned window ordered by (time, right-first, tiebreak)
    * — ONE shuffle on the key, no per-key loops, no range cross-join.
    * Right rows at the same timestamp as a left row are visible to it
    * (inclusive as-of).
    *
    * left must carry (key, lTime, tieBreak); right (key, rTime, value).
    * Returns left's columns + `asof_value` (null when no prior right).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      lTime: String, rTime: String, value: String, rTieBreak: String): DataFrame = {
    // the union fabricates these; a same-named input column would be
    // silently overwritten (corrupt results) instead of erroring
    val reserved = Set("__t", "__isr", "__v", "__tb", "asof_value")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asOfJoin inputs must not contain reserved columns: ${clash.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__t", col(lTime))
      .withColumn("__isr", lit(0))
      .withColumn("__v", lit(null).cast(right.schema(value).dataType))
      .withColumn("__tb", lit(0L))
    val r0 = right.select(col(key), col(rTime).as("__t"), col(value).as("__v"),
        col(rTieBreak).cast("long").as("__tb"))
      .withColumn("__isr", lit(1))
    val r = leftCols.filterNot(c => c == key).foldLeft(r0)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val aux = Seq(col("__t"), col("__isr"), col("__v"), col("__tb"))
    val u = l.select((leftCols.map(col) ++ aux): _*)
      .unionByName(r.select((leftCols.map(col) ++ aux): _*))
    // total order: time asc, right rows before left at equal time
    // (inclusive as-of), rTieBreak among equal-time right rows — the
    // last non-null __v a left row sees is therefore deterministic.
    // Left rows preceding a left row contribute only nulls (ignored),
    // so left-left order is immaterial.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col("__t").asc, col("__isr").desc, col("__tb").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    u.withColumn("asof_value", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0)
      .select((leftCols.map(col) :+ col("asof_value")): _*)
  }

  /** Bounded-range join (the other operator the brief calls out as
    * missing from Spark's API): match each point to every range
    * [start, end] (inclusive) with the same key, where range width is
    * bounded by `maxRangeMs`. Naive formulation is a non-equi join
    * (BroadcastNestedLoop/cartesian — quadratic); this one explodes
    * each range into the coarse time buckets it overlaps (at most
    * width/bucket + 1) and equi-joins points on (key, bucket), then
    * filters exactly. A point's single bucket meets an overlapping
    * range exactly once, so no dedup is needed. One equi-shuffle, join
    * output bounded by true matches + bucket-edge near-misses.
    * (Reference anchor: forecast windows [begin_time, end_time] joined
    * against the observations inside them, weather_data.rs:240-344.)
    */
  def boundedRangeJoin(ranges: DataFrame, points: DataFrame, key: String,
      start: String, end: String, pTime: String, maxRangeMs: Long): DataFrame = {
    val bucket = maxRangeMs
    val rb = ranges.withColumn("__b",
      explode(sequence(floor(col(start) / bucket).cast("long"),
        floor(col(end) / bucket).cast("long"))))
    val pb = points.withColumn("__b", floor(col(pTime) / bucket).cast("long"))
    rb.join(pb, Seq(key, "__b"))
      .filter(col(pTime) >= col(start) && col(pTime) <= col(end))
      .drop("__b")
  }
}
