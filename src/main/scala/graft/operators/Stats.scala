package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based statistics — at 100 TB, exact DISTINCT/quantiles on
  * high-cardinality columns are shuffle-bound; sketches trade bounded
  * error for one-pass mergeable state (the event_stats / oracle_info
  * dashboard fragments of the reference are the consumer shape).
  */
object Stats {

  /** HyperLogLog++ distinct count per group (mergeable, one pass). */
  def approxDistinct(df: DataFrame, groupCols: Seq[Column], target: Column, rsd: Double = 0.02): DataFrame =
    df.groupBy(groupCols: _*).agg(approx_count_distinct(target, rsd).as("approx_distinct"))

  /** Greenwald-Khanna approximate quantiles per group. */
  def approxQuantiles(df: DataFrame, groupCols: Seq[Column], target: Column,
      qs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(percentile_approx(target, array(qs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Exact percentile (sort-based) — the verification baseline. */
  def exactQuantiles(df: DataFrame, groupCols: Seq[Column], target: Column, qs: Seq[Double]): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(percentile(target, array(qs.map(lit): _*)).as("quantiles"))
}
