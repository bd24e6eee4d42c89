package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables.
  *
  * All loaders take the scale-factor directory so the same query
  * code runs at any SF (and, on a cluster, against a real lake).
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = p(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "embeddings")

  /** `events` carries a TIMESTAMP(NANOS) column, which Spark reads
    * as long nanos (see GraftSession nanosAsLong). Expose `ts` as a
    * microsecond timestamp (floor division — matches DuckDB's
    * ns→us truncation) plus the raw nanos for exact comparisons.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = p(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // TIMESTAMP(NANOS) parquet read as long nanos (nanosAsLong)
        raw
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(floor(col("ts") / 1000L).cast("long")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // TIMESTAMP(MICROS) without UTC adjustment (isAdjustedToUTC=false)
        // reads as TIMESTAMP_NTZ; the session is pinned UTC, so the NTZ
        // wall clock IS the instant — normalize to TIMESTAMP so every
        // downstream unix_micros/window expression sees one type.
        val t = col("ts").cast("timestamp")
        raw.withColumn("ts", t).withColumn("ts_ns", unix_micros(t) * 1000L)
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }
}
