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

  /** 2^i as a 64-literal array — lets a column-valued bit index select
    * its mask without a column-shift expression (functions.shiftleft
    * only takes literal shifts; an expr() string or a UDF would leave
    * whole-stage codegen).
    */
  private val Pow2: Column = array((0 until 64).map(i => lit(1L << i)): _*)

  /** One-row bitmap filter (a Bloom filter with k = 1) over a 64-bit
    * hash column: `mBits` bits stored as an array of mBits/64 longs,
    * bit (h mod mBits) set for every distinct input hash. Built
    * distributed (distinct → per-word bit union; summing distinct
    * powers of two IS the bitwise OR — no carries), then carried as
    * one broadcastable row of mBits/8 bytes: ~10× smaller than the
    * exact 8-byte hash set at FPR ≈ n/mBits. False positives only —
    * a membership pre-filter that can never drop a real hit, so an
    * exact verify join over the survivors returns exactly the
    * unfiltered result (q68's contract).
    */
  def bitmap(hashes: DataFrame, h: Column, mBits: Int): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    val words = hashes.select(pmod(h, lit(mBits.toLong)).as("p")).distinct()
      .select(floor(col("p") / 64).cast("long").as("w"),
        Pow2(pmod(col("p"), lit(64L)).cast("int")).as("bit"))
      .groupBy(col("w")).agg(sum(col("bit")).as("bits"))
    hashes.sparkSession.range(mBits / 64).toDF("w")
      .join(words, Seq("w"), "left")
      .select(col("w"), coalesce(col("bits"), lit(0L)).as("bits"))
      .agg(transform(array_sort(collect_list(struct(col("w"), col("bits")))),
        t => t.getField("bits")).as("mask"))
  }

  /** Membership test against a [[bitmap]] `mask` column — pure Column
    * arithmetic (array index + literal-array power-of-two AND), stays
    * inside whole-stage codegen on the scan side.
    */
  def bitmapMightContain(mask: Column, h: Column, mBits: Int): Column = {
    val p = pmod(h, lit(mBits.toLong))
    mask(floor(p / 64).cast("int"))
      .bitwiseAND(Pow2(pmod(p, lit(64L)).cast("int"))) =!= lit(0L)
  }
}
