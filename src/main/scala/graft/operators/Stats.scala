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

  /** Count-min-sketch heavy hitters over a stream of hashed keys
    * (Cormode & Muthukrishnan 2005): `depth` rows × `width` buckets of
    * summed counts, where key k maps to bucket perm_s(k) mod width in
    * row s (the affine MinHash permutations — already engine-portable)
    * and its estimate is the MIN over its depth bucket sums. Estimates
    * only ever OVER-count (collisions add), so `est >= minCount` can
    * never miss a true heavy hitter; reported rows carry the exact
    * count alongside for the overcount audit.
    *
    * Scale shape — the reason this exists next to the exact vocab agg:
    * the sketch groupBy has a KNOB-BOUNDED key space (depth·width
    * cells), so partial aggregation caps every mapper's state and the
    * exchange at depth·width rows regardless of vocabulary size, and
    * the finished sketch is a broadcastable few-KB table. Candidate
    * keys then probe it map-side (broadcast join on (s, bucket)); the
    * exact counts for the few survivors come from one semi-joined
    * occurrence pass. A 100 TB frequency profile becomes: one bounded
    * sketch pass + one broadcast probe + one survivor-sized recount —
    * no vocabulary-sized shuffle carries counts for non-hitters.
    *
    * The threshold is a FRACTION of total occurrences (minNum/minDen,
    * exact integer DIV of a broadcast one-row total) — SF-independent,
    * so the same knobs mean the same thing at sf0.01 and at 100 TB.
    * Returns (ng, est, cnt) for keys with est >= total*minNum/minDen.
    */
  def cmsHeavyHitters(occ: DataFrame, key: Column, depth: Int, width: Int,
      minNum: Int, minDen: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "cms dims must be positive")
    val ks = occ.select(key.as("ng"))
    def cells(d: DataFrame): DataFrame = d
      .select(col("ng"), posexplode(array((0 until depth).map(s =>
        pmod(Dedup.minHashPerm(col("ng"), s), lit(width.toLong))): _*)))
      .select(col("ng"), col("pos").as("s"), col("col").as("bucket"))
    val sketch = cells(ks).groupBy(col("s"), col("bucket"))
      .agg(count(lit(1)).as("cell"))
    val thresh = ks.agg(count(lit(1)).as("tot"))
      .select(expr(s"(tot * $minNum) DIV $minDen").as("min_est"))
    val est = cells(ks.distinct())
      .join(broadcast(sketch), Seq("s", "bucket"))
      .groupBy(col("ng")).agg(min(col("cell")).as("est"))
      .crossJoin(broadcast(thresh))
      .filter(col("est") >= col("min_est"))
      .select(col("ng"), col("est"))
    val exact = ks.join(broadcast(est.select(col("ng"))), Seq("ng"), "left_semi")
      .groupBy(col("ng")).agg(count(lit(1)).as("cnt"))
    est.join(exact, Seq("ng"))
  }

  /** Two-window value-distribution drift per group — the
    * data-quality monitor a pipeline runs between ingest batches
    * (population-stability shape in EXACT integers: per-bucket ppm
    * proportions and their absolute delta instead of PSI's log-ratio —
    * libm logs don't replay portably across engines, and the per-bucket
    * |Δppm| rows sum to twice the total-variation distance, the same
    * ranking signal). `isB` classifies each row into window A (false)
    * or B (true); values bucket by integer floor(value/width) capped at
    * `maxBucket` (q41's portable bucketing). Output per (grp, bucket):
    * n_a, n_b, ppm_a, ppm_b, drift_ppm — buckets observed in either
    * window appear, the other side counted 0.
    *
    * Scale shape: ONE conditional-aggregate pass over the corpus
    * (partial agg on the bounded (grp, bucket) key space — the q6
    * FILTER-agg shape, no second scan for the second window); per-group
    * totals re-aggregate the tiny bucket table and broadcast back.
    * Empty-window groups report ppm 0 (guarded — integer division by
    * zero diverges across engines: NULL in Spark, an error in DuckDB).
    */
  def distributionDrift(df: DataFrame, grp: Column, isB: Column, value: Column,
      bucketWidth: Int, maxBucket: Int): DataFrame = {
    require(bucketWidth > 0 && maxBucket >= 0, "bucketing knobs must be positive")
    val counts = df
      .select(grp.as("grp"), isB.cast("long").as("wb"),
        least(floor(value / bucketWidth).cast("bigint"), lit(maxBucket.toLong)).as("bucket"))
      .groupBy(col("grp"), col("bucket"))
      .agg(sum(lit(1L) - col("wb")).as("n_a"), sum(col("wb")).as("n_b"))
    val totals = counts.groupBy(col("grp"))
      .agg(sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
    counts.join(broadcast(totals), Seq("grp"))
      .withColumn("ppm_a", expr("CASE WHEN tot_a = 0 THEN 0 ELSE n_a * 1000000 DIV tot_a END"))
      .withColumn("ppm_b", expr("CASE WHEN tot_b = 0 THEN 0 ELSE n_b * 1000000 DIV tot_b END"))
      .withColumn("drift_ppm", abs(col("ppm_a") - col("ppm_b")))
      .select(col("grp"), col("bucket"), col("n_a"), col("n_b"),
        col("ppm_a"), col("ppm_b"), col("drift_ppm"))
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
