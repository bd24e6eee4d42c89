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

  // --- Deterministic HyperLogLog (oracle-replayable) ------------------------

  /** Register count m = 64 (6 index bits, σ ≈ 1.04/√64 = 13%). */
  val HllM = 64
  /** rho bit-domain W = 32: rho ∈ [1, 33] reads the 32 bits above the
    * index in the wide hash. Register saturation begins around 2^32
    * distinct PER REGISTER — beyond that the deployment swaps in the
    * DECIMAL(38) variant of the same formulas (W = 55 over the full
    * 62-bit domain); the integer-scaled estimate below is chosen so
    * every intermediate fits BIGINT in BOTH engines.
    */
  val HllW = 32
  /** α₆₄·m²·2^(W+1) as an exact integer pair with [[HllAlphaDen]]:
    * raw = HllRawNum DIV (1000·S) where S is the 2^(W+1)-scaled
    * harmonic denominator. 709·4096·2^33 ≈ 2.5e16 < 2^63.
    */
  val HllRawNum: Long = 709L * HllM * HllM * (1L << (HllW + 1))
  val HllAlphaDen = 1000L
  /** Linear-counting table round(m·ln(m/V)) for V = 1..m-1 zero
    * registers — ln is libm and would NOT replay bit-identically
    * across engines, so the 63 values are precomputed HERE and
    * embedded as integer literals in both dialects ([[hllLcSql]]).
    */
  val HllLcTable: Array[Long] =
    (1 until HllM).map(v => math.round(HllM * math.log(HllM.toDouble / v))).toArray
  /** The LC table as a DuckDB 1-based list literal, indexed by `[V]`. */
  def hllLcSql: String = HllLcTable.mkString("[", ", ", "]")

  /** HLL register rows per group: (groupCols…, idx, reg) with
    * idx = wide mod m and reg = max over the group's rows of
    * rho(wide div m mod 2^W), rho = LEADING zeros + 1 = W+1 − bitlen,
    * computed portably as `length(bin(r))` (both engines render the
    * minimal binary string). Leading — not trailing — zeros matter:
    * P(rho ≥ j) = 2^(1−j) then follows from VALUE uniformity alone,
    * which the polynomial mod-prime hash provides; trailing-zero rho
    * needs bit-level independence the polynomial does NOT have
    * (measured +56% bias at 1.5k distinct before the switch).
    * `wide` must be a ≥ W+6-bit uniform-ish hash — compose two
    * portable poly-hashes as h1·P2 + h2 ([[Dedup.polyHash]]).
    *
    * Scale shape — why this exists next to KMV: max is idempotent, so
    * there is NO pre-distinct pass at all; the groupBy partial-agg
    * caps every mapper's state and the exchange at m rows per group
    * regardless of input size, and a register table is mergeable into
    * any coarser grain by the same max ([[hllMerge]]).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[Column], wide: Column): DataFrame =
    df.select(groupCols :+ wide.as("wh"): _*)
      .withColumn("idx", pmod(col("wh"), lit(HllM.toLong)).cast("int"))
      .withColumn("r", pmod(expr(s"wh div $HllM"), lit(1L << HllW)))
      .withColumn("rho", when(col("r") === 0L, lit(HllW + 1))
        .otherwise(lit(HllW + 1) - length(expr("bin(r)"))).cast("int"))
      .groupBy(groupCols :+ col("idx"): _*)
      .agg(max(col("rho")).as("reg"))

  /** Deterministic bounded uniform row-sample per group — the KMV
    * threshold trick: a row is kept iff its sample hash `w` is ≤ the
    * group's k-th smallest hash (MULTISET k-th: hash ties at the
    * boundary enlarge the sample instead of making membership depend
    * on tie arbitration, so the sampled SET is deterministic and the
    * DuckDB oracle replays it). The k smallest ride
    * [[graft.functions.TopKAgg]] (≤ k pairs per group per mapper);
    * the per-group thresholds are a dimension-sized table broadcast
    * back, so sampling a 100 TB fact table costs one bounded partial
    * agg + one map-side filter — no global sort, no per-row RNG state
    * — and the sample is mergeable state by the KMV union property.
    * `w` MUST be < 2^53 (take the wide hash mod 2^53): TopKAgg orders
    * by double, and below 2^53 the double image of a long is exact.
    */
  def kmvRowSample(df: DataFrame, groupCols: Seq[String], w: Column, k: Int): DataFrame = {
    require(k >= 1, "sample size must be positive")
    val gs = groupCols.map(col)
    // the threshold agg and the membership filter each scan the hashed
    // projection — deliberately NOT persisted: the poly-hash rides the
    // codegen kernel (measured ≈ scan cost), so recomputing it is
    // cheaper than serializing the projection to block storage, and at
    // cluster scale a second columnar scan beats materializing a
    // fact-table-sized intermediate
    val staged = df.withColumn("__w", w)
    val thresholds = staged
      .groupBy(gs: _*)
      .agg(graft.functions.TopKAgg.topk(k)((-col("__w")).cast("double"), col("__w")).as("tk"))
      .select(gs :+ element_at(col("tk"),
        least(size(col("tk")), lit(k))).getField("_2").as("__t"): _*)
    staged
      .join(broadcast(thresholds), groupCols)
      .filter(col("__w") <= col("__t"))
      .drop("__w", "__t")
  }

  /** Max-merge register rows to a coarser key — exact by max's
    * associativity (the mergeability contract q120 oracle-proves).
    */
  def hllMerge(regs: DataFrame, groupCols: Seq[Column]): DataFrame =
    regs.groupBy(groupCols :+ col("idx"): _*).agg(max(col("reg")).as("reg"))

  /** The HLL estimate off a DENSE register array column (m = 64 longs,
    * absent registers as 0 — the shape the streaming aggregation
    * buffer carries): same all-integer formula as [[hllEstimate]], as
    * pure Column arithmetic so a stream's windowed agg output and a
    * batch register table produce identical numbers by construction.
    */
  def hllEstimateCol(regs: Column): Column = {
    val s = aggregate(regs, lit(0L), (acc, r) => acc + Pow2((lit(HllW + 1) - r).cast("int")))
    val v = size(filter(regs, r => r === 0L)).cast("int")
    // HllRawNum div (1000·S) with both sides ÷8 (1000 = 8·125 and
    // 2^33 | HllRawNum, so the floor is unchanged): 709·2^42 ≈ 3.1e15
    // and 125·S ≤ 6.9e15 both sit below 2^53, so the subtract-
    // remainder double division is EXACT — lit(HllRawNum) itself
    // (2.5e16) would silently round in the double path.
    val a = lit(709L * (1L << 42))
    val d = lit(HllAlphaDen / 8) * s
    val raw = ((a - a % d) / d).cast("long")
    when(v > 0 && raw <= lit(5L * HllM / 2),
      element_at(array(HllLcTable.map(lit): _*), v)).otherwise(raw)
  }

  /** The HLL estimate off register rows: (groupCols…, est), all-integer
    * arithmetic. S = Σ 2^(W+1−reg) over m registers (absent rows count
    * reg = 0), raw = α·m²·2^(W+1) DIV (1000·S); small range (raw ≤
    * 2.5m with zero registers present) switches to the precomputed
    * linear-counting table — both branches replay exactly in DuckDB.
    */
  def hllEstimate(regs: DataFrame, groupCols: Seq[Column]): DataFrame =
    regs.groupBy(groupCols: _*)
      .agg(sum(Pow2((lit(HllW + 1) - col("reg")).cast("int"))).as("sp"),
        count(lit(1)).as("c"))
      .withColumn("s", col("sp") + (lit(HllM.toLong) - col("c")) * lit(1L << (HllW + 1)))
      .withColumn("v", (lit(HllM.toLong) - col("c")).cast("int"))
      .withColumn("raw", expr(s"${HllRawNum}L div ($HllAlphaDen * s)"))
      .withColumn("est",
        when(col("v") > 0 && col("raw") <= lit(5L * HllM / 2),
          element_at(array(HllLcTable.map(lit): _*), col("v")))
          .otherwise(col("raw")))
      .drop("sp", "c", "s", "v", "raw")

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

  /** CMS cell table `(s, bucket, cell)` for a stream of hashed keys —
    * the MERGEABLE STATE form of [[cmsHeavyHitters]]'s sketch: cells
    * are sums, so a persisted sketch advances by cell-wise addition
    * ([[cmsMerge]]) with no key-level state anywhere. depth·width rows
    * total, partial-aggregated map-side.
    */
  def cmsCells(occ: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "cms dims must be positive")
    occ.select(key.as("ng"))
      .select(posexplode(array((0 until depth).map(s =>
        pmod(Dedup.minHashPerm(col("ng"), s), lit(width.toLong))): _*)))
      .select(col("pos").as("s"), col("col").as("bucket"))
      .groupBy(col("s"), col("bucket")).agg(count(lit(1)).as("cell"))
  }

  /** Unflatten a [[graft.functions.CmsSketchAgg]] cell bank (row s,
    * bucket b at index s·width + b) to the (s, bucket, cell) table
    * [[cmsMerge]]/[[cmsEstimate]] consume; zero cells are dropped to
    * match [[cmsCells]]' groupBy output exactly (CmsStreamSpec
    * asserts cell-by-cell parity on identical rows).
    */
  def cmsBankRows(bank: DataFrame, cells: Column, width: Int): DataFrame = {
    require(width >= 1, "cms width must be positive")
    bank.select(posexplode(cells).as(Seq("i", "cell")))
      .filter(col("cell") > 0)
      .select((col("i") / width).cast("int").as("s"),
        pmod(col("i"), lit(width)).cast("long").as("bucket"), col("cell"))
  }

  /** Advance CMS state by a batch sketch: cell-wise sum (CMS
    * additivity — merge-of-sketches ≡ sketch-of-union exactly, the
    * property q122 oracle-gates). Both inputs carry (s, bucket, cell).
    */
  def cmsMerge(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch)
      .groupBy(col("s"), col("bucket")).agg(sum(col("cell")).as("cell"))

  /** Probe candidate keys against a cell table: (ng, est) with est =
    * min over the key's depth buckets. PRECONDITION: every candidate
    * occurs in the sketched corpus (its cells are all nonzero), which
    * holds for the q122 shape (candidates = previous hitters ∪ batch
    * keys) — an inner broadcast join then mirrors the oracle exactly.
    */
  def cmsEstimate(cells: DataFrame, candidates: DataFrame, depth: Int, width: Int): DataFrame =
    candidates.select(col("ng")).distinct()
      .select(col("ng"), posexplode(array((0 until depth).map(s =>
        pmod(Dedup.minHashPerm(col("ng"), s), lit(width.toLong))): _*)))
      .select(col("ng"), col("pos").as("s"), col("col").as("bucket"))
      .join(broadcast(cells), Seq("s", "bucket"))
      .groupBy(col("ng")).agg(min(col("cell")).as("est"))

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
