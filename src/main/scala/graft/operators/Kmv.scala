package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketches as a REUSABLE state
  * operator — the incremental path for the q114/q115/q117 family.
  *
  * A group's sketch is the sorted array of its k smallest distinct
  * hashes. Everything the 100 TB deployment needs follows from two
  * properties:
  *  - BOUNDED EXCHANGE: the sketch aggregates through [[graft.functions.TopKAgg]],
  *    so a mapper ships at most k 8-byte hashes per group — a
  *    dimension-sized aggregate over any corpus size;
  *  - EXACT MERGEABILITY: k-smallest-of-union-of-k-smallest equals
  *    k-smallest-overall (q115's oracle-proven contract), so per-day
  *    sketches persisted as a state table advance per batch without
  *    ever rereading history, and any rollup (per-type, corpus-wide)
  *    is a merge of the state rows it covers.
  *
  * Estimator: est = (k-1) * P / kth_smallest for groups at capacity,
  * exact member count below it (the standard KMV small-side). The
  * hash domain is [0, P) via [[Dedup.polyHash]]; the same constants
  * are replayed by the DuckDB oracles, so the sketch is deterministic
  * end-to-end.
  *
  * Reference anchor: the dup-rate dashboards of event_data.rs:635's
  * listing surface — re-expressed as sketch state instead of
  * corpus-sized GROUP BY state.
  */
object Kmv {

  /** Sorted k-smallest distinct `hash` values per group:
    * groupCols… , ks: array<bigint> ascending, |ks| ≤ k.
    * The pre-aggregation `.distinct()` keeps the UDAF's per-group
    * update cost at one pass over DISTINCT hashes; TopKAgg partial-
    * aggregates map-side so the exchange carries ≤ k per group per
    * mapper either way.
    */
  def sketch(df: DataFrame, groupCols: Seq[Column], hash: Column, k: Int): DataFrame =
    df.select(groupCols :+ hash.as("h"): _*).distinct()
      .groupBy(groupCols: _*)
      .agg(graft.functions.TopKAgg.topk(k)((-col("h")).cast("double"), col("h")).as("tk"))
      .withColumn("ks", expr("transform(tk, p -> p._2)"))
      .drop("tk")

  /** Merge sketches to a coarser key: explode members, dedup, and
    * re-sketch — exact by the k-smallest-of-union property. `state`
    * must carry an `ks` column; `groupCols` is the coarser key (may
    * be empty-adjacent, e.g. just event_type over (event_type, day)
    * rows).
    */
  def merge(state: DataFrame, groupCols: Seq[Column], k: Int): DataFrame =
    sketch(state.select(groupCols :+ explode(col("ks")).as("h"): _*),
      groupCols, col("h"), k)

  /** Advance a per-(key, day) sketch state table by one batch: sketch
    * the batch at the same grain and merge row-groups that collide
    * (late data for an existing day folds in exactly; new days append).
    * Cost is |batch| + |touched state rows| — history is never reread.
    */
  def advance(state: DataFrame, batch: DataFrame, groupCols: Seq[Column],
      hash: Column, k: Int): DataFrame =
    merge(sketch(batch, groupCols, hash, k).unionByName(state), groupCols, k)

  /** The KMV estimate off a sketch array: exact member count below
    * capacity, (k-1)·P / kth smallest at capacity.
    */
  def estimate(ks: Column, k: Int, p: Long): Column = {
    val a = lit((k - 1).toLong * p)
    val kth = element_at(ks, k)
    // exact `a div kth` without expr-string plumbing: subtract the
    // remainder first so the double division is exact (quotient ≤
    // 63·P ≈ 1.4e11 < 2^53), matching DuckDB's integer `//`
    when(size(ks) < k, size(ks).cast("long"))
      .otherwise(((a - a % kth) / kth).cast("long"))
  }
}
