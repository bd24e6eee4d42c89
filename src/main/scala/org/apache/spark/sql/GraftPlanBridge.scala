package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Re-bind a logical plan to a sibling session of the same
  * SparkContext — the zero-copy face of `SparkSession.newSession()`'s
  * documented "isolated SQL configurations ... shared SparkContext and
  * cached data" contract. `Dataset.ofRows` is `private[sql]`, so the
  * one-line accessor lives in this package (the same technique as any
  * session-extension registration; nothing here depends on behavior
  * beyond the public newSession contract).
  *
  * Used by [[graft.operators.Dedup]]'s connected-components loops: the
  * iterative micro-rounds run under a forked session whose
  * `spark.sql.adaptive.enabled=false` is SESSION-LOCAL, instead of
  * toggling the caller's session conf — which leaked AQE-off into any
  * concurrently-overlapped job on the same session (optimization round
  * 17 verdict: every par2 measurement was unstable for exactly that
  * reason). Plans cross sessions by re-analysis: cached data still
  * substitutes (the CacheManager lives in SharedState, shared by
  * construction) and checkpointed RDD leaves are session-independent.
  */
object GraftPlanBridge {
  /** `df`'s analysis-input logical plan, re-bound to `target`. */
  def transplant(target: SparkSession, df: Dataset[_]): DataFrame =
    classic.Dataset.ofRows(target.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[_]].queryExecution.logical)
}
