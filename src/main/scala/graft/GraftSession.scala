package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Local testing runs `local[32]`; the same conf scales to a real
  * cluster — shuffle.partitions is sized for the local harness and
  * meant to be overridden (or left to AQE coalescing) on a cluster.
  */
object GraftSession {

  /** Apply graft's tuned defaults to any builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // PIN the (already-default) runtime row-level Bloom pruning for
    // large shuffle joins — the injected complement of q68's explicit
    // bitmap pre-filter; pinned so a deployment profile that disables
    // it doesn't silently cost the fact-fact joins (dedup verify,
    // decontamination) at lake scale
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // events.parquet carries TIMESTAMP(NANOS) which vanilla Spark
    // rejects; read as long nanos and convert explicitly (Tables).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")

  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cores]").appName(appName)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
