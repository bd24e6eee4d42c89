package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // intended bounded-broadcast all-pairs scorers (see PLANS.md)
    val intendedBnlj = Set("knn_cosine_brute", "knn_ivf", "q94_mrl_ann", "q21_outcome_perms", "q26_nearest_hub",
      "q46_ivf_index", "q54_knn_pq", "q55_semdedup", "q58_cluster_curate", "q53_dup_clusters",
      "q60_sq8_ann", "q68_bloom_decontaminate", "dedup_embedding_cosine", "knn_lsh", "curate_corpus",
      // per-stratum counts × one-row totals (both tiny, broadcast)
      "q77_temperature_mix",
      // one-row budget scalar × the ≤1001-row histogram (both bounded)
      "q82_budget_select",
      // |sources|-row sketch table self-paired on grp_a < grp_b (tiny)
      "q88_source_overlap",
      // three 1-row audit aggregates cross-joined (all bounded)
      "q96_dedup_report",
      // one-row occurrence total broadcast into the scoring scan
      "q97_surprisal_lm",
      // one-row threshold scalar × vocab estimates (scalar broadcast)
      "q98_heavy_hitters",
      // one-row time-midpoint scalar broadcast into the event scan
      "q103_dist_drift",
      // four 1-row stage counts cross-joined into the 3-row report
      "q104_dedup_funnel",
      // broadcast centroid-table argmin assign (the IVF assign shape)
      "q105_embed_outliers",
      // referential check: 1-row total × 1-row violation count
      "q112_validate",
      // 1-row source signature × 1-row copy signature
      "q116_copy_verify",
      // one-row occurrence-total threshold × candidate estimates
      // (the q98 scalar-broadcast shape on the advanced sketch)
      "q122_cms_incr",
      // strata-sized allocation table × two 1-row totals (budget math
      // on a dimension-sized table, all bounded)
      "q123_stratified_alloc",
      // |types|-row sketch table self-paired on type_a < type_b (the
      // q88 tiny-self-pair shape)
      "q124_kmv_intersect",
      // broadcast centroid-table argmin probe (the q105/knn_ivf IVF
      // assign shape, against the persisted index)
      "q125_ivf_incr",
      // eleven 1-row stage aggregates cross-joined into the one-row
      // advance report (the q96/q104 bounded-report shape), plus the
      // q122 scalar threshold and the q125 centroid argmin inside
      "q127_ingest_advance",
      // the advance report's seven 1-row aggregates cross-joined with
      // five 1-row reloaded-chain counts (the q127 bounded-report shape)
      "q128_delta_roundtrip",
      // the advanceOnce report's 1-row aggregates cross-joined with the
      // 1-row cluster-advance summary (q127's bounded-report shape plus
      // the q53 broadcast relabel)
      "q131_daily_pipeline",
      // q128's bounded report cross-joined with the reloaded dup
      // chain's 1-row assignment summary (the two-family disk cycle)
      "q134_daily_cycle_persisted",
      // TWO advance reports (day 1 × broadcast day 2) cross-joined
      // with the rebased head's counts — q134's shape through the
      // rebase boundary
      "q135_daily_cycle_rebase")
    var cart = 0; var bnljUnexpected = 0; var n = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        n += 1
        if (p.contains("CartesianProduct")) { cart += 1; println(s"SWEEP CARTESIAN $name") }
        if (p.contains("BroadcastNestedLoopJoin") && !intendedBnlj(name)) {
          bnljUnexpected += 1; println(s"SWEEP BNLJ $name")
        }
      } catch { case e: Throwable => println(s"SWEEP ERR $name ${e.getMessage.take(80)}") }
      spark.catalog.clearCache()
    }
    println(s"SWEEP DONE n=$n cartesian=$cart unexpected_bnlj=$bnljUnexpected")
    spark.stop()
  }
}
