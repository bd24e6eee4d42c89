// Plan audit: prints formatted physical plans for key queries so
// pushdown/broadcast/codegen can be reviewed. Run:
//   sbt 'Test/runMain graft.tools.ExplainAudit <sfDir>'
package graft.tools

import graft.{GraftSession, SparkEntry}

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(8, "explain-audit")
    val keys = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q1_agg", "q2_filter_project", "q3_join_agg", "q5_multi_join",
      "q9_latest_per_key", "lake_daily_prune", "dedup_exact", "knn_cosine_brute",
      // round-7 family representatives
      "q87_domain_cap", "q88_source_overlap", "q92_cdc_chunks", "q95_novelty_incr",
      // round-8 family representatives
      "q107_bpe_train", "q110_fuzzy_join", "q112_validate", "q114_kmv_distinct")
    keys.foreach { k =>
      println(s"\n=============== $k ===============")
      SparkEntry.queries(k)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
