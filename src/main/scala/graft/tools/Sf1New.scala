package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}
/** Warm min-of-2 sf1 timing for the round-4 additions (crossover table). */
object Sf1New {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("events", "documents", "embeddings").foreach(t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count())
    val keys = if (args.length > 1) args.drop(1).toSeq
      else Seq("q59_minhash_est", "q60_sq8_ann", "q61_funnel", "q62_moving_avg",
        "q63_pivot", "q64_sliding_window", "q65_weighted_sample",
        "q66_adaptive_quality_gate", "q67_incremental_dedup", "q68_bloom_decontaminate",
        "q53_dup_clusters")
    // noop sink, NOT count(): under a count Catalyst eliminates
    // left joins against unique-key aggregates, so a query like
    // q102 (corpus LEFT JOIN per-doc agg) would skip its entire
    // span-derivation chain and report scan cost only
    def once(k: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    keys.foreach(once) // warm
    keys.foreach { k => println(f"SF1NEW $k ${math.min(once(k), once(k))}%.2f s") }
    spark.stop()
  }
}
