package graft.tools
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{TextAnalysis => TA}
import graft.sources.Tables

/** Where does q87_domain_cap's sf1 time go? Stage anatomy with FORCED
  * udaf evaluation — a bare .count() above groupBy.agg(topk) lets
  * column pruning delete the aggregate (and its whole input
  * projection), so every timing consumes the topk array itself.
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    def feat = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"),
        length(col("text")).as("n_chars"),
        TA.wsTokenCount(col("text")).as("n_words"),
        TA.punctCount(col("text")).as("n_punct"),
        TA.stopHits(col("text")).as("n_stop"))
      .withColumn("q", TA.qualityScore(col("n_chars"), col("n_words"), col("n_punct"), col("n_stop")))

    def time(tag: String)(f: => Long): Unit = {
      def once: Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      once // warm
      println(f"CAPPROBE $tag ${math.min(once, once)}%.2f s")
    }

    // consume the topk array so nothing prunes
    def force(grouped: DataFrame): Long =
      grouped.filter(size(col("tk")) >= 0).count()

    def viaTopk(s: Column): Long =
      force(Tables.documents(spark, sfDir)
        .select(col("source"), s.cast("double").as("s"), col("doc_id").as("i"))
        .groupBy(col("source"))
        .agg(graft.functions.TopKAgg.topk(5)(col("s"), col("i")).as("tk")))

    time("composed_q87")(TA.domainCap(feat, col("source"), col("doc_id"), col("q"), 5).count())
    time("forced_plain_cols")(viaTopk((col("n_chars") % 1000)))
    time("forced_quality_inline")(viaTopk(TA.qualityScore(length(col("text")),
      TA.wsTokenCount(col("text")), TA.punctCount(col("text")), TA.stopHits(col("text")))))
    time("forced_repart_pre_agg") {
      force(feat.select(col("source"), col("q").cast("double").as("s"), col("doc_id").cast("long").as("i"))
        .repartition(32)
        .groupBy(col("source"))
        .agg(graft.functions.TopKAgg.topk(5)(col("s"), col("i")).as("tk")))
    }
    time("forced_len_only")(viaTopk(least(length(col("text")).cast("double") / 500.0, lit(1.0))))
    time("forced_nwords_only")(viaTopk(TA.wsTokenCount(col("text"))))
    time("forced_stophits_only")(viaTopk(TA.stopHits(col("text"))))
    time("forced_punct_only")(viaTopk(TA.punctCount(col("text"))))
    time("forced_k1")(force(feat
      .select(col("source"), col("q").cast("double").as("s"), col("doc_id").cast("long").as("i"))
      .groupBy(col("source"))
      .agg(graft.functions.TopKAgg.topk(1)(col("s"), col("i")).as("tk"))))
    spark.stop()
  }
}
