package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

/** q104 estimator-screen crossover experiment (VERDICT r9 item 3):
  * grow a corpus whose bulk is NEAR-VERBATIM duplication (the 100 TB
  * failure mode the screen exists for — crawl re-crawls, mirrored
  * pages) and time dedupFunnel with the stage-3 screen ON
  * (estScreenMinRows = 0) vs BYPASSED (Long.MaxValue) at each size.
  * The screen's value claim: stage 4's candidate×ngram verify joins
  * on the near-verbatim bulk dominate at scale, and the cheap
  * signature screen removes that bulk first. The crossover size is
  * where screen-on first beats screen-off — recorded next to the
  * estScreenMinRows recommendation in PLANS.md.
  *
  *   sbt 'runMain graft.tools.Q104Probe [sfDir] [variants...]'
  */
object Q104Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val variants = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 3, 7)
    val spark = GraftSession.local(32, "q104-probe")
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    base.count()

    // near-verbatim variant k of every doc: words at positions ≡ k
    // (mod 12) get a per-variant tag — ~8% of 3-grams change, so the
    // minhash est ≥ 0.75 screen catches the pair while exact/canonical
    // stages do not (the q104 stage-3 population by construction)
    def variant(k: Int): DataFrame = base.select(
      (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
      array_join(zip_with(split(col("text"), " "),
        sequence(lit(0), size(split(col("text"), " ")) - 1),
        (w, i) => when(pmod(i, lit(12)) === (k % 12), concat(w, lit(s"~v$k")))
          .otherwise(w)), " ").as("text"))

    def time(tag: String)(mk: => DataFrame): Double = {
      def once: Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        Dedup.releaseStaged(spark)
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once, once)
      println(f"Q104PROBE $tag $t%.2f s")
      t
    }

    variants.foreach { v =>
      val corpus = (base +: (1 to v).map(variant)).reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      println(s"Q104PROBE corpus v=$v n=$n")
      time(s"v=$v screen_on")(
        Dedup.dedupFunnel(corpus, col("doc_id"), col("text"), estScreenMinRows = 0L))
      time(s"v=$v screen_off")(
        Dedup.dedupFunnel(corpus, col("doc_id"), col("text"), estScreenMinRows = Long.MaxValue))
      corpus.unpersist()
    }
    spark.stop()
  }
}
