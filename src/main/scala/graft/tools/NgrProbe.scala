package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Re-measures the ngram-staging persist choice post-TextStats-era:
  * the jaccard/containment family recomputes the exploded (doc, ng)
  * staging 3× (sizes, df-count, rare join) — the r3 measurement that
  * chose recompute predates the native ngram kernel and the r7
  * containment corpus. Shapes timed at sf1 (warm min-of-2):
  *   A) current: recompute ngr per consumer
  *   B) persist ngr (MEMORY_AND_DISK) across the 3 consumers
  */
object NgrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = GraftSession.local(32, "ngr-probe")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    def corpus: DataFrame = {
      val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val w = split(col("text"), " ")
      d.unionByName(d.filter(pmod(col("doc_id"), lit(9)) === 0)
        .select((col("doc_id") + 40000).as("doc_id"),
          concat_ws(" ", slice(w, lit(1), ((size(w) + 1) / 2).cast("int"))).as("text")))
    }

    def time(tag: String)(f: => Long): Unit = {
      def once: Double = { val t0 = System.nanoTime(); val r = f; (System.nanoTime() - t0) / 1e9 }
      once
      println(f"NGRPROBE $tag ${math.min(once, once)}%.2f s")
    }

    def contained(ngr: DataFrame): DataFrame = {
      val sizes = ngr.groupBy(col("doc_id")).agg(count(lit(1)).as("nn"))
      val rareNg = ngr.groupBy(col("ng")).agg(count(lit(1)).as("dfreq"))
        .filter(col("dfreq") <= 20).select(col("ng"))
      val rare = ngr.join(rareNg, Seq("ng")).persist(StorageLevel.MEMORY_AND_DISK)
      val a = rare.select(col("doc_id").as("id_a"), col("ng"))
      val b = rare.select(col("doc_id").as("id_b"), col("ng"))
      val swap = col("na") > col("nb")
      a.join(b, Seq("ng")).filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("id_a"), col("nn").as("na")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("nn").as("nb")), Seq("id_b"))
        .select(when(swap, col("id_b")).otherwise(col("id_a")).as("id_contained"),
          col("inter"))
    }

    time("A_recompute") {
      val c = corpus
      val ngr = c.select(col("doc_id"), explode(Dedup.hashedNgrams(c, col("text"), 3)).as("ng"))
      val r = contained(ngr).count()
      spark.catalog.clearCache(); r
    }
    time("B_persist_ngr") {
      val c = corpus
      val ngr = c.select(col("doc_id"), explode(Dedup.hashedNgrams(c, col("text"), 3)).as("ng"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val r = contained(ngr).count()
      spark.catalog.clearCache(); r
    }
    // C) bounded-bucket shape (the production path since r8):
    // scan-local sizes + one partial-agg'd BoundedSetAgg exchange +
    // local pair expansion — no self-join, no persist
    time("C_bounded_bucket") {
      val r = Dedup.ngramContainmentPairs(corpus, col("doc_id"), col("text"), 3, 20, 800000L).count()
      spark.catalog.clearCache(); r
    }
    spark.stop()
  }
}
