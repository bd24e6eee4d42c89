package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}
/** Warm min-of-N timing for the connected-components query family. */
object Q53Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    for (k <- Seq("dedup_minhash_lsh", "q53_dup_clusters", "q58_cluster_curate"); i <- 1 to 5) {
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, sfDir).count()
      spark.catalog.clearCache()
      println(f"PROBE $k run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
