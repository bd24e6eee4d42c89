package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup
/** Exact-verify vs estimator-only minhash at 50k docs (q59's claim:
  * dropping the candidate x ngram verify joins is the scale win). */
object EstProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "est-probe")
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))
    val big = (0 until 10).map(i => base.select((col("doc_id") + i * 1000000).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    println(s"corpus rows: ${big.count()}")
    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); val n = f
        spark.catalog.clearCache()
        println(f"EST $name run$i pairs=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    time("exact-verify") { Dedup.minHashLshPairs(big, col("doc_id"), col("text"), 3, 4, 4, 0.5).count() }
    time("estimator") { Dedup.minHashEstPairs(big, col("doc_id"), col("text"), 3, 4, 4, 0.5).count() }
    spark.stop()
  }
}
