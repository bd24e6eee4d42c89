package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession}
import graft.operators.Dedup
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "scale-probe")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))
    // 10x corpus with distinct ids (~50k docs)
    val big = (0 until 10).map(i => base.select((col("doc_id") + i * 1000000).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    println(s"corpus rows: ${big.count()}")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    time("minhash") { println("pairs: " + Dedup.minHashLshPairs(big, col("doc_id"), col("text"), 3, 4, 4, 0.5).count()) }
    spark.catalog.clearCache()
    time("simhash") { println("pairs: " + Dedup.simHashPairs(big, col("doc_id"), col("text"), 7).count()) }
    spark.catalog.clearCache()
    // the corpus-scale chunking knob: same maxDist, 256x fewer random
    // chunk collisions (see Dedup.simHashPairs scaladoc)
    time("simhash d3 8x8") { println("pairs: " + Dedup.simHashPairs(big, col("doc_id"), col("text"), 3).count()) }
    spark.catalog.clearCache()
    time("simhash d3 4x16") { println("pairs: " + Dedup.simHashPairs(big, col("doc_id"), col("text"), 3, nChunks = 4).count()) }
    spark.catalog.clearCache()
    time("ngram") { println("pairs: " + Dedup.ngramJaccardPairs(big, col("doc_id"), col("text"), 3, 20, 0.5).count()) }
    spark.stop()
  }
}
