// Times dedup_simhash's candidate join (the one super-linear query at
// the dist<=7 contract — see PLANS.md crossover section) under both
// physical join strategies on the 50k-doc corpus: SortMergeJoin
// (default) vs ShuffledHashJoin (preferSortMergeJoin=false). The join
// emits ~2G candidate pairs through a codegen filter; per-pair emit
// cost dominates, so the strategy choice matters more than usual.
//   sbt 'runMain graft.tools.SimHashJoinProbe'
package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

object SimHashJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "simhash-join-probe")
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val big = (0 until 10).map(i => base.select((col("doc_id") + i * 1000000).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    println(s"[shj] corpus rows: ${big.count()}")
    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val n = Dedup.simHashPairs(big, col("doc_id"), col("text"), 7).count()
      println(f"[shj] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n pairs)")
    }
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    run("sort-merge   d7 8x8")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    run("shuffled-hash d7 8x8")
    spark.stop()
  }
}
