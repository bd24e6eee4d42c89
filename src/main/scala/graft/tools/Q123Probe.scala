// Stage anatomy of q123_stratified_alloc at a given SF: where the
// corpus pass spends its time (hash compute vs TopKAgg aggregate vs
// membership join). min-of-2 warm per stage.
//   sbt 'runMain graft.tools.Q123Probe [sfDir]'
package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{Dedup, TextAnalysis => TA}

object Q123Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    val spark = GraftSession.local(32, "q123-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.sources.Tables.documents(spark, dir)
    d.count()
    def ph(b: Int, p: Long) =
      Dedup.polyHash(d, concat(col("doc_id").cast("string"), lit("/sa")), b, p)
    val w = pmod(ph(Dedup.PolyB1, Dedup.PolyP1) * lit(Dedup.PolyP2) +
      ph(Dedup.PolyB2, Dedup.PolyP2), lit(1L << 53))
    def t2(tag: String)(f: => Unit): Unit = {
      f
      val m = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }.min
      println(f"[q123] $tag $m%.2f s")
    }
    // double sum: a LONG sum of ~2^53-sized weights overflows past
    // ~1k rows under ANSI mode — this stage only times scan+hash
    t2("scan+hash")(d.select(col("source"), w.as("__w"))
      .agg(sum(col("__w").cast("double"))).collect())
    t2("counts+topk")(d.select(col("source").as("stratum"), col("doc_id").as("id"), w.as("__w"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("c"),
        graft.functions.TopKAgg.topk(500)((-col("__w")).cast("double"), col("__w")).as("tk"))
      .write.format("noop").mode("overwrite").save())
    t2("full operator")(TA.stratifiedAlloc(d, col("doc_id"), col("source"), w, 500)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
