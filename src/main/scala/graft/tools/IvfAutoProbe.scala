package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Similarity

/** Recall/cost evidence for the √N IVF cell sizing (ivfCentroidEvery):
  * recall@5 vs exact brute at each SF dir given, for the pinned-32
  * contract spacing vs the auto spacing, with cell counts. Usage:
  *   runMain graft.tools.IvfAutoProbe <sfDir> [<sfDir> ...]
  */
object IvfAutoProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val e = graft.sources.Tables.embeddings(spark, dir)
      val n = e.count()
      val q = e.filter(pmod(col("vec_id"), lit(97)) === 0)
      val truth = Similarity.cosineTopK(q, e, 5)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(every: Int): (Double, Double) = {
        val t0 = System.nanoTime()
        val got = Similarity.cosineTopKIvf(q, e, 5, every, 4, 2)
          .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        (got.intersect(truth).size.toDouble / truth.size, dt)
      }
      val auto = Similarity.ivfCentroidEvery(n)
      val (rPinned, tPinned) = recall(32)
      val (rAuto, tAuto) = recall(auto)
      println(f"IVFAUTO dir=$dir n=$n auto_every=$auto cells_pinned=${n / 32} cells_auto=${n / auto} " +
        f"recall_pinned=$rPinned%.3f (${tPinned}%.1f s) recall_auto=$rAuto%.3f (${tAuto}%.1f s)")
    }
    spark.stop()
  }
}
