package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = GraftSession.local(32, "funnel-probe")
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val c = d.unionByName(d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
    for (thr <- Seq(0L, 1000000000L)) {
      val t0 = System.nanoTime()
      val rows = graft.operators.Dedup.dedupFunnel(c, col("doc_id"), col("text"), thr)
        .orderBy("stage").collect()
      println(f"[funnel] thr=$thr wall=${(System.nanoTime()-t0)/1e9}%.2f s")
      rows.foreach(r => println(s"[funnel]   $r"))
    }
    spark.stop()
  }
}
