package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup
/** q67's scale claim measured: dedup a 5k-doc batch against a 50k-doc
  * corpus (incremental) vs re-pairing the full 55k union (exact
  * self-join) — the incremental cost should track the batch side.
  */
object IncrProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "incr-probe")
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = (0 until 10).map(i => base.select((col("doc_id") + i * 1000000).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    // batch = 10% fresh docs, half of them near-copies of corpus docs
    val batch = base.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 90000000L).as("doc_id"), col("text"))
      .unionByName(base.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") + 91000000L).as("doc_id"),
          concat(col("text"), lit(" incr probe marker")).as("text")))
    println(s"corpus=${corpus.count()} batch=${batch.count()}")
    def time(name: String)(f: => Long): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); val n = f
        spark.catalog.clearCache()
        println(f"INCR $name run$i pairs=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    time("incremental batch-vs-corpus") {
      Dedup.minHashLshPairsIncremental(corpus, batch, col("doc_id"), col("text"), 3, 4, 4, 0.5).count()
    }
    time("full union self-dedup") {
      Dedup.minHashLshPairs(corpus.unionByName(batch), col("doc_id"), col("text"), 3, 4, 4, 0.5).count()
    }
    spark.stop()
  }
}
