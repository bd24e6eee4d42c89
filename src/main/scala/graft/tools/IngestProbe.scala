package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Throwaway diagnostic for q127's token-sketch mismatch: dump token
  * stream stats (count, distinct, 64th smallest hash) for the corpus
  * and for the planted batch, to bisect against the DuckDB replay.
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = graft.GraftSession.local()
    val d = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text"))
    val batch = d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("source"), col("text"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("source"),
          concat(col("text"), lit(" graft extra marker")).as("text")))
      .unionByName(d.filter(pmod(col("doc_id"), lit(5)) === 0)
        // same two-step form as q127: in a one-select form the text
        // expression's col("doc_id") resolves to the child's ORIGINAL
        // doc_id (child output outranks lateral column aliases), so the
        // probe's tokens would diverge from the query it bisects
        .select((col("doc_id") + 30000).as("doc_id"), lit("synthetic").as("source"))
        .withColumn("text", concat_ws(" ", transform(sequence(lit(1), lit(40)),
          i => concat(lit("nv"), col("doc_id").cast("string"), lit("_"),
            i.cast("string"))))))
    def stats(name: String, f: org.apache.spark.sql.DataFrame): Unit = {
      val occ = f.select(explode(Dedup.hashedNgramSeq(f, col("text"), 1)).as("ng"))
      val n = occ.count()
      val nd = occ.distinct().count()
      val kth = occ.distinct().orderBy(col("ng")).limit(64).orderBy(col("ng").desc).limit(1)
        .collect().headOption.map(_.getLong(0)).getOrElse(-1L)
      println(s"PROBE $name n=$n distinct=$nd kth64=$kth")
    }
    stats("corpus", d)
    stats("batch_all", batch)
    // one synthetic doc's first tokens for eyeballing
    batch.filter(col("doc_id") >= 30000).select(col("doc_id"), substring(col("text"), 1, 60))
      .orderBy(col("doc_id")).limit(2).collect().foreach(r => println(s"PROBE syn ${r}"))
    s.stop()
  }
}
