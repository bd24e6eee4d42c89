package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** ANN quality evidence: recall@10 (vs exact brute-force cosine) and
  * warm min-of-2 timing for every approximate variant in the catalog
  * — LSH buckets, IVF probe, PQ-ADC, SQ8 shortlist — on the real
  * embeddings table. Run: `runMain graft.tools.RecallProbe [sfDir]`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, sfDir)
    val queries = e.filter(pmod(col("vec_id"), lit(97)) === 0)
    val nq = queries.count()
    val k = 10

    // truth baseline as a LOCAL set (nq·k id pairs — tiny): keeping it
    // as a persisted DataFrame broke the timings, because the
    // per-probe clearCache unpersisted it and every timed run then
    // recomputed the full brute-force scan inside the timing window
    val truthSet = Similarity.cosineTopK(queries, e, k)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nTruth = truthSet.size
    println(s"RECALL sf=$sfDir n_vecs=${e.count()} n_queries=$nq k=$k truth_rows=$nTruth")

    def probe(name: String, fn: () => DataFrame): Unit = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = fn().select(col("qid"), col("vec_id")).collect()
        // timer stops BEFORE the cache clear — clearCache cost is
        // bookkeeping between runs, not part of the variant
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val hits = rows.count(r => truthSet((r.getLong(0), r.getLong(1)))).toLong
        (t, hits)
      }
      once() // warm
      val (t1, hits) = once(); val (t2, _) = once()
      println(f"RECALL $name%-6s recall@$k=${hits.toDouble / nTruth}%.3f time=${math.min(t1, t2)}%.2f s")
    }

    probe("brute", () => Similarity.cosineTopK(queries, e, k))
    // bucket calibration: expected bucket size = n_vecs / 2^nBits —
    // nBits must track corpus size (the gated knn_lsh runs 8 bits at
    // this scale; 16 bits only makes sense past ~1M vectors)
    probe("lsh8", () => Similarity.cosineTopKLsh(queries, e, k, 8))
    probe("lsh16", () => Similarity.cosineTopKLsh(queries, e, k, 16))
    // OR-amplification: L tables of nBits — recall 1-(1-p^nBits)^L
    probe("lshm6x8", () => Similarity.cosineTopKLshMulti(queries, e, k, 6, 8))
    probe("lshm8x4", () => Similarity.cosineTopKLshMulti(queries, e, k, 8, 4))
    probe("lshm4x12", () => Similarity.cosineTopKLshMulti(queries, e, k, 4, 12))
    val (autoBits, autoTables) = Similarity.lshMultiKnobs(e.count())
    println(s"RECALL auto knobs: ${autoBits} bits x ${autoTables} tables")
    probe("lshmAuto", () => Similarity.cosineTopKLshMultiAuto(queries, e, k))
    probe("ivf4", () => Similarity.cosineTopKIvf(queries, e, k))
    probe("ivf8", () => Similarity.cosineTopKIvf(queries, e, k, nProbe = 8))
    probe("pq16", () => Similarity.cosineTopKPq(queries, e, k))
    probe("pq64", () => Similarity.cosineTopKPq(queries, e, k, rerank = 64))
    probe("sq8", () => Similarity.cosineTopKSq8(queries, e, k))
    spark.stop()
  }
}
