// End-to-end daily cost of the persisted dup-cluster subsystem vs the
// from-scratch alternative, at replica scale: corpus = documents ×
// factor (word-tagged per replica, the SfxGen contract), batch = the
// planted exact + near copies. The incremental path loads the
// persisted DupState, pairs the batch against the PERSISTED bands/ngr
// (no old-text re-shingling), advances the assignment through the
// quotient CC, and writes a delta version; the from-scratch path
// re-runs dedupClusters over corpus ∪ batch (re-shingle + full band
// join + full-graph CC — what a non-incremental pipeline pays daily).
// Both assignments are compared for exact equality.
//
//   sbt 'runMain graft.tools.DupStateProbe [sfDir] [factor]'
package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{Dedup, DupState}

object DupStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.local(32, "dup-state-probe")
    spark.sparkContext.setLogLevel("WARN")

    // word-tagged replicas: near-dup structure is per-replica, so pair
    // counts scale linearly (the SfxGen rationale). Stride 1e8, NOT
    // 1e6: an sf1-replica input's OWN doc_ids already span ~[0, 1e7)
    // (SfxGen uses 1e6 strides internally), so a 1e6 probe stride
    // collided replica ids and silently merged unrelated docs — the
    // r14 runs of this probe fed both sides the same degenerate corpus
    // (ratios and exactness held; the absolute doc counts were ~3×
    // overstated). Caught by NgrLayoutProbe r15.
    val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n0 = d0.count()
    val corpus = (0 until factor).map { r =>
      d0.select((col("doc_id") + lit(r * 100000000L)).as("doc_id"),
        concat(lit(s"r$r "), col("text")).as("text"))
    }.reduce(_ unionByName _)
    // batch drawn from replica 0 ONLY: constant batch size while the
    // corpus scales with `factor` — the daily-ingest ratio under test;
    // batch offsets far above any replica id range (replica r lives at
    // r·1e8 + [0, 1e8)) keep the new-ids arrival contract honest at
    // any factor (an earlier +1e7 offset collided with replica 10's
    // ids and the exactness check caught it)
    val r0 = corpus.filter(col("doc_id") < 100000000L)
    val batch = r0.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 10000000000L).as("doc_id"), col("text"))
      .unionByName(r0.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 20000000000L).as("doc_id"),
          concat(col("text"), lit(" graft extra marker")).as("text")))
    println(s"PROBE corpus_docs ${n0 * factor} batch_docs ${batch.count()}")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val dir = "file:///tmp/graft_dup_state_probe"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    timed("bootstrap_init_save") {
      DupState.save(DupState.init(corpus, col("doc_id"), col("text")), dir, 0L)
    }
    val st0 = timed("incr_load")(DupState.load(spark, dir, upTo = 0L)._2)
    timed("incr_advance_save") {
      DupState.saveDelta(DupState.advance(st0, batch, col("doc_id"), col("text")), dir, 1L)
    }
    val incr = timed("incr_reload_merge") {
      val out = DupState.load(spark, dir, upTo = 1L)._2.comp
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count(); out
    }
    val scratch = timed("from_scratch_clusters") {
      val out = Dedup.dedupClusters(corpus.unionByName(batch), col("doc_id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count(); out
    }
    val diff = incr.exceptAll(scratch).count() + scratch.exceptAll(incr).count()
    println(s"PROBE identical ${diff == 0L} (symmetric diff $diff rows)")
    spark.stop()
  }
}
