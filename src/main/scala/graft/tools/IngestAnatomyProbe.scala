package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Ingest, Kmv, Stats}
import graft.sources.Tables

/** Stage anatomy of ONE composed advance at the LARGEST state the
  * backfill reaches (state = first three id-quartiles, batch = the
  * fourth): times each stage of Ingest.advanceOnce in isolation so the
  * 45 → 157 s per-advance growth measured by IngestDeltaProbe can be
  * attributed — state READ, chunk gate, signature gate, novelty score,
  * self-rep score, sketch advances, delta writes — instead of guessed.
  * Args: [sfDir].
  */
object IngestAnatomyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    val (kw, k, depth, width) = (12, 64, 4, 256)
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val bounds = d.stat.approxQuantile("doc_id", Array(0.75), 0.001).map(_.toLong)
    val corpus = d.filter(col("doc_id") <= bounds(0))
    val batch = d.filter(col("doc_id") > bounds(0))
    val stateDir = "file://" +
      java.nio.file.Files.createTempDirectory("graft_anatomy_state").toString
    Ingest.saveStates(Ingest.initStates(corpus, col("doc_id"), col("text"), kw, k, depth, width),
      stateDir, 0L)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timeIt(tag: String)(f: => Unit): String = {
      val t0 = System.nanoTime(); f
      s""""$tag":${fmt((System.nanoTime() - t0) / 1e9)}"""
    }
    val (_, st) = Ingest.loadStates(s, stateDir)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    out += timeIt("state_read_counts") {
      Seq(st.keepers, st.sigs, st.ng3, st.ng8).foreach(df => { df.count(); () })
    }
    val b = batch.select(col("doc_id"), col("text"))
    var s1: org.apache.spark.sql.DataFrame = null
    out += timeIt("gate1_chunk") {
      s1 = Dedup.stageEager(b.join(
        Dedup.chunkDedupIncremental(b, st.keepers, col("doc_id"), col("text"), kw)
          .select(col("doc_id")), Seq("doc_id")))
    }
    var shDup: org.apache.spark.sql.DataFrame = null
    out += timeIt("gate2_simhash") {
      shDup = Dedup.stageEager(
        Dedup.simHashPairsIncrementalBanded(st.sigs, s1, col("doc_id"), col("text"), 3)
          .select(col("id_new").as("doc_id")).distinct())
    }
    var s2: org.apache.spark.sql.DataFrame = null
    out += timeIt("survivors") {
      s2 = Dedup.stageEager(s1.join(shDup, Seq("doc_id"), "left_anti"))
    }
    out += timeIt("score_novelty_ng3") {
      Dedup.ngramNoveltyIncremental(s2, st.ng3, col("doc_id"), col("text"), 3)
        .agg(coalesce(expr("sum(novel) * 1000000 DIV sum(nn)"), lit(0L)).as("novel_ppm"))
        .collect()
    }
    out += timeIt("score_selfrep_ng8") {
      Dedup.selfRepSpansIncremental(s2, st.ng8, col("doc_id"), col("text"), 8)
        .agg(count(lit(1)).as("n")).collect()
    }
    out += timeIt("kmv_advance") {
      Kmv.advance(st.kmv, s2.select(explode(Dedup.hashedNgramSeq(s2, col("text"), 1)).as("ng")),
        Seq.empty, col("ng"), k).collect()
    }
    out += timeIt("cms_advance") {
      Stats.cmsMerge(st.cms, Stats.cmsCells(
        s2.select(explode(Dedup.hashedNgramSeq(s2, col("text"), 1)).as("ng")),
        col("ng"), depth, width)).collect()
    }
    val outDir = "file://" +
      java.nio.file.Files.createTempDirectory("graft_anatomy_out").toString
    out += timeIt("delta_write_keepers") {
      Dedup.chunkKeepers(b, col("doc_id"), col("text"), kw)
        .join(st.keepers.select(col("h")), Seq("h"), "left_anti")
        .write.mode("overwrite").parquet(s"$outDir/keepers.d")
    }
    out += timeIt("delta_write_ng8") {
      Dedup.ngramFirstDocs(s2, col("doc_id"), col("text"), 8)
        .join(st.ng8.select(col("ng")), Seq("ng"), "left_anti")
        .write.mode("overwrite").parquet(s"$outDir/ng8.d")
    }
    println(s"""{"probe":"ingest_anatomy","sf":"$dir",${out.mkString(",")}}""")
    s.stop()
  }
}
