package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Kmv, Similarity, Stats}
import graft.sources.Tables

/** Phase anatomy of the q127 catalog ENTRY (not the advanceOnce
  * operator — IngestAnatomyProbe covers that): times the entry's
  * eager phases in its exact order — gate-1 staging, gate-2 staging,
  * IVF index write + append, and the final 11-aggregate report — so
  * the 7.1 s / 91 jobs can be attributed before restructuring
  * (optimization guide §1). Args: [sfDir] [runs].
  */
object Q127AnatomyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("ERROR")
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val results = (0 until (runs + 1)).map { r =>
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def timeIt(tag: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        out(tag) = (System.nanoTime() - t0) / 1e9
      }
      Dedup.withStagingScope(s) {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text"))
        val batch = d.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("source"), col("text"))
          .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 0)
            .select((col("doc_id") + 20000).as("doc_id"), col("source"),
              concat(col("text"), lit(" graft extra marker")).as("text")))
          .unionByName(d.filter(pmod(col("doc_id"), lit(5)) === 0)
            .select((col("doc_id") + 30000).as("doc_id"), lit("synthetic").as("source"))
            .withColumn("text", concat_ws(" ", transform(sequence(lit(1), lit(40)),
              i => concat(lit("nv"), col("doc_id").cast("string"), lit("_"),
                i.cast("string"))))))
        val nBatch = batch.agg(count(lit(1)).as("n_batch"))
        val keepers = Dedup.chunkKeepers(d, col("doc_id"), col("text"), 12)
        val s1tab = Dedup.chunkDedupIncremental(batch, keepers, col("doc_id"), col("text"), 12)
          .select(col("doc_id"), col("n_kept"))
        val chunkAgg = s1tab.agg(count(lit(1)).as("n_chunk_surv"),
          sum(col("n_kept")).as("n_chunks_kept"))
        val keepAgg = Dedup.chunkKeepersMerged(keepers, batch, col("doc_id"), col("text"), 12)
          .agg(count(lit(1)).as("n_keepers_after"))
        var s1docs: org.apache.spark.sql.DataFrame = null
        timeIt("stage_gate1") {
          s1docs = Dedup.stageEager(batch.join(s1tab.select(col("doc_id")), Seq("doc_id")))
        }
        val corpusSigs = Dedup.simHashDf(d, col("doc_id"), col("text"))
        var shDup: org.apache.spark.sql.DataFrame = null
        var s2docs: org.apache.spark.sql.DataFrame = null
        timeIt("stage_gate2") {
          shDup = Dedup.simHashPairsIncrementalBanded(corpusSigs, s1docs,
              col("doc_id"), col("text"), maxDist = 3)
            .select(col("id_new").as("doc_id")).distinct()
          s2docs = Dedup.stageEager(s1docs.join(shDup, Seq("doc_id"), "left_anti"))
        }
        val shAgg = shDup.agg(count(lit(1)).as("n_simhash_dup"))
        val survAgg = s2docs.agg(count(lit(1)).as("n_surv"))
        val novAgg = Dedup.ngramNoveltyIncremental(s2docs,
            Dedup.ngramFirstDocs(d, col("doc_id"), col("text"), 3),
            col("doc_id"), col("text"), 3)
          .agg(expr("sum(novel) * 1000000 DIV sum(nn)").as("novel_ppm"))
        val repAgg = Dedup.selfRepSpansIncremental(s2docs,
            Dedup.ngramFirstDocs(d, col("doc_id"), col("text"), 8),
            col("doc_id"), col("text"), 8)
          .agg(count(lit(1)).as("n_selfrep_spans"),
            coalesce(sum(col("span_tokens")), lit(0L)).as("selfrep_tokens"))
        def tokHash(f: org.apache.spark.sql.DataFrame) = f.select(col("source"),
          explode(Dedup.hashedNgramSeq(f, col("text"), 1)).as("ng"))
        val kAdv = Kmv.advance(Kmv.sketch(tokHash(d), Seq(col("source")), col("ng"), 64),
          tokHash(s2docs), Seq(col("source")), col("ng"), 64)
        val kGroups = kAdv.agg(count(lit(1)).as("n_kmv_groups"))
        val kEst = Kmv.merge(kAdv, Seq.empty, 64)
          .select(Kmv.estimate(col("ks"), 64, Dedup.PolyP1).as("est_vocab"))
        val occC = d.select(explode(Dedup.hashedNgramSeq(d, col("text"), 1)).as("ng"))
        val occB = s2docs.select(explode(Dedup.hashedNgramSeq(s2docs, col("text"), 1)).as("ng"))
        val cAdv = Stats.cmsMerge(Stats.cmsCells(occC, col("ng"), 4, 256),
          Stats.cmsCells(occB, col("ng"), 4, 256))
        val cCands = Stats.cmsHeavyHitters(occC, col("ng"), 4, 256, 2, 100).select(col("ng"))
          .unionByName(occB.select(col("ng")).distinct()).distinct()
        val cThresh = occC.unionByName(occB).agg(count(lit(1)).as("tot"))
          .select(expr("(tot * 2) DIV 100").as("min_est"))
        val hitAgg = Stats.cmsEstimate(cAdv, cCands, 4, 256)
          .crossJoin(broadcast(cThresh))
          .filter(col("est") >= col("min_est"))
          .agg(count(lit(1)).as("n_hitters"))
        val e = Tables.embeddings(s, dir)
        val path = java.nio.file.Files.createTempDirectory("graft_q127_probe").toString
        timeIt("ivf_write") {
          Similarity.writeIvfIndex(e.filter(pmod(col("vec_id"), lit(3)) =!= 0), path, 32, 2)
        }
        timeIt("ivf_append") {
          Similarity.appendIvfIndex(e.filter(pmod(col("vec_id"), lit(3)) === 0), path)
        }
        val ivfAgg = s.read.parquet(s"$path/cells")
          .filter(pmod(col("vec_id"), lit(3)) === 0)
          .agg(count(lit(1)).as("n_vecs_appended"),
            countDistinct(col("cent_id")).as("n_cells_touched"))
        timeIt("report") {
          nBatch.crossJoin(chunkAgg).crossJoin(keepAgg).crossJoin(shAgg).crossJoin(survAgg)
            .crossJoin(novAgg).crossJoin(repAgg).crossJoin(kGroups).crossJoin(kEst)
            .crossJoin(hitAgg).crossJoin(ivfAgg).count()
          ()
        }
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(); ()
        }
        rm(new java.io.File(path))
      }
      s.catalog.clearCache()
      out
    }.drop(1)
    val keys = results.head.keys.toSeq
    val mins = keys.map(k => k -> results.map(_(k)).min)
    val total = mins.map(_._2).sum
    println(s"""{"probe":"q127_anatomy","sf":"$dir","runs":$runs,""" +
      mins.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString(",") +
      s""","total":${fmt(total)}}""")
    s.stop()
  }
}
