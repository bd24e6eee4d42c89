package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DupState, Ingest}
import graft.sources.Tables

/** Phase anatomy of the q134 persisted two-family cycle (optimization
  * r17 §1 "measure first"): times each choreography phase of the entry
  * in isolation — ingest bootstrap save (bucketed), dup bootstrap
  * save, ingest load+advance+delta save, dup load+advance+delta save,
  * chain reload + report aggregate — so the entry's wall can be
  * attributed to compute vs persistence vs report instead of guessed
  * from job counts. Batch = the q134 3-class planted batch. Args:
  * [sfDir] [runs].
  */
object CycleAnatomyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("ERROR")
    val prof = graft.GraftSession.profileOf(s)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val batch = d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" graft extra marker")).as("text")))
      .unionByName(d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 30000).as("doc_id"))
        .withColumn("text", concat_ws(" ", transform(sequence(lit(1), lit(40)),
          i => concat(lit("nv"), col("doc_id").cast("string"), lit("_"),
            i.cast("string"))))))
    val results = (0 until (runs + 1)).map { r =>
      val root = java.nio.file.Files.createTempDirectory("graft_cyc_anatomy").toString
      val ingDir = s"$root/ing"; val dupDir = s"$root/dup"
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def timeIt(tag: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        out(tag) = (System.nanoTime() - t0) / 1e9
      }
      timeIt("ing_bootstrap") {
        Ingest.saveStates(Ingest.initStates(d, col("doc_id"), col("text")), ingDir, 0L,
          buckets = Some(prof.lakeBuckets))
      }
      timeIt("dup_bootstrap") {
        DupState.save(DupState.init(d, col("doc_id"), col("text")), dupDir, 0L)
      }
      var report: org.apache.spark.sql.DataFrame = null
      timeIt("ing_advance") {
        val (_, ist0) = Ingest.loadStates(s, ingDir, upTo = 0L)
        val (rep, _, dd) = Ingest.advanceOnceDelta(batch, ist0, col("doc_id"), col("text"))
        report = rep
        Ingest.saveStatesDelta(dd, ingDir, 1L)
      }
      timeIt("dup_advance") {
        val (_, dst0) = DupState.load(s, dupDir, upTo = 0L)
        DupState.saveDelta(DupState.advance(dst0, batch, col("doc_id"), col("text")),
          dupDir, 1L)
      }
      timeIt("reload_report") {
        val (_, ist1) = Ingest.loadStates(s, ingDir, upTo = 1L)
        val (_, dst1) = DupState.load(s, dupDir, upTo = 1L)
        report
          .crossJoin(ist1.keepers.agg(count(lit(1)).as("n_keepers_after")))
          .crossJoin(ist1.sigs.agg(count(lit(1)).as("n_sigs_after")))
          .crossJoin(ist1.ng3.agg(count(lit(1)).as("n_ng3_after")))
          .crossJoin(ist1.ng8.agg(count(lit(1)).as("n_ng8_after")))
          .crossJoin(ist1.cms.agg(expr("CAST(sum(cell) DIV 4 AS BIGINT)").as("n_token_occ")))
          .crossJoin(dst1.comp.agg(
            count(lit(1)).as("n_cluster_rows"),
            countDistinct(col("cluster_id")).as("n_clusters"),
            sum(when(col("doc_id") >= 10000, lit(1L)).otherwise(lit(0L)))
              .as("n_batch_dup_docs")))
          .count()
        ()
      }
      Dedup.releaseStaged(s)
      s.catalog.clearCache()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(root))
      out
    }.drop(1) // first run warms codegen/JIT like Bench's catalog warm-up
    val keys = results.head.keys.toSeq
    val mins = keys.map(k => k -> results.map(_(k)).min)
    val total = mins.map(_._2).sum
    println(s"""{"probe":"cycle_anatomy","sf":"$dir","runs":$runs,""" +
      mins.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString(",") +
      s""","total":${fmt(total)}}""")
    s.stop()
  }
}
