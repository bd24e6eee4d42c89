package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DupState, Ingest}
import graft.sources.Tables

/** Phase anatomy of the q135 TWO-DAY rebase cycle (optimization r18,
  * VERDICT r17 #3 "extend CycleAnatomyProbe to the two-day shape"):
  * times each choreography phase — the two bootstraps (ingest's
  * bucketed), day 1's two advances + delta saves, day 2's two advances
  * with ingest's FULL REBASE save, and the final chain reload +
  * report — so q135's 15.9 s / 303 jobs can be attributed to compute
  * vs persistence vs report instead of guessed. Batches are q135's
  * exact cycleBatch/cycleBatch2 shapes. Args: [sfDir] [runs].
  */
object RebaseAnatomyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("ERROR")
    val prof = graft.GraftSession.profileOf(s)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def novel(idCol: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(1), lit(40)),
        i => concat(lit("nv"), idCol.cast("string"), lit("_"), i.cast("string"))))
    val b1 = d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" graft extra marker")).as("text")))
      .unionByName(d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 30000).as("doc_id"))
        .withColumn("text", novel(col("doc_id"))))
    val b2 = d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 40000).as("doc_id"), (col("doc_id") + 30000).as("src_id"))
      .withColumn("text", novel(col("src_id"))).drop("src_id")
      .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 50000).as("doc_id"),
          concat(col("text"), lit(" graft second marker")).as("text")))
      .unionByName(d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 60000).as("doc_id"))
        .withColumn("text", novel(col("doc_id"))))
    val results = (0 until (runs + 1)).map { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_rebase_anatomy").toString
      val ingDir = s"$root/ing"; val dupDir = s"$root/dup"
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def timeIt(tag: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        out(tag) = (System.nanoTime() - t0) / 1e9
      }
      timeIt("ing_bootstrap_bucketed") {
        Ingest.saveStates(Ingest.initStates(d, col("doc_id"), col("text")), ingDir, 0L,
          buckets = Some(prof.lakeBuckets))
      }
      timeIt("dup_bootstrap") {
        DupState.save(DupState.init(d, col("doc_id"), col("text")), dupDir, 0L)
      }
      var r1: org.apache.spark.sql.DataFrame = null
      var r2: org.apache.spark.sql.DataFrame = null
      timeIt("d1_ing_advance_delta") {
        val (_, i0) = Ingest.loadStates(s, ingDir, upTo = 0L)
        val (rep, _, dd1) = Ingest.advanceOnceDelta(b1, i0, col("doc_id"), col("text"))
        r1 = rep
        Ingest.saveStatesDelta(dd1, ingDir, 1L)
      }
      timeIt("d1_dup_advance_delta") {
        val (_, du0) = DupState.load(s, dupDir, upTo = 0L)
        DupState.saveDelta(DupState.advance(du0, b1, col("doc_id"), col("text")), dupDir, 1L)
      }
      timeIt("d2_ing_advance") {
        val (_, i1) = Ingest.loadStates(s, ingDir, upTo = 1L)
        val (rep, next2, _) = Ingest.advanceOnceDelta(b2, i1, col("doc_id"), col("text"))
        r2 = rep
        // split the advance compute from the rebase write: force the
        // report (the advance's own aggregates) first
        rep.count(); ()
        out("d2_ing_rebase_save") = {
          val t0 = System.nanoTime()
          Ingest.saveStates(next2, ingDir, 2L, buckets = Some(prof.lakeBuckets))
          (System.nanoTime() - t0) / 1e9
        }
      }
      timeIt("d2_dup_advance_delta") {
        val (_, du1) = DupState.load(s, dupDir, upTo = 1L)
        DupState.saveDelta(DupState.advance(du1, b2, col("doc_id"), col("text")), dupDir, 2L)
      }
      timeIt("reload_report") {
        val (_, i2) = Ingest.loadStates(s, ingDir, upTo = 2L)
        val (_, du2) = DupState.load(s, dupDir, upTo = 2L)
        def sfx(df: org.apache.spark.sql.DataFrame, x: String) =
          df.columns.foldLeft(df)((acc, c) => acc.withColumnRenamed(c, c + x))
        sfx(r1, "_d1").crossJoin(broadcast(sfx(r2, "_d2")))
          .crossJoin(i2.keepers.agg(count(lit(1)).as("n_keepers_after")))
          .crossJoin(i2.sigs.agg(count(lit(1)).as("n_sigs_after")))
          .crossJoin(i2.ng3.agg(count(lit(1)).as("n_ng3_after")))
          .crossJoin(i2.ng8.agg(count(lit(1)).as("n_ng8_after")))
          .crossJoin(i2.cms.agg(expr("CAST(sum(cell) DIV 4 AS BIGINT)").as("n_token_occ")))
          .crossJoin(du2.comp.agg(
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
    }.drop(1)
    val keys = results.head.keys.toSeq
    val mins = keys.map(k => k -> results.map(_(k)).min)
    val total = mins.map(_._2).sum
    println(s"""{"probe":"rebase_anatomy","sf":"$dir","runs":$runs,""" +
      mins.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString(",") +
      s""","total":${fmt(total)}}""")
    s.stop()
  }
}
