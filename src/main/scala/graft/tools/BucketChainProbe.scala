package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Ingest
import graft.sources.Tables

/** Stage attribution for the bucketed-base delta chain: builds the SAME
  * 2-delta chain in a plain-base dir and a bucketed-base dir (bootstrap
  * = first two id-quartiles, deltas = third quartile split in two),
  * then times the FOURTH-quartile advance's components in each regime —
  * load, gate staging (report collect), delta save. Args: [sfDir].
  */
object BucketChainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    val (kw, k, depth, width) = (12, 64, 4, 256)
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val bounds = d.stat.approxQuantile("doc_id", Array(0.5, 0.625, 0.75), 0.001).map(_.toLong)
    val boot = d.filter(col("doc_id") <= bounds(0))
    val d1 = d.filter(col("doc_id") > bounds(0) && col("doc_id") <= bounds(1))
    val d2 = d.filter(col("doc_id") > bounds(1) && col("doc_id") <= bounds(2))
    val batch = d.filter(col("doc_id") > bounds(2))
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    def run(buckets: Option[Int]): String = {
      val tag = buckets.fold("plain")(_ => "bucketed")
      val stateDir = "file://" +
        java.nio.file.Files.createTempDirectory(s"graft_chainprobe_$tag").toString
      Ingest.saveStates(Ingest.initStates(boot, col("doc_id"), col("text"), kw, k, depth, width),
        stateDir, 0L, buckets)
      Seq(d1, d2).zipWithIndex.foreach { case (dd, i) =>
        val (_, _, del) = Ingest.advanceOnceDelta(dd, Ingest.loadStates(s, stateDir)._2,
          col("doc_id"), col("text"), kw, k, depth, width)
        Ingest.saveStatesDelta(del, stateDir, i + 1L)
      }
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      def t(tag2: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        parts += s""""$tag2":${fmt((System.nanoTime() - t0) / 1e9)}"""
      }
      var st: Ingest.States = null
      t("load") { st = Ingest.loadStates(s, stateDir)._2 }
      var rep: org.apache.spark.sql.DataFrame = null
      var del: Ingest.StateDeltas = null
      t("advance_report") {
        val (r, _, dd) = Ingest.advanceOnceDelta(batch, st,
          col("doc_id"), col("text"), kw, k, depth, width)
        r.collect(); rep = r; del = dd
      }
      t("save_keepers_d") { del.keepers.write.mode("overwrite")
        .parquet(s"$stateDir/__p/keepers.d") }
      t("save_ng3_d") { del.ng3.write.mode("overwrite").parquet(s"$stateDir/__p/ng3.d") }
      t("save_ng8_d") { del.ng8.write.mode("overwrite").parquet(s"$stateDir/__p/ng8.d") }
      t("save_sigs_kmv_cms") {
        del.sigs.write.mode("overwrite").parquet(s"$stateDir/__p/sigs.d")
        del.kmv.write.mode("overwrite").parquet(s"$stateDir/__p/kmv")
        del.cms.write.mode("overwrite").parquet(s"$stateDir/__p/cms")
      }
      s""""$tag":{${parts.mkString(",")}}"""
    }
    val plain = run(None)
    val bucketed = run(Some(32))
    println(s"""{"probe":"bucket_chain","sf":"$dir",$plain,$bucketed}""")
    s.stop()
  }
}
