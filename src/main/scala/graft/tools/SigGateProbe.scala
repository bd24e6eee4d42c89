package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Ingest}
import graft.sources.Tables

/** Sub-stage timing of the signature gate at the anatomy probe's
  * shape: batch sig computation, hot-cell counting, and the banded
  * join at several salt factors — attributes gate2's 143-152 s
  * (IngestAnatomyProbe) to sig hashing vs candidate verify vs salt
  * spread. Args: [sfDir].
  */
object SigGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val bound = d.stat.approxQuantile("doc_id", Array(0.75), 0.001)(0).toLong
    val corpus = d.filter(col("doc_id") <= bound)
    val batch = Dedup.stageEager(d.filter(col("doc_id") > bound))
    val sigs = Dedup.simHashDf(corpus, col("doc_id"), col("text"))
    val sigDir = "file://" +
      java.nio.file.Files.createTempDirectory("graft_siggate").toString
    sigs.write.parquet(s"$sigDir/sigs")
    val st = s.read.parquet(s"$sigDir/sigs")
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timeIt(tag: String)(f: => Unit): String = {
      val t0 = System.nanoTime(); f
      val r = s""""$tag":${fmt((System.nanoTime() - t0) / 1e9)}"""
      println(s"[siggate] $r")
      r
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    out += timeIt("batch_sigs") {
      Dedup.simHashDf(batch, col("doc_id"), col("text")).count()
    }
    var single = -1L
    out += timeIt("gate_single_chunk") {
      single = Dedup.simHashPairsIncremental(st, batch, col("doc_id"), col("text"), 3, 4)
        .select(col("id_new")).distinct().count()
    }
    var bandedN = -1L
    Seq(2, 3, 4).foreach { r =>
      out += timeIt(s"gate_bands_r$r") {
        bandedN = Dedup.simHashPairsIncrementalBanded(st, batch, col("doc_id"), col("text"), 3, r)
          .select(col("id_new")).distinct().count()
        assert(bandedN == single, s"banded r=$r gate hits $bandedN != $single")
      }
    }
    out += s""""gate_hits_single":$single,"gate_hits_banded":$bandedN"""
    println(s"""{"probe":"sig_gate","sf":"$dir",${out.mkString(",")}}""")
    s.stop()
  }
}
