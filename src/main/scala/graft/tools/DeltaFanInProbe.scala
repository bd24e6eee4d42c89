package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Ingest
import graft.sources.Tables

/** Measures the delta-chain READ FAN-IN cost curve so
  * `deltaRebaseEvery` ships with a measured default instead of a bare
  * knob (VERDICT r13 #3): bootstraps from the first half of documents,
  * then runs 16 equal id-range batch advances WITHOUT ever rebasing —
  * the chain grows one delta per advance, so the per-advance wall
  * (load → advance → report → delta save) traced against version IS
  * the fan-in curve. Also times one full rebase save at the end (the
  * cost a rebase amortizes against). Run per layout: the plain path
  * pays a widening multi-dir union scan; the bucketed-base layered
  * path pays one extra shuffle-hash join per layer. Args:
  * [sfDir] [nAdvances=16] [buckets? plain|bucketed|both=both].
  */
object DeltaFanInProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val n = args.lift(1).map(_.toInt).getOrElse(16)
    val mode = args.lift(2).getOrElse("both")
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    val (kw, k, depth, width) = (12, 64, 4, 256)
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    // id-range slices: slice 0 (half the corpus) bootstraps, 1..n advance
    val qs = (1 to n).map(i => 0.5 + 0.5 * i / n)
    val bounds = d.stat.approxQuantile("doc_id", (0.5 +: qs).toArray, 0.001).map(_.toLong)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    def run(buckets: Option[Int]): String = {
      val tag = buckets.fold("plain")(_ => "bucketed")
      val stateDir = "file://" +
        java.nio.file.Files.createTempDirectory(s"graft_fanin_$tag").toString
      Ingest.saveStates(
        Ingest.initStates(d.filter(col("doc_id") <= bounds(0)),
          col("doc_id"), col("text"), kw, k, depth, width),
        stateDir, 0L, buckets)
      val walls = (1 to n).map { i =>
        val batch = d.filter(col("doc_id") > bounds(i - 1) && col("doc_id") <= bounds(i))
        val t0 = System.nanoTime()
        val (v, st) = Ingest.loadStates(s, stateDir)
        val (report, _, dd) = Ingest.advanceOnceDelta(batch, st,
          col("doc_id"), col("text"), kw, k, depth, width)
        report.collect()
        Ingest.saveStatesDelta(dd, stateDir, v + 1)
        (System.nanoTime() - t0) / 1e9
      }
      // the cost a rebase pays: one full save of the assembled chain
      val (_, fin) = Ingest.loadStates(s, stateDir)
      val tR = System.nanoTime()
      Ingest.saveStates(fin, stateDir, n + 1L, buckets)
      val rebase = (System.nanoTime() - tR) / 1e9
      s""""$tag":{"advance_sec":[${walls.map(fmt).mkString(",")}],"rebase_sec":${fmt(rebase)}}"""
    }
    val parts = mode match {
      case "plain" => Seq(run(None))
      case "bucketed" => Seq(run(Some(32)))
      case _ => Seq(run(None), run(Some(32)))
    }
    println(s"""{"probe":"delta_fanin","sf":"$dir","n":$n,${parts.mkString(",")}}""")
    s.stop()
  }
}
