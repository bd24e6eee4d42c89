package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Ingest
import graft.sources.Tables

/** Measures what staging the shared projections inside
  * Ingest.initStates is worth (r12 VERDICT missing #2: the bootstrap's
  * six state tables are six independent saveStates actions, each of
  * which re-scanned and re-tokenized the corpus — the advanceOnce
  * staging question applied to the one job that touches ALL the data).
  * Runs the FULL bootstrap — initStates + saveStates of all six
  * tables — under every toggle combination via the probe-only stage
  * flags, min-of-2 after a warm-up of each: `none` (six full
  * re-parses), `corpus` (normalized text staged), `tok` (the unigram
  * token table KMV + CMS share), `both`. Args: [sfDir].
  */
object InitStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.count() // warm footers
    val outDir = "file://" +
      java.nio.file.Files.createTempDirectory("graft_initprobe_out").toString
    def bootstrap(stageCorpus: Boolean, stageTok: Boolean): Double = {
      val t0 = System.nanoTime()
      val st = Ingest.initStatesImpl(d, col("doc_id"), col("text"),
        12, 64, 4, 256, stageCorpus = stageCorpus, stageTok = stageTok)
      Ingest.saveStates(st, s"$outDir/c=$stageCorpus,t=$stageTok", 0L)
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val combos = Seq(("none", false, false), ("corpus", true, false),
      ("tok", false, true), ("both", true, true))
    combos.foreach { case (_, c, t) => bootstrap(c, t) } // warm every path
    val timed = combos.map { case (name, c, t) =>
      name -> (1 to 2).map(_ => bootstrap(c, t)).min
    }
    val body = timed.map { case (n, v) => s"\"$n\":${fmt(v)}" }.mkString(",")
    val best = timed.minBy(_._2)
    println(s"""{"probe":"init_stage","sf":"$dir",$body,"best":"${best._1}","speedup_vs_none":${fmt(timed.head._2 / best._2)}}""")
    s.stop()
  }
}
