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
  * tables — in both regimes via the probe-only `stage` toggle,
  * min-of-2 after a warm-up of each. Args: [sfDir].
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
    def bootstrap(stage: Boolean): Double = {
      val t0 = System.nanoTime()
      val st = Ingest.initStatesImpl(d, col("doc_id"), col("text"),
        12, 64, 4, 256, stage = stage)
      Ingest.saveStates(st, s"$outDir/stage=$stage", 0L)
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    bootstrap(stage = false); bootstrap(stage = true) // warm both paths
    val unstaged = (1 to 2).map(_ => bootstrap(stage = false)).min
    val staged = (1 to 2).map(_ => bootstrap(stage = true)).min
    println(s"""{"probe":"init_stage","sf":"$dir","unstaged_sec":${fmt(unstaged)},"staged_sec":${fmt(staged)},"speedup":${fmt(unstaged / staged)}}""")
    s.stop()
  }
}
