package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Ingest
import graft.sources.Tables

/** Measures what staging the survivor sets inside Ingest.advanceOnce is
  * worth (r11 VERDICT #1: the report + six state writes are SEVEN
  * downstream actions, and the unstaged operator re-ran both gate joins
  * under each one). Runs the FULL per-batch advance — load persisted
  * states, advance, report action, save all six next states — in both
  * regimes via the probe-only `stage` toggle, min-of-2 after a warm-up
  * of each, on the q127-planted batch shape. Args: [sfDir].
  */
object IngestStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
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
    val stateDir = "file://" +
      java.nio.file.Files.createTempDirectory("graft_stageprobe_state").toString
    Ingest.saveStates(Ingest.initStates(d, col("doc_id"), col("text")), stateDir, 0L)
    val outDir = "file://" +
      java.nio.file.Files.createTempDirectory("graft_stageprobe_out").toString
    def advance(stage: Boolean): Double = {
      val t0 = System.nanoTime()
      val (_, st) = Ingest.loadStates(s, stateDir)
      val (report, next) = Ingest.advanceOnceImpl(batch, st, col("doc_id"), col("text"),
        12, 64, 4, 256, stage = stage)
      report.collect()
      Ingest.saveStates(next, s"$outDir/stage=$stage", 1L)
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    advance(stage = false); advance(stage = true) // warm both paths
    val unstaged = (1 to 2).map(_ => advance(stage = false)).min
    val staged = (1 to 2).map(_ => advance(stage = true)).min
    println(s"""{"probe":"ingest_stage","sf":"$dir","unstaged_sec":${fmt(unstaged)},"staged_sec":${fmt(staged)},"speedup":${fmt(unstaged / staged)}}""")
    s.stop()
  }
}
