package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Ingest
import graft.sources.Tables

/** Measures what delta-state persistence is worth on the composed
  * advance loop (the r13 scale fix: full saveStates rewrites the
  * O(corpus) state family every version — the sf10 backfill's
  * per-advance wall grew 77.7 → 127.4 s as state accumulated — while
  * saveStatesDelta writes O(batch)). Splits documents into an
  * id-ORDERED bootstrap + three id-range "lake partition" batches
  * (the family's arrival contract, under which delta ≡ full), runs
  * the same backfill in both regimes, and reports per-advance wall,
  * bytes written per version, and cross-regime table counts of the
  * final loaded states. Args: [sfDir].
  */
object IngestDeltaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    val (kw, k, depth, width) = (12, 64, 4, 256)
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val bounds = d.stat.approxQuantile("doc_id", Array(0.25, 0.5, 0.75), 0.001).map(_.toLong)
    def part(i: Int) = i match {
      case 0 => d.filter(col("doc_id") <= bounds(0))
      case 1 => d.filter(col("doc_id") > bounds(0) && col("doc_id") <= bounds(1))
      case 2 => d.filter(col("doc_id") > bounds(1) && col("doc_id") <= bounds(2))
      case _ => d.filter(col("doc_id") > bounds(2))
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fsOf(uri: String) = new org.apache.hadoop.fs.Path(uri)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def bytesOf(uri: String): Long = fsOf(uri)
      .getContentSummary(new org.apache.hadoop.fs.Path(uri)).getLength

    def run(delta: Boolean, buckets: Option[Int] = None): String = {
      val tag = (if (delta) "delta" else "full") + buckets.fold("")(_ => "_bucketed")
      val stateDir = "file://" +
        java.nio.file.Files.createTempDirectory(s"graft_deltaprobe_$tag").toString
      val tB0 = System.nanoTime()
      Ingest.saveStates(
        Ingest.initStates(part(0), col("doc_id"), col("text"), kw, k, depth, width),
        stateDir, 0L, buckets)
      val bootstrap = (System.nanoTime() - tB0) / 1e9
      val walls = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        val (v, st) = Ingest.loadStates(s, stateDir)
        if (delta) {
          val (report, _, dd) = Ingest.advanceOnceDelta(part(i), st,
            col("doc_id"), col("text"), kw, k, depth, width)
          report.collect()
          Ingest.saveStatesDelta(dd, stateDir, v + 1)
        } else {
          val (report, next) = Ingest.advanceOnce(part(i), st,
            col("doc_id"), col("text"), kw, k, depth, width)
          report.collect()
          Ingest.saveStates(next, stateDir, v + 1, buckets)
        }
        (System.nanoTime() - t0) / 1e9
      }
      val bytes = (0L to 3L).map(v => bytesOf(s"$stateDir/v=$v"))
      val (_, fin) = Ingest.loadStates(s, stateDir)
      val counts = Seq(fin.keepers, fin.sigs, fin.ng3, fin.ng8).map(_.count())
      s""""$tag":{"bootstrap_sec":${fmt(bootstrap)},""" +
        s""""advance_sec":[${walls.map(fmt).mkString(",")}],""" +
        s""""version_bytes":[${bytes.mkString(",")}],""" +
        s""""final_counts":[${counts.mkString(",")}]}"""
    }
    // full first, delta second, bucketed-base delta third; one warm pass
    // of the small bootstrap path only (full backfills at sf10 are
    // minutes — no min-of-2)
    val full = run(delta = false)
    val del = run(delta = true)
    val delB = run(delta = true, buckets = Some(32))
    println(s"""{"probe":"ingest_delta","sf":"$dir",$full,$del,$delB}""")
    s.stop()
  }
}
