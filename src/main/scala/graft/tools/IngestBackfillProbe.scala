package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Ingest, Kmv}
import graft.sources.Tables

/** End-to-end mergeability of the composed advance (r11 VERDICT #7):
  * folds the documents table, split into a bootstrap plus three
  * "lake partition" batches, through Ingest.advanceOnce SEQUENTIALLY
  * via the versioned state round trip — exactly the backfill job the
  * Ingest scaladoc promises — and asserts the final persisted family
  * equals a from-scratch [[Ingest.initStates]] build:
  *
  *  - keepers over the FULL union, compared on the chunk-hash SET (the
  *    keeper contract records every seen chunk regardless of admission;
  *    the keep OWNER follows arrival order by contract — the state's
  *    owner wins on merge — so owner equality with a from-scratch
  *    min-build is only promised under id-order arrival, not here);
  *  - sigs/ng3/ng8/kmv/cms over bootstrap ∪ ADMITTED docs (the gated
  *    states advance with survivors only; the admitted set is read
  *    back from the final signature table, so the assertion is exact
  *    even when real cross-partition dups get gated).
  *
  * Args: [sfDir].
  */
object IngestBackfillProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    val (kw, k, depth, width) = (12, 64, 4, 256)
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def part(i: Int) = d.filter(pmod(col("doc_id"), lit(4)) === i)
    val stateDir = "file://" +
      java.nio.file.Files.createTempDirectory("graft_backfill_state").toString
    Ingest.saveStates(
      Ingest.initStates(part(0), col("doc_id"), col("text"), kw, k, depth, width),
      stateDir, 0L)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val (v, st) = Ingest.loadStates(s, stateDir)
      val (report, next) = Ingest.advanceOnce(part(i), st, col("doc_id"), col("text"),
        kw, k, depth, width)
      report.collect()
      Ingest.saveStates(next, stateDir, v + 1)
      val wall = (System.nanoTime() - t0) / 1e9
      println(String.format(java.util.Locale.ROOT,
        """{"probe":"ingest_backfill","advance":%d,"wall_sec":%.3f}""",
        Int.box(i), Double.box(wall)))
    }
    val (vFin, fin) = Ingest.loadStates(s, stateDir)
    // admitted set = gated-state membership, read back from the final sigs
    val admittedDocs = d.join(fin.sigs.select(col("doc_id")), Seq("doc_id"))
    val refGated = Ingest.initStates(admittedDocs, col("doc_id"), col("text"),
      kw, k, depth, width)
    val refKeepers = Ingest.initStates(d, col("doc_id"), col("text"),
      kw, k, depth, width).keepers
    def same(a: DataFrame, b: DataFrame, tag: String): Unit = {
      val ok = a.except(b).isEmpty && b.except(a).isEmpty
      println(s"""{"probe":"ingest_backfill","check":"$tag","ok":$ok}""")
      assert(ok, s"$tag diverged from the from-scratch build")
    }
    same(fin.keepers.select(col("h")), refKeepers.select(col("h")), "keepers_full_union_hashes")
    same(fin.sigs, refGated.sigs, "sigs_admitted")
    same(fin.ng3, refGated.ng3, "ng3_admitted")
    same(fin.ng8, refGated.ng8, "ng8_admitted")
    same(fin.cms, refGated.cms, "cms_admitted")
    def ks(df: DataFrame) = df.select(col("ks")).collect().map(_.getSeq[Long](0)).head
    val kmvOk = ks(fin.kmv) == ks(refGated.kmv)
    println(s"""{"probe":"ingest_backfill","check":"kmv_admitted","ok":$kmvOk}""")
    assert(kmvOk, "kmv diverged from the from-scratch build")
    val nAdm = admittedDocs.count(); val nAll = d.count()
    println(s"""{"probe":"ingest_backfill","sf":"$dir","versions":${vFin + 1},"docs":$nAll,"admitted":$nAdm,"ok":true}""")
    s.stop()
  }
}
