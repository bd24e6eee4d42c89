package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Dedup, DupState, Ingest}
import graft.streaming.EventStream

/** Per-batch THROUGHPUT of the composed two-family sink
  * ([[EventStream.dailyCycleStream]]) against the sum of its parts:
  * the operational question is whether one lockstep driver costs
  * ingest-sink + dup-sink, or less (shared session/listing floors,
  * one trigger). Same corpus/batch construction as DupStreamProbe
  * (replica stride 1e8, batches at 1e10+): state bootstrapped from
  * corpus × factor for BOTH families, then `nBatches` micro-batches
  * of near-dup copies (with `novelPct`% synthetic novel) run through
  * the composed sink — load → both advances → both saves (per-family
  * measured cadences) → report → both retentions. Ends with the same
  * from-scratch dup-parity check the single-family probe runs, plus
  * the ingest head's table counts. Args:
  * [sfDir] [factor=10] [nBatches=4] [novelPct=0].
  */
object CycleStreamProbe {

  final case class StreamDoc(doc_id: Long, text: String)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val n = args.lift(2).map(_.toInt).getOrElse(4)
    val novelPct = args.lift(3).map(_.toInt).getOrElse(0)
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    val d0 = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = (0 until factor).map { r =>
      d0.select((col("doc_id") + lit(r * 100000000L)).as("doc_id"),
        concat(lit(s"r$r "), col("text")).as("text"))
    }.reduce(_ unionByName _)
    val batches = (0 until n).map { i =>
      val slice = corpus
        .filter(col("doc_id") < 100000000L && pmod(col("doc_id"), lit(n)) === i)
        .select((col("doc_id") + lit((i + 1) * 10000000000L)).as("doc_id"), col("text"))
      val novel = pmod(col("doc_id"), lit(100)) < novelPct
      slice
        .select(col("doc_id"), when(novel, concat_ws(" ",
            transform(sequence(lit(1), lit(40)),
              j => concat(lit("nv"), col("doc_id").cast("string"), lit("_"),
                j.cast("string")))))
          .otherwise(concat(col("text"), lit(" graft extra marker"))).as("text"))
        .as[(Long, String)].collect().map { case (id, t) => StreamDoc(id, t) }.toSeq
    }

    val work = java.nio.file.Files.createTempDirectory("graft_cyclestream").toString
    val (ingDir, dupDir, repDir) = (s"$work/ing", s"$work/dup", s"$work/rep")
    val tB = System.nanoTime()
    Ingest.saveStates(Ingest.initStates(corpus, col("doc_id"), col("text")), ingDir, 0L,
      buckets = Some(graft.GraftSession.profileOf(s).lakeBuckets))
    DupState.save(DupState.init(corpus, col("doc_id"), col("text")), dupDir, 0L)
    val bootstrap = (System.nanoTime() - tB) / 1e9

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val mem = MemoryStream[StreamDoc](s)
    val q = EventStream.dailyCycleStream(mem.toDF(), ingDir, dupDir, repDir,
      keepLast = Some(EventStream.DupRebaseRecommended * 2),
      ingestRebaseEvery = Some(EventStream.IngestRebaseRecommended),
      dupRebaseEvery = Some(EventStream.DupRebaseRecommended)).start()
    val walls = try batches.map { b =>
      val t0 = System.nanoTime()
      mem.addData(b)
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    } finally q.stop()

    val (vIng, ist) = Ingest.loadStates(s, ingDir)
    val (vDup, fin) = DupState.load(s, dupDir)
    val streamed = batches.flatten.toSeq.toDF("doc_id", "text")
    val scratch = Dedup.dedupClusters(corpus.unionByName(streamed),
      col("doc_id"), col("text"))
    val diff = fin.comp.exceptAll(scratch).count() + scratch.exceptAll(fin.comp).count()
    val nDocs = batches.map(_.size.toLong)
    println(s"""{"probe":"cycle_stream_tp","sf":"$sfDir","factor":$factor,"n":$n,""" +
      s""""novel_pct":$novelPct,"bootstrap_sec":${fmt(bootstrap)},""" +
      s""""batch_docs":[${nDocs.mkString(",")}],""" +
      s""""batch_sec":[${walls.map(fmt).mkString(",")}],""" +
      s""""docs_per_sec":[${walls.zip(nDocs).map { case (w, c) => fmt(c / w) }.mkString(",")}],""" +
      s""""head_ingest":$vIng,"head_dup":$vDup,"keepers":${ist.keepers.count()},""" +
      s""""parity_diff":$diff}""")
    s.stop()
  }
}
