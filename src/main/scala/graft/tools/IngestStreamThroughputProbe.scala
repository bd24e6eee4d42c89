package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Ingest
import graft.streaming.EventStream

/** Per-batch THROUGHPUT of the streaming ingest sink in the delta
  * regime (VERDICT r13 #4: the streaming story had parity evidence but
  * no throughput number): bootstraps the state family from the first
  * half of documents, then feeds the rest as equal id-range
  * micro-batches through `ingestAdvanceStream(deltaRebaseEvery,
  * keepLast, stateBuckets)` over a MemoryStream, timing each batch
  * wall (trigger → state version committed + report written +
  * retention compacted). Args:
  * [sfDir] [nBatches=4] [rebaseEvery=4] [buckets? 0=plain].
  */
object IngestStreamThroughputProbe {

  final case class StreamDoc(doc_id: Long, text: String)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val n = args.lift(1).map(_.toInt).getOrElse(4)
    val rebase = args.lift(2).map(_.toInt).getOrElse(4)
    val buckets = args.lift(3).map(_.toInt).filter(_ > 0)
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = s.sqlContext

    val d = graft.sources.Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val qs = (1 to n).map(i => 0.5 + 0.5 * i / n)
    val bounds = d.stat.approxQuantile("doc_id", (0.5 +: qs).toArray, 0.001).map(_.toLong)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_streamtp").toString
    val reportDir = java.nio.file.Files.createTempDirectory("graft_streamtp_r").toString
    val tB = System.nanoTime()
    Ingest.saveStates(Ingest.initStates(d.filter(col("doc_id") <= bounds(0)),
      col("doc_id"), col("text")), stateDir, 0L, buckets)
    val bootstrap = (System.nanoTime() - tB) / 1e9

    val batches = (1 to n).map { i =>
      d.filter(col("doc_id") > bounds(i - 1) && col("doc_id") <= bounds(i))
        .as[(Long, String)].collect().map { case (id, t) => StreamDoc(id, t) }.toSeq
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val mem = MemoryStream[StreamDoc]
    val q = EventStream.ingestAdvanceStream(mem.toDF(), stateDir, reportDir,
      keepLast = Some(math.max(2, rebase * 2)),
      deltaRebaseEvery = Some(rebase), stateBuckets = buckets).start()
    val walls = try batches.map { b =>
      val t0 = System.nanoTime()
      mem.addData(b)
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    } finally q.stop()
    val (vHead, fin) = Ingest.loadStates(s, stateDir)
    val counts = Seq(fin.keepers, fin.sigs, fin.ng3, fin.ng8).map(_.count())
    val nDocs = batches.map(_.size.toLong)
    println(s"""{"probe":"ingest_stream_tp","sf":"$dir","n":$n,"rebase_every":$rebase,""" +
      s""""buckets":${buckets.getOrElse(0)},"bootstrap_sec":${fmt(bootstrap)},""" +
      s""""batch_docs":[${nDocs.mkString(",")}],""" +
      s""""batch_sec":[${walls.map(fmt).mkString(",")}],""" +
      s""""docs_per_sec":[${walls.zip(nDocs).map { case (w, c) => fmt(c / w) }.mkString(",")}],""" +
      s""""head_version":$vHead,"final_counts":[${counts.mkString(",")}]}""")
    s.stop()
  }
}
