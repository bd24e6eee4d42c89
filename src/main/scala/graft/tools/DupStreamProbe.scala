package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Dedup, DupState}
import graft.streaming.EventStream

/** Per-batch THROUGHPUT of the dup-cluster streaming sink
  * ([[EventStream.dupClusterStream]]), plus a final parity check: the
  * corpus is replicated ×factor (the DupStateProbe layout, stride 1e8
  * so sf1-replica inputs whose own ids span ~[0, 1e7) never collide),
  * the state bootstrapped from it, then `nBatches` equal micro-batches
  * run through the full sink — load → advance → delta save (rebase on
  * cadence) → retention. `novelPct` sets the batch composition:
  * 0 = every doc a near-dup copy of a replica-0 doc (the WORST case —
  * every doc generates cross-state pairs and merges); 90 = the
  * typical daily regime (mostly novel synthetic docs that sail
  * through candidate generation with no pairs, a near-dup minority).
  * The final reloaded assignment is compared against a from-scratch
  * dedupClusters over everything. Args:
  * [sfDir] [factor=10] [nBatches=4] [rebaseEvery=4] [novelPct=0].
  */
object DupStreamProbe {

  final case class StreamDoc(doc_id: Long, text: String)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val n = args.lift(2).map(_.toInt).getOrElse(4)
    val rebase = args.lift(3).map(_.toInt).getOrElse(4)
    val novelPct = args.lift(4).map(_.toInt).getOrElse(0)
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    val d0 = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = (0 until factor).map { r =>
      d0.select((col("doc_id") + lit(r * 100000000L)).as("doc_id"),
        concat(lit(s"r$r "), col("text")).as("text"))
    }.reduce(_ unionByName _)
    // batch i: replica-0 docs with doc_id % n == i at disjoint fresh
    // ids far above any replica — the first `novelPct`% as synthetic
    // novel token streams (no pairs anywhere), the rest near-dup copies
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

    val dir = java.nio.file.Files.createTempDirectory("graft_dupstream").toString
    val tB = System.nanoTime()
    DupState.save(DupState.init(corpus, col("doc_id"), col("text")), dir, 0L)
    val bootstrap = (System.nanoTime() - tB) / 1e9

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val mem = MemoryStream[StreamDoc](s)
    val q = EventStream.dupClusterStream(mem.toDF(), dir,
      rebaseEvery = Some(rebase), keepLast = Some(math.max(2, rebase * 2))).start()
    val walls = try batches.map { b =>
      val t0 = System.nanoTime()
      mem.addData(b)
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    } finally q.stop()

    val (vHead, fin) = DupState.load(s, dir)
    val streamed = batches.flatten.toSeq.toDF("doc_id", "text")
    val scratch = Dedup.dedupClusters(corpus.unionByName(streamed),
      col("doc_id"), col("text"))
    val got = fin.comp
    val diff = got.exceptAll(scratch).count() + scratch.exceptAll(got).count()
    val nDocs = batches.map(_.size.toLong)
    println(s"""{"probe":"dup_stream_tp","sf":"$sfDir","factor":$factor,"n":$n,""" +
      s""""rebase_every":$rebase,"novel_pct":$novelPct,"bootstrap_sec":${fmt(bootstrap)},""" +
      s""""batch_docs":[${nDocs.mkString(",")}],""" +
      s""""batch_sec":[${walls.map(fmt).mkString(",")}],""" +
      s""""docs_per_sec":[${walls.zip(nDocs).map { case (w, c) => fmt(c / w) }.mkString(",")}],""" +
      s""""head_version":$vHead,"parity_diff":$diff}""")
    s.stop()
  }
}
