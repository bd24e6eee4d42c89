package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.DupState

/** Measures the dup-cluster DELTA-CHAIN fan-in curve so
  * [[graft.streaming.EventStream.dupClusterStream]]'s `rebaseEvery`
  * ships with a cadence measured on ITS OWN cost function (VERDICT
  * r14 #3): the ingest family's DeltaFanInProbe default (Some(4)) was
  * borrowed by analogy, but the dup sink's read side is different —
  * comp merges latest-wins per doc over the layer count while the
  * bands/ngr/sizes legs are plain multi-dir unions. Bootstraps from
  * documents × factor, then runs `n` equal batches of fresh near-dup
  * docs through load → advance → saveDelta WITHOUT ever rebasing (the
  * per-advance wall vs version IS the fan-in curve), then times one
  * full rebase save(merged). Optimum L ≈ √(2·rebase/slope). Replica
  * stride 1e8 (the sf1 replica's own ids span ~[0, 1e7); a 1e6 stride
  * would collide and merge unrelated docs — the NgrLayoutProbe
  * lesson). Args: [sfDir] [factor=10] [nAdvances=16].
  */
object DupFanInProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val n = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = graft.GraftSession.local(32, "dup-fanin-probe")
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = (0 until factor).map { r =>
      d0.select((col("doc_id") + lit(r * 100000000L)).as("doc_id"),
        concat(lit(s"r$r "), col("text")).as("text"))
    }.reduce(_ unionByName _)
    val r0 = corpus.filter(col("doc_id") < 100000000L)

    val dir = "file:///tmp/graft_dup_fanin"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val tB = System.nanoTime()
    DupState.save(DupState.init(corpus, col("doc_id"), col("text")), dir, 0L)
    val bootstrap = (System.nanoTime() - tB) / 1e9

    // batch v: near-dup copies of replica-0 docs with doc_id % n == v-1,
    // ids offset into a disjoint far range per batch
    val walls = (1L to n.toLong).map { v =>
      val batch = r0.filter(pmod(col("doc_id"), lit(n)) === (v - 1))
        .select((col("doc_id") + lit(v * 10000000000L)).as("doc_id"),
          concat(col("text"), lit(" graft extra marker")).as("text"))
      val t0 = System.nanoTime()
      val st = DupState.load(spark, dir, upTo = v - 1)._2
      DupState.saveDelta(DupState.advance(st, batch, col("doc_id"), col("text")), dir, v)
      (System.nanoTime() - t0) / 1e9
    }
    // the cost a rebase amortizes: one full save of the assembled chain
    val (_, fin) = DupState.load(spark, dir)
    val lastBatch = r0.filter(pmod(col("doc_id"), lit(n)) === (n - 1))
      .select((col("doc_id") + lit(90000000000L)).as("doc_id"),
        concat(col("text"), lit(" graft extra marker")).as("text"))
    val dLast = DupState.advance(fin, lastBatch, col("doc_id"), col("text"))
    val tR = System.nanoTime()
    DupState.save(DupState.merged(fin, dLast), dir, n + 1L)
    val rebase = (System.nanoTime() - tR) / 1e9

    println(s"""{"probe":"dup_fanin","sf":"$sfDir","factor":$factor,"n":$n,""" +
      s""""bootstrap_sec":${fmt(bootstrap)},""" +
      s""""advance_sec":[${walls.map(fmt).mkString(",")}],""" +
      s""""rebase_sec":${fmt(rebase)}}""")
    spark.stop()
  }
}
