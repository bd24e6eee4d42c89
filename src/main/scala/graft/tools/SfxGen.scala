// Generates a factor-× replica of an SF dir under /tmp (default: 10×
// sf0.1 ≈ "sf1") for the scale-crossover bench: run `graft.Bench` with
// SPARK_GRAFT_SF_DIR=<out> and `tools/duckbench.py <out> <verifyDir>`
// on the same files, and compare the ratio against sf0.1 — the Spark
// fixed per-query overhead (~0.3 s session/plan cost) amortizes with
// scale while DuckDB's runtime grows linearly, so the ratio should
// shrink (PLANS.md "crossover").
//
// Replication is semantics-preserving per replica:
//  - facts get disjoint id ranges per replica (key cardinality scales
//    with data, like a real corpus);
//  - documents text is word-tagged per replica (every shingle differs
//    across replicas) so near-dup pair counts scale LINEARLY — verbatim
//    copies would make every doc a 10-way cross-replica duplicate and
//    the pair count quadratic, which is a different workload;
//  - embeddings get deterministic per-replica noise for the same
//    reason (cross-replica cosine ≪ the 0.99 near-dup threshold);
//  - events.ts is re-exported at microsecond precision (all query
//    math is at ms floor in both engines, so nothing changes);
//  - dimension tables are copied verbatim (dims scale sublinearly).
//
//   sbt 'runMain graft.tools.SfxGen [baseDir] [outDir] [factor]'
package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.GraftSession

object SfxGen {

  // single parquet FILE per table (duckbench's read_parquet takes
  // files, and parquet row groups keep Spark scans parallel).
  // parquet.block.size pinned to 2 MB: the default 128 MB block
  // left these ~20 MB tables as ONE row group, which serializes
  // every engine's scan of the replica (Spark assigns row groups
  // to tasks; a single group = a single task no matter the split
  // size) — a layout artifact no real lake has, and exactly what
  // the r8 q13/q15 sf1 ratios tripped over. ~2 MB groups restore
  // the multi-group layout a 100 TB lake file actually has.
  private def writeOne(df: DataFrame, out: String, name: String): Unit = {
    val tmp = s"$out/__tmp_$name"
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", (2 * 1024 * 1024).toString)
      .parquet(tmp)
    val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$out/$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(tmp).listFiles().foreach(_.delete()); new java.io.File(tmp).delete()
    println(s"[sfx] $name.parquet written")
  }

  /** The embeddings replica alone (deterministic per-replica noise so
    * cross-replica cosine stays far below the near-dup threshold) —
    * callable from specs: AnnAutoSpec's sf1 recall gates need only
    * this table, and generating it takes seconds, so the spec
    * bootstraps it instead of self-canceling on a fresh checkout
    * (VERDICT r12 #3).
    */
  def replicateEmbeddings(spark: org.apache.spark.sql.SparkSession,
      base: String, out: String, factor: Int): Unit = {
    new java.io.File(out).mkdirs()
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    writeOne((0 until factor).map { k =>
      val e = if (k == 0) col("embedding")
        else zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => (x.cast("double") +
            (((col("vec_id") + i * 7 + k * 13) % 97).cast("double") - 48.0) * 0.01).cast("float"))
      emb.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"), e.as("embedding"), col("label"))
    }.reduce(_ unionByName _), out, "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local(32, "sfx-gen")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()

    def replicate(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => f(df, k)).reduce(_ unionByName _)

    // Tables.events normalizes whatever ts encoding the driver used
    // (long nanos, TIMESTAMP_NTZ micros, TIMESTAMP) to ts + ts_ns;
    // re-export at microsecond precision like the source data.
    val ev = graft.sources.Tables.events(spark, base)
    writeOne(replicate(ev) { (d, k) =>
      d.select(
        (col("event_id") + lit(k * 100000000L)).as("event_id"),
        timestamp_micros(expr("ts_ns div 1000")).as("ts"),
        (col("user_id") + lit(k * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }, out, "events")

    val docs = spark.read.parquet(s"$base/documents.parquet")
    writeOne(replicate(docs) { (d, k) =>
      val text = if (k == 0) col("text")
        else array_join(transform(split(col("text"), " "), w => concat(w, lit(s"~$k"))), " ")
      d.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"), text.as("text"),
        col("lang"), col("source"), col("n_chars"))
    }, out, "documents")

    replicateEmbeddings(spark, base, out, factor)

    Seq("lineitem", "orders").foreach { t =>
      val key = if (t == "lineitem") "l_orderkey" else "o_orderkey"
      val df = spark.read.parquet(s"$base/$t.parquet")
      writeOne(replicate(df)((d, k) => d.withColumn(key, col(key) + lit(k * 100000000L))), out, t)
    }

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$base/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[sfx] $t.parquet copied")
    }
    spark.stop()
  }
}
