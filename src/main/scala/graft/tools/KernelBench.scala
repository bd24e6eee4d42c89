// Per-kernel microbench: the cost of the interpreted fallback the
// r5 codegen name-collision silently caused. Each workload puts TWO
// instances of a kernel in ONE projection (the collision shape) and
// times it with whole-stage codegen on (default, post-freshName-fix)
// vs factoryMode=NO_CODEGEN (the interpreted mode those stages were
// silently dropped to before the fix). Warm min-of-2.
//   sbt 'runMain graft.tools.KernelBench [sfDir]'
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

object KernelBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "kernel-bench")
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    docs.persist(); docs.count()
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // replicate the embeddings 256x so the scan is long enough to time
    val embBig = (0 until 256).map(i => emb.withColumn("rep", lit(i)))
      .reduce(_ unionByName _)
    embBig.persist(); embBig.count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(f: => Unit): Double = { f; math.min(timed(f), timed(f)) }

    def bench(label: String, df: => DataFrame): Unit = {
      val on = minOf2(df.count())
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = minOf2(df.count())
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
      println(f"[kernel] $label%-22s codegen=$on%.2f s interpreted=$off%.2f s ratio=${off / on}%.1fx")
    }

    // the simhash staging shape: two poly-hashes per token in one
    // projection — the exact r5 collision case
    bench("polyhash x2 (tokens)", {
      docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
        .select(
          expr("graft_polyhash(t, 131, 2147483647)").as("h1"),
          expr("graft_polyhash(t, 137, 2147483629)").as("h2"))
        .filter(col("h1") + col("h2") =!= 0)
    })
    // the quality-feature scan: the r7 TextStats kernel vs the regex
    // stack it replaced (fallback forms written out so the comparison
    // holds even with the kernel registered)
    bench("text_stats kernel", {
      docs.select(element_at(call_function("graft_text_stats", col("text")), 2).as("w"),
          element_at(call_function("graft_text_stats", col("text")), 3).as("p"),
          element_at(call_function("graft_text_stats", col("text")), 4).as("s"))
        .filter(col("w") + col("p") + col("s") =!= 0)
    })
    // staged form: one kernel call materialized in a prior projection,
    // features as element_at over the staged array — measures whether
    // codegen CSE already merges the three sibling calls above or the
    // stage boundary is worth forcing in the catalog
    bench("text_stats staged", {
      docs.select(col("doc_id"), call_function("graft_text_stats", col("text")).as("st"))
        .select(element_at(col("st"), 2).as("w"),
          element_at(col("st"), 3).as("p"),
          element_at(col("st"), 4).as("s"))
        .filter(col("w") + col("p") + col("s") =!= 0)
    })
    bench("text_stats regex form", {
      docs.select(size(split(trim(col("text")), "\\s+")).as("w"),
          (length(col("text")) - length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", ""))).as("p"),
          size(expr("regexp_extract_all(text, '\\\\b(the|a|of|to|and|in|is)\\\\b', 0)")).as("s"))
        .filter(col("w") + col("p") + col("s") =!= 0)
    })
    // the ANN re-rank shape: signature + two cosines in one projection
    bench("rhsig+cosine x2 (emb)", {
      embBig.select(
          expr("graft_rhsig(embedding, 48)").as("sig"),
          expr("graft_cosine(embedding, embedding)").as("c1"),
          expr("graft_cosine(embedding, reverse(embedding))").as("c2"))
        .filter(col("sig") =!= 0 || col("c1") + col("c2") =!= 0.0)
    })
    spark.stop()
  }
}
