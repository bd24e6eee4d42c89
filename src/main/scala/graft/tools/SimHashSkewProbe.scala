package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Diagnoses the signature gate's 143 s at sf10 (IngestAnatomyProbe):
  * is the (chunk, cv) banding join SKEWED (a few hot chunk-values own
  * the candidate volume → one straggler task) or uniformly huge
  * (volume itself is the cost)? Prints total candidate pairs, the
  * top-10 bucket products, and the skew share. Args: [sfDir].
  */
object SimHashSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val bound = d.stat.approxQuantile("doc_id", Array(0.75), 0.001)(0).toLong
    val nChunks = 4
    val width = (62 + nChunks - 1) / nChunks
    val mask = (1L << width) - 1
    def chunked(df: org.apache.spark.sql.DataFrame) =
      Dedup.simHashDf(df, col("doc_id"), col("text"))
        .select(col("sh"), explode(transform(sequence(lit(0), lit(nChunks - 1)),
          c => struct(c.as("chunk"),
            call_function("shiftright", col("sh"), c.cast("int") * width)
              .bitwiseAND(mask).as("cv")))).as("ck"))
        .select(col("ck.chunk"), col("ck.cv"))
        .groupBy(col("chunk"), col("cv")).agg(count(lit(1)).as("n"))
    val a = chunked(d.filter(col("doc_id") > bound))   // batch side
    val b = chunked(d.filter(col("doc_id") <= bound))  // state side
    val prod = a.join(b.withColumnRenamed("n", "m"), Seq("chunk", "cv"))
      .select(col("chunk"), col("cv"), (col("n") * col("m")).as("pairs"))
    val total = prod.agg(sum(col("pairs"))).collect()(0).getLong(0)
    val top = prod.orderBy(col("pairs").desc).limit(10).collect()
      .map(r => s"[${r.get(0)},${r.get(1)},${r.get(2)}]")
    val top10 = prod.orderBy(col("pairs").desc).limit(10)
      .agg(sum(col("pairs"))).collect()(0).getLong(0)
    println(s"""{"probe":"simhash_skew","sf":"$dir","total_pairs":$total,"top10_pairs":$top10,"top10_share":${top10.toDouble / total},"top":[${top.mkString(",")}]}""")
    s.stop()
  }
}
