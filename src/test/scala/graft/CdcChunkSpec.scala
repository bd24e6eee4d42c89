package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Contracts for content-defined chunking: exact partition coverage
  * on real documents, and the property CDC exists for — boundary
  * re-synchronization after an insertion.
  */
class CdcChunkSpec extends SparkSpecBase {

  test("chunks partition every document exactly (coverage, no gaps, no overlap)") {
    val d = Tables.documents(spark, sfDir)
    val chunks = Dedup.cdcChunks(d, col("doc_id"), col("text"), 4, 16)
    val nw = d.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nw"))
    val agg = chunks.groupBy(col("doc_id"))
      .agg(sum(col("chunk_words")).as("covered"), min(col("start_word")).as("mn"),
        max(col("end_word")).as("mx"), count(lit(1)).as("nc"))
      .join(nw, Seq("doc_id"))
    // full coverage: sum of chunk widths == word count, spans [1, nw];
    // widths summing exactly while spanning [1, nw] rules out overlap
    assert(agg.filter(col("covered") =!= col("nw") || col("mn") =!= 1 ||
      col("mx") =!= col("nw")).count() == 0)
    assert(chunks.count() > d.count()) // expected ~nw/16 chunks per doc, >1 for most
  }

  test("an insertion shifts only local chunks: boundaries re-synchronize") {
    val sp = spark
    import sp.implicits._
    val base = (1 to 200).map(i => s"w${i * 7 % 97}x$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "inserted " + base)).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, col("doc_id"), col("text"), 4, 16)
      .select("doc_id", "start_word", "end_word").collect()
      .groupBy(_.getLong(0))
    val b1 = ch(1L).map(r => (r.getLong(1), r.getLong(2))).toSet
    val b2 = ch(2L).map(r => (r.getLong(1) - 1, r.getLong(2) - 1)).toSet // un-shift
    // every chunk of the original except (possibly) the first appears
    // shifted by exactly one in the edited doc — the edit is absorbed
    // by the first boundary, everything after re-synchronizes
    val tail1 = b1.filter(_._1 > 1)
    assert(tail1.nonEmpty && tail1.subsetOf(b2))
  }
}
