package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis => TA}
import graft.sources.Tables

/** Contracts for the round-7 tail operators — boilerplate strip,
  * n-gram novelty, target affinity — on hand-built inputs where the
  * expected answer is derivable by eye.
  */
class NoveltyBoilerAffinitySpec extends SparkSpecBase {

  test("boilerplateStrip flags repeated per-source prefixes, not cross-source or rare ones") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "s1", "hdr one two three a b c"),
      (2L, "s1", "hdr one two three d e"),
      (3L, "s1", "hdr one two three f"),
      (4L, "s1", "other start words here g"),
      (5L, "s2", "hdr one two three h i"), // same prefix, different source → count 1
      (6L, "s2", "tiny doc")               // shorter than the prefix → excluded
    ).toDF("doc_id", "source", "text")
    val out = TA.boilerplateStrip(docs, col("doc_id"), col("source"), col("text"), 4, 3L)
      .select("doc_id", "source", "n_docs", "n_words", "kept_words")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, "s1", 3L, 7L, 3L), (2L, "s1", 3L, 6L, 2L), (3L, "s1", 3L, 5L, 1L)))
  }

  test("ngramNovelty: first introducer scores 1e6, verbatim copy scores 0") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"), // 3 trigrams, all first here
      (2L, "w1 w2 w3 w4 w5"), // verbatim copy → 0
      (3L, "w3 w4 w5 w6 w7")  // 3 trigrams: w3w4w5 seen (doc1), w4w5w6/w5w6w7 new → 2/3
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(docs, col("doc_id"), col("text"), 3)
      .select("doc_id", "nn", "novel", "novelty_ppm")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 3L, 1000000L), (2L, 3L, 0L, 0L), (3L, 3L, 2L, 666666L)))
  }

  test("incremental novelty equals full novelty restricted to batch docs") {
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val batch = d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" graft extra marker")).as("text")))
    val state = Dedup.ngramFirstDocs(d, col("doc_id"), col("text"), 3)
    val incr = Dedup.ngramNoveltyIncremental(batch, state, col("doc_id"), col("text"), 3)
      .select("doc_id", "nn", "novel", "novelty_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // full recompute over corpus ∪ batch, restricted to batch docs —
    // equal because batch ids sort after every corpus id
    val full = Dedup.ngramNovelty(d.unionByName(batch), col("doc_id"), col("text"), 3)
      .filter(col("doc_id") >= 10000)
      .select("doc_id", "nn", "novel", "novelty_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(incr.nonEmpty && incr == full)
  }

  test("targetAffinity: target-vocabulary docs outscore disjoint-vocabulary docs") {
    val sp = spark
    import sp.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "zeta eta theta")).toDF("doc_id", "text")
    val out = TA.targetAffinity(corpus, col("doc_id") === 1, col("doc_id"), col("text"))
      .select("doc_id", "t_mass", "r_mass", "affinity_ppm")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // df_r: alpha 2, beta 2, gamma 1, delta 1, zeta/eta/theta 1
    // df_t: alpha 1, beta 1, gamma 1
    assert(out == Seq(
      (1L, 3L, 5L, 600000L),  // (1+1+1) / (2+2+1)
      (2L, 2L, 5L, 400000L),  // (1+1+0) / (2+2+1)
      (3L, 0L, 3L, 0L)))      // disjoint vocab
  }
}
