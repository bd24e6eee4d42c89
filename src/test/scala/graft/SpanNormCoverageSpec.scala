package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Unit semantics of the round-6 span/canonical/coverage operators —
  * the oracle gate proves cross-engine exactness; these pin the
  * CONTRACTS on hand-built inputs where the expected answer is
  * derivable by eye.
  */
class SpanNormCoverageSpec extends SparkSpecBase {

  test("contaminationSpans merges overlapping hits and keeps distant hits separate") {
    val sp = spark
    import sp.implicits._
    val bench = Seq((100L, "b1 b2 b3 b4 b5 b6 b7 b8 c1 c2 c3 c4 c5 c6 c7 c8")).toDF("doc_id", "text")
    // one bench 8-gram at position 4, another at 14; the gap (st 14 >
    // en 11 + 1) keeps them separate spans
    val train = Seq((1L,
      "t1 t2 t3 b1 b2 b3 b4 b5 b6 b7 b8 t4 t5 c1 c2 c3 c4 c5 c6 c7 c8 t6")).toDF("doc_id", "text")
    val spans = Dedup.contaminationSpans(train, bench, col("doc_id"), col("text"), 8)
      .orderBy("span_start")
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_grams")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq((1L, 4L, 11L, 8L, 1L), (1L, 14L, 21L, 8L, 1L)))
  }

  test("contaminationSpans fuses ADJACENT spans (gap 0) into one range") {
    val sp = spark
    import sp.implicits._
    // two separate bench docs — the train doc concatenates them, so the
    // matches land at positions 1 and 9 (en 8 + 1 = st 9: adjacent, no
    // overlap, and no straddling window matches)
    val bench = Seq(
      (100L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (101L, "d1 d2 d3 d4 d5 d6 d7 d8")).toDF("doc_id", "text")
    val train = Seq((1L, "a1 a2 a3 a4 a5 a6 a7 a8 d1 d2 d3 d4 d5 d6 d7 d8")).toDF("doc_id", "text")
    val spans = Dedup.contaminationSpans(train, bench, col("doc_id"), col("text"), 8)
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_grams")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq((1L, 1L, 16L, 16L, 2L)))
  }

  test("normalizeDedup collapses punctuation/whitespace variants and keeps the cleanest version") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "hello world foo"),
      (2L, "hello , world  foo !!"), // normalizes to doc 1's text; longer raw → loses
      (3L, "hello world bar")        // different canon → singleton
    ).toDF("doc_id", "text")
    val out = Dedup.normalizeDedup(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select("doc_id", "n_versions", "canon_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 3L), (3L, 1L, 3L)))
  }

  test("bigramCoverage counts occurrences (not distinct bigrams) with exact ppm") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b", "b a", "a b" — total 3
      (2L, "a b c")    // bigrams: "a b", "b c" — total 2
    ).toDF("doc_id", "text")
    // global counts: "a b" = 3 (covered at minCount=2), "b a" = 1, "b c" = 1
    val out = TextAnalysis.bigramCoverage(docs, col("doc_id"), col("text"), 2L)
      .orderBy("doc_id")
      .select("doc_id", "total_bg", "covered_bg", "score_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 2L, 666666L), (2L, 2L, 1L, 500000L)))
  }
}
