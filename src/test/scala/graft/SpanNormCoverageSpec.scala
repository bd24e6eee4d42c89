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

  test("selfRepSpans marks later copies only — the owner doc keeps its text") {
    val sp = spark
    import sp.implicits._
    // doc 1 owns every 8-gram of the r-phrase; doc 2 embeds it mid-text
    // (positions 3..10 → one merged span); doc 3 repeats its OWN
    // z-phrase twice — doc 3 is that phrase's owner, so its internal
    // repeat is NOT marked (the keep unit is the first DOCUMENT)
    val docs = Seq(
      (1L, "r1 r2 r3 r4 r5 r6 r7 r8 x9"),
      (2L, "t1 t2 r1 r2 r3 r4 r5 r6 r7 r8 t3"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 y1 z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val spans = Dedup.selfRepSpans(docs, col("doc_id"), col("text"), 8)
      .orderBy("doc_id", "span_start")
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_grams")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq((2L, 3L, 10L, 8L, 1L)))
  }

  test("scrubSpans cuts span tokens, keeps the rest, and empties fully-spanned docs") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, "t1 a1 a2 a3 a4 a5 a6 a7 a8 t2"),
      (3L, "a1 a2 a3 a4 a5 a6 a7 a8")).toDF("doc_id", "text")
    val out = TextAnalysis.scrubSpans(docs,
        Dedup.selfRepSpans(docs, col("doc_id"), col("text"), 8),
        col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select("doc_id", "n_tokens_raw", "n_tokens_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 8L, 8L, "a1 a2 a3 a4 a5 a6 a7 a8"), // owner: untouched
      (2L, 10L, 2L, "t1 t2"),                  // embedded copy cut, tails joined
      (3L, 8L, 0L, "")))                       // exact duplicate vanishes
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

class DedupFunnelSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._
  import org.apache.spark.sql.functions._

  test("funnel stages chain (n_out(k) = n_in(k+1)) and each stage removes its planted family") {
    // 1/2: exact duplicates (stage 1) · 3/4: punctuation variants
    // (stage 2) · 5/6: near-verbatim duplicates of 1 (stage 3, the
    // est ≥ 0.75 screen) · 8/9: moderate-similarity pair (exact
    // J ≈ 0.6 but signature agreement below the 12/16 screen → only
    // the exact stage-4 pass removes it) · 7: clean singleton
    // survives everything
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val mod = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11 m12 m13 m14"
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, "p1 p2 p3 p4 p5"), (4L, "p1 , p2 p3 p4 p5 !!"),
      (5L, s"$base tailmark"), (6L, s"$base othertail"),
      (7L, "u1 u2 u3 u4 u5"),
      (8L, mod), (9L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11 z1 z2 z3")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.dedupFunnel(docs, $"doc_id", $"text")
      .orderBy($"stage")
      .select($"stage", $"n_in", $"n_removed", $"n_out")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq("1_exact", "2_canonical", "3_est_screen", "4_neardup"),
      s"stages: $out")
    // chaining invariant across all four stages
    assert(out.sliding(2).forall { case Seq(a, b) => a._4 == b._2 }, s"chain: $out")
    // arithmetic invariant: n_in - n_removed = n_out at every stage
    out.foreach { case (_, in, rem, o) => assert(in - rem == o) }
    assert(out(0) == ("1_exact", 9L, 1L, 8L))     // doc 2 gone
    assert(out(1) == ("2_canonical", 8L, 1L, 7L)) // doc 4 gone
    assert(out(2)._3 >= 1L, s"est screen removed nothing: $out") // 5/6 family
    assert(out(3)._3 >= 1L, s"exact stage removed nothing: $out") // 8/9 pair

    // adaptive bypass: an input below estScreenMinRows skips the
    // screen (stage-3 row present with n_removed = 0, both invariants
    // intact) and stage 4's exact clustering still removes the
    // near-dup families the screen would have caught early
    val byp = graft.operators.Dedup.dedupFunnel(docs, $"doc_id", $"text",
        estScreenMinRows = 1000000L)
      .orderBy($"stage")
      .select($"stage", $"n_in", $"n_removed", $"n_out")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(byp.map(_._1) == Seq("1_exact", "2_canonical", "3_est_screen", "4_neardup"))
    assert(byp.sliding(2).forall { case Seq(a, b) => a._4 == b._2 }, s"chain: $byp")
    byp.foreach { case (_, in, rem, o) => assert(in - rem == o) }
    assert(byp(2)._3 == 0L, s"bypassed screen still removed rows: $byp")
    assert(byp(3)._3 >= 2L, s"stage 4 didn't absorb the screen's work: $byp")
  }
}

class SelfRepIncrParitySpec extends SparkSpecBase {
  import TestSpark.spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Dedup

  test("incremental span surgery == full recompute restricted to batch docs (batch ids after corpus)") {
    val phrase = "s1 s2 s3 s4 s5 s6 s7 s8"
    val corpus = Seq(
      (1L, s"$phrase c9 c10"),
      (2L, "d1 d2 d3 d4 d5 d6 d7 d8 d9")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"b1 $phrase b2"),              // copies corpus phrase → cut
      (11L, "n1 n2 n3 n4 n5 n6 n7 n8 n9"),  // novel phrase, first in batch → kept
      (12L, "n1 n2 n3 n4 n5 n6 n7 n8 z9")   // repeats doc 11's batch-internal 8-gram → cut
    ).toDF("doc_id", "text")
    val state = Dedup.ngramFirstDocs(corpus, $"doc_id", $"text", 8)
    val incr = Dedup.selfRepSpansIncremental(batch, state, $"doc_id", $"text", 8)
      .orderBy($"doc_id", $"span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val full = Dedup.selfRepSpans(corpus.unionByName(batch), $"doc_id", $"text", 8)
      .filter($"doc_id" >= 10L)
      .orderBy($"doc_id", $"span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(incr == full)
    assert(incr.map(_._1).toSet == Set(10L, 12L)) // 11 untouched
  }
}
