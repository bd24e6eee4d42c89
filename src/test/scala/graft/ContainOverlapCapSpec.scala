package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis => TA}
import graft.sources.Tables

/** Contracts for the round-7 operators — asymmetric containment
  * pairs, the per-domain quota cap, and the corpus-overlap sketch —
  * on hand-built inputs where the expected answer is derivable by
  * eye (the oracle gate proves cross-engine exactness separately).
  */
class ContainOverlapCapSpec extends SparkSpecBase {

  test("containment finds a prefix snippet at ppm 1e6 where Jaccard stays under threshold") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"), // 10 distinct trigrams
      (2L, "w1 w2 w3 w4 w5 w6"),                      // prefix: 4 trigrams, all in doc 1
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8")                 // unrelated
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramContainmentPairs(docs, col("doc_id"), col("text"), 3, 20, 800000L)
      .select("id_contained", "id_container", "inter", "nn_contained", "cont_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the snippet (fewer trigrams) is the contained side even though
    // its id is the larger of the pair ordering's (id_a, id_b)
    assert(pairs == Seq((2L, 1L, 4L, 4L, 1000000L)))
    // the same pair under symmetric Jaccard: 4 / (10 + 4 - 4) = 0.4 —
    // below any near-dup threshold; containment is the only lens that
    // sees the subset relation
    val j = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 20, 0.0)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .select("jaccard").as[Double].collect()
    assert(j.length == 1 && math.abs(j.head - 0.4) < 1e-12)
  }

  test("containment estimator catches the subset pair the exact path catches, no re-join") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, "w1 w2 w3 w4 w5 w6"), // prefix ⊂ doc 1
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8")
    ).toDF("doc_id", "text")
    val est = Dedup.containmentEstPairs(docs, col("doc_id"), col("text"), 3, 16, 1, 600000L)
      .select("id_contained", "id_container", "cont_est_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    // the subset pair must survive the estimator gate with the right
    // direction; a perfect-subset's signature agreement is high but the
    // estimate is coarse (16 seeds), so only the direction and gate are
    // pinned, not the exact ppm
    assert(est.map(e => (e._1, e._2)) == Seq((2L, 1L)))
    assert(est.head._3 >= 600000L)
  }

  test("containment ties (equal ngram counts) keep the smaller id as contained") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (4L, "a1 a2 a3 a4 a5"),
      (5L, "a1 a2 a3 a4 a5")).toDF("doc_id", "text")
    val pairs = Dedup.ngramContainmentPairs(docs, col("doc_id"), col("text"), 3, 20, 800000L)
      .select("id_contained", "id_container", "cont_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((4L, 5L, 1000000L)))
  }

  test("domainCap equals the window-rank formulation on real documents") {
    val d = Tables.documents(spark, sfDir)
    val scored = d.select(col("doc_id"), col("source"),
        length(col("text")).as("n_chars"), TA.wsTokenCount(col("text")).as("n_words"),
        TA.punctCount(col("text")).as("n_punct"), TA.stopHits(col("text")).as("n_stop"))
      .withColumn("q", TA.qualityScore(col("n_chars"), col("n_words"), col("n_punct"), col("n_stop")))
    val viaAgg = TA.domainCap(scored, col("source"), col("doc_id"), col("q"), 3)
      .select("source", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("source")).orderBy(col("q").desc, col("doc_id").asc)
    val viaWin = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3).select("source", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg == viaWin && viaAgg.nonEmpty)
    // cap respected per domain
    val perDomain = viaAgg.groupBy(_._1).map(_._2.size)
    assert(perDomain.forall(_ <= 3))
  }

  test("corpus overlap: identical groups estimate 1e6, disjoint groups near zero") {
    val sp = spark
    import sp.implicits._
    val mk = (g: String, off: Int) =>
      (0 until 5).map(i => (g, s"t${off + i} t${off + i + 1} t${off + i + 2} t${off + i + 3} t${off + i + 4}"))
    // A and B share every shingle; C is disjoint
    val docs = (mk("a", 0) ++ mk("b", 0) ++ mk("c", 1000)).toDF("grp", "text")
    val est = Dedup.corpusOverlapBySource(docs, col("grp"), col("text"), 3, 64)
      .select("grp_a", "grp_b", "n_perms", "n_agree", "est_ppm")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(est.size == 3) // C(3,2) unordered pairs
    assert(est(("a", "b"))._5 == 1000000L && est(("a", "b"))._3 == 64L)
    assert(est(("a", "c"))._5 < 200000L)
    assert(est(("b", "c"))._5 < 200000L)
  }
}
