package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Kmv}

/** The q127 composed-ingest chain contract on a planted corpus: each
  * ingest class is consumed by the gate built for it — exact copies die
  * at the chunk-keeper gate, near copies are caught by the signature
  * gate exactly when their brute-force simhash distance says so (the
  * banding gate is parity-checked against brute signatures, so the
  * assertion doesn't depend on which side of dist ≤ 3 the planted edit
  * lands), novel docs pass both gates and score full novelty. Plus the
  * two advance identities the chain leans on: keeper-state advance
  * covers exactly the distinct chunk hashes of corpus ∪ batch, and the
  * KMV advance equals the sketch of the union (mergeability).
  */
class IngestAdvanceSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  // 8 corpus docs, 24 words each, drawn from a 10-word vocabulary with
  // doc-specific phase (repeats concentrate the simhash bit sums, like
  // real text); batch plants the three ingest classes
  private def word(i: Int, j: Int) = s"w${(i * 7 + j * 3) % 10}"
  private def docText(i: Int) = (0 until 24).map(j => word(i, j)).mkString(" ")
  private val corpus = (0 until 8).map(i => (i.toLong, docText(i))).toDF("doc_id", "text")
  private val exactCopy = (101L, docText(1))
  private val nearCopy = (102L, docText(2) + " qq qq qq")
  private val novel = (103L, (0 until 24).map(j => s"nv103_$j").mkString(" "))
  private val batch = Seq(exactCopy, nearCopy, novel).toDF("doc_id", "text")

  test("chunk gate: exact copies die, near/novel survive with their novel chunks") {
    val keepers = Dedup.chunkKeepers(corpus, col("doc_id"), col("text"), 12)
    val s1 = Dedup.chunkDedupIncremental(batch, keepers, col("doc_id"), col("text"), 12)
      .select(col("doc_id"), col("n_kept")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!s1.contains(101L), "exact copy must die at the chunk gate")
    assert(s1(102L) == 1L, "near copy keeps only its appended-marker chunk")
    assert(s1(103L) == 2L, "novel doc keeps both of its chunks")
  }

  test("signature gate ≡ brute simhash distance on the chunk survivors") {
    val corpusSigs = Dedup.simHashDf(corpus, col("doc_id"), col("text"))
    val s1docs = Seq(nearCopy, novel).toDF("doc_id", "text")
    val flagged = Dedup.simHashPairsIncremental(corpusSigs, s1docs,
        col("doc_id"), col("text"), maxDist = 3, nChunks = 4)
      .select(col("id_new")).distinct().collect().map(_.getLong(0)).toSet
    // brute truth: pair every survivor signature with every corpus one
    val cs = corpusSigs.collect().map(r => r.getLong(1))
    val bs = Dedup.simHashDf(s1docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = bs.filter { case (_, sh) =>
      cs.exists(c => java.lang.Long.bitCount(sh ^ c) <= 3) }.map(_._1).toSet
    assert(flagged == brute,
      "banded incremental gate must flag exactly the brute-distance near-dups")
    assert(!brute.contains(103L), "novel doc must be far from every corpus signature")
  }

  test("novel survivors score full novelty against the corpus ngram state") {
    val state = Dedup.ngramFirstDocs(corpus, col("doc_id"), col("text"), 3)
    val nov = Dedup.ngramNoveltyIncremental(Seq(novel).toDF("doc_id", "text"), state,
        col("doc_id"), col("text"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(nov(103L) == 1000000L, "every 3-gram of the novel doc is a first introduction")
  }

  test("keeper advance covers exactly the distinct chunk hashes of corpus ∪ batch") {
    val keepers = Dedup.chunkKeepers(corpus, col("doc_id"), col("text"), 12)
    val advanced = Dedup.chunkKeepersMerged(keepers, batch, col("doc_id"), col("text"), 12)
    val unionKeepers = Dedup.chunkKeepers(corpus.unionByName(batch),
      col("doc_id"), col("text"), 12)
    assert(advanced.count() == unionKeepers.count())
    assert(advanced.select(col("h")).except(unionKeepers.select(col("h"))).isEmpty)
  }

  test("KMV advance ≡ sketch of the union (the identity the vocab counter rides on)") {
    def tok(f: org.apache.spark.sql.DataFrame) = {
      val t = f.select(explode(split(col("text"), " ")).as("t"))
      t.select(Dedup.polyHash(t, col("t"), Dedup.PolyB1, Dedup.PolyP1).as("h"))
    }
    val k = 16
    val adv = Kmv.advance(Kmv.sketch(tok(corpus), Seq.empty, col("h"), k),
      tok(batch), Seq.empty, col("h"), k)
    val direct = Kmv.sketch(tok(corpus.unionByName(batch)), Seq.empty, col("h"), k)
    assert(adv.select(col("ks")).collect().map(_.getSeq[Long](0)).head ==
      direct.select(col("ks")).collect().map(_.getSeq[Long](0)).head)
  }
}
