package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe
import scala.collection.mutable

/** BPE merge training vs a plain-Scala reference implementation —
  * greedy leftmost-first apply, (count DESC, lhs ASC, rhs ASC)
  * tie-break — on hand-built and randomized corpora. The oracle gate
  * (q107/q108) proves the DuckDB replay; this pins the semantics.
  */
class BpeSpec extends SparkSpecBase {

  private def applyGreedy(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(wordFreq: Map[String, Long], m: Int)
      : (Map[String, Vector[String]], Seq[(Int, String, String, Long)]) = {
    var st: Map[String, Vector[String]] = wordFreq.map { case (w, _) => w -> w.map(_.toString).toVector }
    var merges = Seq.empty[(Int, String, String, Long)]
    for (r <- 1 to m) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((w, syms) <- st; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += wordFreq(w)
      if (counts.nonEmpty) {
        val (a, b) = counts.keys.toSeq.sortBy { case (a, b) => (-counts((a, b)), a, b) }.head
        merges = merges :+ ((r, a, b, counts((a, b))))
        st = st.map { case (w, syms) => w -> applyGreedy(syms, a, b) }
      }
    }
    (st, merges)
  }

  private def corpusToWordFreq(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.split(" ")).filter(_.nonEmpty).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }

  test("trainMerges matches the reference on the classic low/lower/newest corpus") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      "low low low low low lower lower newest newest",
      "newest newest newest newest widest widest widest")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.trainMerges(df, col("text"), 6)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val want = refTrain(corpusToWordFreq(docs), 6)._2
    assert(got == want)
  }

  test("greedy apply: same-symbol runs merge 1st/3rd/... (aaaa -> aa,aa; aaa -> aa,a)") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val (state, merges) = Bpe.train(df, col("text"), 1)
    val m = merges.as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq((1, "a", "a", 5L))) // 3 pairs in aaaa + 2 in aaa
    val syms = state.orderBy("w").select("w", "syms").as[(String, Seq[String])].collect().toMap
    assert(syms("aaaa") == Seq("aa", "aa"))
    assert(syms("aaa") == Seq("aa", "a"))
  }

  test("dry vocab: single-char words yield zero merges and an intact state") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val (state, merges) = Bpe.train(df, col("text"), 4)
    assert(merges.count() == 0L)
    val syms = state.orderBy("w").select("w", "freq").as[(String, Long)].collect().toSeq
    assert(syms == Seq(("a", 2L), ("b", 1L), ("c", 1L)))
  }

  test("mid-run dry: training stops early with the merges learned so far") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "aa")).toDF("doc_id", "text")
    val (state, merges) = Bpe.train(df, col("text"), 5)
    val m = merges.orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq((1, "a", "a", 1L))) // round 2 finds no pair -> stop
    val syms = state.select("syms").as[Seq[String]].collect().toSeq
    assert(syms == Seq(Seq("aa")))
  }

  test("trainDistributed matches train (incl. the dry-vocab early stop)") {
    val sp = spark
    import sp.implicits._
    val corpora = Seq(
      Seq("low low low low low lower lower newest newest",
        "newest newest newest newest widest widest widest"),
      Seq("a b c a"), // dry from round 1
      Seq("aa"))      // dry mid-run
    for (docs <- corpora) {
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val (s1, m1) = Bpe.train(df, col("text"), 4)
      val (s2, m2) = Bpe.trainDistributed(df, col("text"), 4)
      assert(m1.orderBy("rank").as[(Int, String, String, Long)].collect().toSeq ==
        m2.orderBy("rank").as[(Int, String, String, Long)].collect().toSeq)
      assert(s1.orderBy("w").as[(String, Long, Seq[String])].collect().toSeq ==
        s2.orderBy("w").as[(String, Long, Seq[String])].collect().toSeq)
    }
  }

  test("trainMerges matches the reference on randomized small-alphabet corpora") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val docs = Seq.fill(20) {
        Seq.fill(1 + rnd.nextInt(8)) {
          Seq.fill(1 + rnd.nextInt(6))("ab".charAt(rnd.nextInt(2))).mkString
        }.mkString(" ")
      }
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Bpe.trainMerges(df, col("text"), 5)
        .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
      val (refState, want) = refTrain(corpusToWordFreq(docs), 5)
      assert(got == want, s"trial $trial merges")
      val gotState = Bpe.train(df, col("text"), 5)._1
        .orderBy("w").select("w", "syms").as[(String, Seq[String])].collect()
        .map { case (w, s) => w -> s.toVector }.toMap
      assert(gotState == refState, s"trial $trial state")
    }
  }
}
