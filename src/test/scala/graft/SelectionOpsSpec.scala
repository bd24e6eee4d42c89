package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Stats, TextAnalysis => TA}

class SurprisalSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("surprisal is exact integer bit-length of inverse unigram probability") {
    val docs = Seq((1L, "a a a a"), (2L, "a a a b"), (3L, "c d a a")).toDF("doc_id", "text")
    // corpus: a=9, b=1, c=1, d=1, N=12 → bits(a)=floor(log2(12/9=1))=0,
    // bits(b|c|d)=floor(log2(12))=3
    val got = TA.surprisalScore(docs, $"doc_id", $"text")
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect()
    assert(got(0) == ((1L, 4L, 0L, 0L)))
    assert(got(1) == ((2L, 4L, 3L, 750000L)))
    assert(got(2) == ((3L, 4L, 6L, 1500000L)))
  }

  test("rare-vocabulary documents score above common-vocabulary ones on real data") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val scored = TA.surprisalScore(d, $"doc_id", $"text")
    assert(scored.filter($"mean_bits_ppm" < 0).count() == 0)
    // mean surprisal must vary across the corpus (not a constant score)
    assert(scored.select(countDistinct($"mean_bits_ppm")).as[Long].head() > 1)
  }
}

class CmsHeavyHittersSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("CMS estimates only over-count and never miss a true heavy hitter") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val occ = d.select(explode(Dedup.hashedNgramSeq(d, $"text", 1)).as("ng"))
    val tot = occ.count()
    val hitters = Stats.cmsHeavyHitters(occ, $"ng", 4, 256, 2, 100)
      .as[(Long, Long, Long)].collect()
    assert(hitters.nonEmpty)
    hitters.foreach { case (ng, est, cnt) => assert(est >= cnt, s"ng=$ng under-counted") }
    // no false negatives: every key with TRUE count >= threshold is reported
    val thresh = tot * 2 / 100
    val trueHeavy = occ.groupBy($"ng").agg(count(lit(1)).as("c"))
      .filter($"c" >= thresh).select($"ng").as[Long].collect().toSet
    val reported = hitters.map(_._1).toSet
    assert(trueHeavy.subsetOf(reported),
      s"missed ${trueHeavy.diff(reported).size} true heavy hitters")
  }
}

class EpochUpsampleSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("fractional epochs emit floor or ceil copies, deterministically, at ~the target rate") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val out = TA.epochUpsample(d, $"source", $"doc_id",
      Map("src0" -> ((5, 2)), "src1" -> ((3, 1))), 1, 1)
    val perDoc = out.groupBy($"stratum", $"doc_id").agg(max($"copy").as("n"))
      .as[(String, Long, Long)].collect()
    perDoc.foreach { case (st, id, n) =>
      st match {
        case "src0" => assert(n == 2L || n == 3L, s"doc $id: 2.5 epochs must emit 2 or 3, got $n")
        case "src1" => assert(n == 3L, s"doc $id")
        case _ => assert(n == 1L, s"doc $id")
      }
    }
    // determinism: a second run emits the identical multiset
    val again = TA.epochUpsample(d, $"source", $"doc_id",
      Map("src0" -> ((5, 2)), "src1" -> ((3, 1))), 1, 1)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }
}

class SplitAssignSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("near-duplicate pairs never straddle splits; singleton docs still get assigned") {
    val d = graft.sources.Tables.documents(spark, sfDir).select($"doc_id", $"text")
    // plant near-dup chains: copy (doc_id+10000) and drifted copy (+20000)
    val c = d
      .unionByName(d.filter(pmod($"doc_id", lit(3)) === 0)
        .select(($"doc_id" + 10000).as("doc_id"), $"text"))
      .unionByName(d.filter(pmod($"doc_id", lit(3)) === 0)
        .select(($"doc_id" + 20000).as("doc_id"),
          concat($"text", lit(" tail marker words")).as("text")))
    val assigned = Dedup.splitAssign(c, $"doc_id", $"text", 10, 10)
    val bySplit = assigned.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0L) > 0L)
    // every doc assigned exactly once
    assert(assigned.count() == c.count())
    // leakage check: both endpoints of every near-dup pair share a split
    val pairs = Dedup.minHashLshPairs(c, $"doc_id", $"text", 3, 4, 4, 0.5)
      .select($"id_a", $"id_b")
    val sp = assigned.select($"doc_id", $"split")
    val crossing = pairs
      .join(sp.select($"doc_id".as("id_a"), $"split".as("sa")), Seq("id_a"))
      .join(sp.select($"doc_id".as("id_b"), $"split".as("sb")), Seq("id_b"))
      .filter($"sa" =!= $"sb")
    assert(crossing.count() == 0, "near-dup pair straddles splits — leakage")
  }
}

class DistributionDriftSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("drift is exact per-bucket ppm delta; empty windows guard to 0 instead of dividing by zero") {
    val rows = Seq(
      // grp x: window A values {10, 60} -> buckets 0,1; window B {10, 20} -> bucket 0 twice
      ("x", false, 10.0), ("x", false, 60.0), ("x", true, 10.0), ("x", true, 20.0),
      // grp y: only window A — tot_b = 0 exercises the division guard
      ("y", false, 10.0)
    ).toDF("g", "b", "v")
    val out = Stats.distributionDrift(rows, $"g", $"b", $"v", 50, 9)
      .orderBy($"grp", $"bucket")
      .select($"grp", $"bucket", $"n_a", $"n_b", $"ppm_a", $"ppm_b", $"drift_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("x", 0L, 1L, 2L, 500000L, 1000000L, 500000L),
      ("x", 1L, 1L, 0L, 500000L, 0L, 500000L),
      ("y", 0L, 1L, 0L, 1000000L, 0L, 1000000L)))
  }
}

class EmbeddingOutlierSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("per-cell p10 flags the garbled vector; a uniform cell flags nothing (strict <)") {
    // cell A: seven copies of e1 + one garbled vector (id 7); cell B:
    // eight IDENTICAL copies of e2 — equal cosines make p10 equal the
    // value itself, and the STRICT < means a perfectly uniform cell
    // never flags anything
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val odd = Array(0f, 0f, 1f, 0f)
    val rows = (0L to 6L).map(i => (i, e1)) ++ Seq((7L, odd)) ++ (8L to 15L).map(i => (i, e2))
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.embeddingOutliers(df, 8, 1, 0.1)
      .orderBy($"vec_id")
      .select($"vec_id", $"cent_id")
      .as[(Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(7L))
    assert(out.head._2 == 0L)
  }
}
