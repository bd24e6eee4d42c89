package graft

import org.apache.spark.sql.functions._
import graft.functions.BoundedSetAgg
import graft.operators.Dedup

class BoundedSetAggSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("bounded set collects sorted distinct values and saturates at the cap smallest") {
    val rows = Seq((1L, 7L), (1L, 3L), (1L, 7L), (1L, 9L), (1L, 1L), // key 1: {1,3,7,9}
      (2L, 5L), // key 2: {5}
      (3L, 10L), (3L, 20L), (3L, 30L), (3L, 40L), (3L, 50L)) // key 3: {10..50}, overflows cap 4
      .toDF("k", "v").repartition(7) // force partial buffers + merge
    val got = rows.groupBy($"k").agg(BoundedSetAgg.boundedSet(4)($"v").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(1L, 3L, 7L, 9L)) // all 4 distinct, sorted, dupes dropped
    assert(got(2L) == Seq(5L))
    assert(got(3L) == Seq(10L, 20L, 30L, 40L)) // saturated: the 4 smallest of 5
  }

  test("cap = maxDf+1 makes size(ids) an exact df-cap test") {
    // 6 groups with df 1..6, cap 4: size <= 3 iff true df <= 3
    val rows = (1 to 6).flatMap(df => (1 to df).map(i => (df.toLong, i.toLong)))
    val got = rows.toDF("k", "v").repartition(5)
      .groupBy($"k").agg(BoundedSetAgg.boundedSet(4)($"v").as("ids"))
      .select($"k", size($"ids").as("n")).as[(Long, Int)].collect().toMap
    (1 to 6).foreach { df =>
      if (df <= 3) assert(got(df.toLong) == df, s"df=$df")
      else assert(got(df.toLong) == 4, s"df=$df must saturate")
    }
  }

  test("jaccard pairs from bounded buckets match a driver-side brute force") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").limit(60)
    val got = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", 3, 20, 0.2)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    // brute force over the same portable hashes
    val sets = docs.select($"doc_id", Dedup.hashedNgrams(docs, $"text", 3).as("ngs"))
      .as[(Long, Seq[Long])].collect().toMap
    val dfreq = sets.values.flatten.groupBy(identity).map { case (ng, o) => ng -> o.size }
    val rare = sets.map { case (id, ngs) => id -> ngs.filter(ng => dfreq(ng) <= 20).toSet }
    val ids = sets.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (rare(a) & rare(b)).size if inter > 0
      jac = inter.toDouble / (sets(a).size + sets(b).size - inter) if jac >= 0.2
    } yield ((a, b), jac)).toMap
    assert(got == expect, s"got ${got.size} pairs, expected ${expect.size}")
  }
}
