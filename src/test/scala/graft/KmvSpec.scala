package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Kmv}

/** The Kmv state operator's contracts on randomized data:
  * exact mergeability (advance ≡ sketch-of-union — the property that
  * lets q118's oracle replay the incremental path as a one-shot),
  * exactness below capacity, and the bounded-sketch shape.
  */
class KmvSpec extends SparkSpecBase {

  private val K = 16
  private val P = Dedup.PolyP1

  test("advance == sketch-of-union on randomized batches; estimate is exact below k") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    // groups of wildly different cardinality: some below k (exact
    // side), some far above (estimator side); values collide across
    // state/batch (the cross-day overlap advance must merge exactly)
    def rows(n: Int, tag: String) = Seq.fill(n) {
      val g = rnd.nextInt(4)
      val day = 1 + rnd.nextInt(3)
      (s"g$g", s"2024-01-0$day", rnd.nextInt(if (g < 2) 8 else 5000).toLong)
    }.toDF("grp", "day", "v").withColumn("tag", lit(tag))
    val state0Rows = rows(3000, "s")
    val batchRows = rows(1500, "b")
      // batch also introduces a NEW day per group
      .unionByName(rows(200, "b").withColumn("day", lit("2024-01-09")))

    def h(df: org.apache.spark.sql.DataFrame) =
      Dedup.polyHash(df, concat(col("v").cast("string"), lit("/t")), Dedup.PolyB1, P)

    val grain = Seq(col("grp"), col("day"))
    val state0 = Kmv.sketch(state0Rows.withColumn("h", h(state0Rows)), grain, col("h"), K)
    val advanced = Kmv.advance(state0,
      batchRows.withColumn("h", h(batchRows)), grain, col("h"), K)

    val union = state0Rows.unionByName(batchRows)
    val direct = Kmv.sketch(union.withColumn("h", h(union)), grain, col("h"), K)

    val a = advanced.select(col("grp"), col("day"), col("ks"))
      .as[(String, String, Seq[Long])].collect().map(t => (t._1, t._2) -> t._3).toMap
    val d = direct.select(col("grp"), col("day"), col("ks"))
      .as[(String, String, Seq[Long])].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(a == d, s"advance != sketch-of-union; diff keys: ${
      (a.keySet ++ d.keySet).filter(k => a.get(k) != d.get(k)).take(3)}")
    // bounded sketch: never more than k members, ascending, distinct
    a.values.foreach { ks =>
      assert(ks.size <= K && ks == ks.sorted && ks.distinct == ks)
    }

    // rollup estimate: exact (= true distinct hash count) below k
    val perGrp = Kmv.merge(advanced, Seq(col("grp")), K)
      .select(col("grp"), Kmv.estimate(col("ks"), K, P).as("est"))
      .as[(String, Long)].collect().toMap
    val truth = union.withColumn("h", h(union)).select(col("grp"), col("h")).distinct()
      .groupBy(col("grp")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    truth.foreach { case (g, n) =>
      if (n < K) assert(perGrp(g) == n, s"below-capacity group $g not exact: ${perGrp(g)} vs $n")
      else {
        // at capacity the (k-1)·P/kth estimator must land within the
        // standard ~1/√k band (generous 3σ bound for a seeded corpus)
        val err = math.abs(perGrp(g).toDouble / n - 1.0)
        assert(err < 3.0 / math.sqrt(K), s"group $g est ${perGrp(g)} vs true $n (err $err)")
      }
    }
  }
}
