package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Stats}

/** The deterministic-HLL operator's contracts on randomized data:
  * exact register-level mergeability (max-merge of any partition of
  * the corpus ≡ direct registers — the property q120's oracle gates),
  * the bounded register-table shape (≤ m rows per group, reg within
  * [1, W+1]), duplicate-insensitivity (max is idempotent), and the
  * estimator's accuracy band across cardinalities spanning both the
  * linear-counting and raw branches.
  */
class HllSpec extends SparkSpecBase {

  private def wide(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column) = {
    def ph(b: Int, p: Long) = Dedup.polyHash(df, concat(c.cast("string"), lit("/t")), b, p)
    ph(Dedup.PolyB1, Dedup.PolyP1) * lit(Dedup.PolyP2) + ph(Dedup.PolyB2, Dedup.PolyP2)
  }

  test("register merge == direct; registers bounded; duplicates free; estimate in band") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(13)
    // per-group true cardinalities spanning LC (small) and raw
    // (hundreds-thousands) branches; every value duplicated 1-4x
    val cards = Map("g0" -> 9, "g1" -> 60, "g2" -> 700, "g3" -> 4000)
    val rows = cards.toSeq.flatMap { case (g, n) =>
      (1 to n).flatMap { v =>
        Seq.fill(1 + rnd.nextInt(4))((g, s"p${rnd.nextInt(8)}", v.toLong * 31 + g.hashCode % 7))
      }
    }
    val df = rows.toDF("grp", "part", "v")
    val withW = df.withColumn("wh", wide(df, col("v")))

    val direct = Stats.hllRegisters(withW, Seq(col("grp")), col("wh"))
    // (a) bounded shape
    val regRows = direct.select(col("grp"), col("idx"), col("reg"))
      .as[(String, Int, Int)].collect()
    assert(regRows.groupBy(_._1).forall(_._2.length <= Stats.HllM))
    assert(regRows.forall(r => r._3 >= 1 && r._3 <= Stats.HllW + 1))

    // (b) merge of an arbitrary partitioning (by `part`) == direct
    val perPart = Stats.hllRegisters(withW, Seq(col("grp"), col("part")), col("wh"))
    val merged = Stats.hllMerge(perPart, Seq(col("grp")))
      .select(col("grp"), col("idx"), col("reg")).as[(String, Int, Int)].collect()
    assert(merged.toSet == regRows.toSet, "max-merged registers != direct registers")

    // (c) duplicate-insensitivity: distinct input yields identical registers
    val dd = df.distinct()
    val dw = dd.withColumn("wh", wide(dd, col("v")))
    val dedupRegs = Stats.hllRegisters(dw, Seq(col("grp")), col("wh"))
      .select(col("grp"), col("idx"), col("reg")).as[(String, Int, Int)].collect()
    assert(dedupRegs.toSet == regRows.toSet, "duplicates changed registers")

    // (d) estimator band: generous 3σ (σ ≈ 1.04/√64 ≈ 13%) plus an
    // absolute floor for the tiny LC groups
    val est = Stats.hllEstimate(direct, Seq(col("grp")))
      .select(col("grp"), col("est")).as[(String, Long)].collect().toMap
    cards.foreach { case (g, n) =>
      val err = math.abs(est(g).toDouble - n)
      assert(err <= math.max(4.0, 0.39 * n),
        s"group $g est ${est(g)} vs true $n (err $err)")
    }
  }
}
