// The r10 VERDICT's structural lever for q110, measured: weight-carrying
// distinct (collapse identical strings per side before segmenting) vs
// the strings-through default, at a given SF dir, in two regimes:
//   (a) the catalog corpus (near-distinct: ~1.01–1.06× duplication),
//   (b) a planted boilerplate corpus (every title repeated REP times),
// min-of-2 warm timings, identical outputs asserted per regime.
//   sbt 'runMain graft.tools.FuzzyCollapseProbe [sfDir] [rep]'
package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

object FuzzyCollapseProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val rep = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.local(32, "fuzzy-collapse-probe")
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id").as("r_id"), substring(col("text"), 1, 30).as("r_s"))
    val pos = (pmod(col("r_id"), char_length(col("r_s"))) + 1).cast("int")
    val v = t.select((col("r_id") + 1000000).as("v_id"),
      when(pmod(col("r_id"), lit(3)) === 0,
        concat(col("r_s").substr(lit(1), pos - 1), lit("q"),
          col("r_s").substr(pos + 1, char_length(col("r_s")))))
        .when(pmod(col("r_id"), lit(3)) === 1,
          concat(col("r_s").substr(lit(1), pos - 1),
            col("r_s").substr(pos + 1, char_length(col("r_s")))))
        .otherwise(col("r_s")).as("v_name")).cache()
    val tc = t.cache()
    println(s"[collapse] catalog left=${v.count()} right=${tc.count()}")
    def timeMin2[A](tag: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[collapse] $tag min2=${runs.min}%.2f s")
    }
    def run(l: org.apache.spark.sql.DataFrame, li: String, ls: String,
        r: org.apache.spark.sql.DataFrame, ri: String, rs: String,
        collapse: Boolean): org.apache.spark.sql.DataFrame =
      Dedup.fuzzyJoin1(l, col(li), col(ls), r, col(ri), col(rs),
        collapseDuplicates = collapse)

    // regime (a): catalog corpus
    for (c <- Seq(false, true))
      timeMin2(s"catalog collapse=$c") {
        run(v, "v_id", "v_name", tc, "r_id", "r_s", c)
          .write.format("noop").mode("overwrite").save()
      }
    val a0 = run(v, "v_id", "v_name", tc, "r_id", "r_s", false)
    val a1 = run(v, "v_id", "v_name", tc, "r_id", "r_s", true)
    println(s"[collapse] catalog pairs=${a0.count()} parity=${a0.except(a1).isEmpty && a1.except(a0).isEmpty}")

    if (rep <= 1) { spark.stop(); return }
    // regime (b): boilerplate corpus — every right title occurs `rep`
    // times under distinct ids (template spam), same planted left edits
    val tRep = tc.select(col("r_id"), col("r_s"),
        explode(sequence(lit(0), lit(rep - 1))).as("k"))
      .select((col("r_id") * rep + col("k")).as("r_id"), col("r_s")).cache()
    val vRep = v.select(col("v_id"), col("v_name"),
        explode(sequence(lit(0), lit(rep - 1))).as("k"))
      .select((col("v_id") * rep + col("k")).as("v_id"), col("v_name")).cache()
    println(s"[collapse] boilerplate×$rep left=${vRep.count()} right=${tRep.count()}")
    for (c <- Seq(false, true))
      timeMin2(s"boilerplate collapse=$c") {
        run(vRep, "v_id", "v_name", tRep, "r_id", "r_s", c)
          .write.format("noop").mode("overwrite").save()
      }
    val b0 = run(vRep, "v_id", "v_name", tRep, "r_id", "r_s", false)
    val b1 = run(vRep, "v_id", "v_name", tRep, "r_id", "r_s", true)
    println(s"[collapse] boilerplate pairs=${b0.count()} parity=${b0.except(b1).isEmpty && b1.except(b0).isEmpty}")
    spark.stop()
  }
}
