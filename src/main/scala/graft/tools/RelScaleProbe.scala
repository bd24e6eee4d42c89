// 10× relational scaling probe: replicates the sf0.1 events table 10×
// (shifting user ids so key cardinality also grows 10×) and times the
// flagship/window/rollup queries at both scales. Linear-ish growth =
// the plan holds; super-linear = a shuffle or sort is quadratic.
//   sbt 'runMain graft.tools.RelScaleProbe'
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{Rollups, Weather}

object RelScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "rel-scale-probe")
    val base = graft.sources.Tables.events(spark, dir)

    def at(mult: Int): DataFrame =
      if (mult == 1) base
      else (0 until mult).map(k => base
        .withColumn("user_id", col("user_id") + lit(k * 1000000L))
        .withColumn("event_id", col("event_id") + lit(k * 100000000L)))
        .reduce(_ unionByName _)

    def t(label: String)(f: => Long): Double = {
      def once: (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (t1, n) = once
      val dt = math.min(t1, once._1) // min-of-2: drop codegen/JIT warmup
      println(f"[rel] $label%-28s $dt%6.2f s ($n rows)"); dt
    }

    Seq(1, 10).foreach { m =>
      val e = at(m).persist(); e.count()
      println(s"[rel] === scale ${m}x (${e.count()} rows) ===")
      t(s"daily_rollup x$m") {
        e.groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(min(col("value")), max(col("value")), count(lit(1))).count()
      }
      t(s"latest_per_key x$m") {
        Rollups.latestPerKey(e, Seq(col("user_id")), Seq(col("ts"), col("event_id"))).count()
      }
      t(s"sessionize x$m") {
        Rollups.sessionize(e.withColumn("ms", expr("ts_ns div 1000000")),
          col("user_id"), col("ms"), col("event_id"), 1800000L)
          .groupBy(col("user_id"), col("session_idx")).agg(count(lit(1))).count()
      }
      t(s"lead_chain x$m") {
        Rollups.leadChain(e, col("user_id"), col("event_type"),
          expr("ts_ns div 1000000"), 600000L).count()
      }
      e.unpersist()
    }
    spark.stop()
  }
}
