package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Rollups
import graft.sources.{Lake, Tables}

/** Measures the bucketed-lake payoff for keyed rollups: dedup-latest
  * per user over sf0.1 events, (a) plain parquet + window, (b)
  * bucketed table + window (exchange-free), (c) single-pass max_by.
  * Run: sbt 'runMain graft.tools.BucketProbe'
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "bucket-probe")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val ev = Tables.events(spark, dir).drop("ts_ns")
    Lake.writeBucketed(ev, "ev_bucketed", "user_id", 32)
    val bucketed = spark.table("ev_bucketed")

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    time("plain+window") {
      Rollups.latestPerKey(ev, Seq(col("user_id")), Seq(col("ts"), col("event_id"))).count()
    }
    time("bucketed+window") {
      Rollups.latestPerKey(bucketed, Seq(col("user_id")), Seq(col("ts"), col("event_id"))).count()
    }
    time("plain+max_by") {
      Rollups.latestPerKeyAgg(ev, Seq(col("user_id")), struct(col("ts"), col("event_id")),
        Seq("event_id", "value")).count()
    }
    val plan = Rollups.latestPerKey(bucketed, Seq(col("user_id")), Seq(col("ts"), col("event_id")))
      .queryExecution.executedPlan.toString
    println("bucketed window plan has shuffle: " + plan.contains("Exchange hashpartitioning"))
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.stop()
  }
}
