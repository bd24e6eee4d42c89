package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{Dedup, Stats}
import graft.sources.Tables

/** Stage anatomy for q121_sample_quantiles: where does the wall go —
  * the hashed scan, the TopKAgg threshold, the sample materialization,
  * or the histogram-guided exact path? Warm min-of-2 per stage.
  * `runMain graft.tools.QsProbe [sfDir]`
  */
object QsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 256

    def base(): DataFrame = {
      val e = Tables.events(spark, sfDir)
      def ph(b: Int, p: Long) =
        Dedup.polyHash(e, concat(col("event_id").cast("string"), lit("/qs")), b, p)
      val w = pmod(ph(Dedup.PolyB1, Dedup.PolyP1) * lit(Dedup.PolyP2) +
        ph(Dedup.PolyB2, Dedup.PolyP2), lit(1L << 53))
      e.select(col("event_type"), col("value"), w.as("w"))
    }

    def time(name: String)(f: => Unit): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime(); f; spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      println(f"QSPROBE $name ${math.min(once(), once())}%.2f s")
    }

    time("scan_only") {
      Tables.events(spark, sfDir).select(col("event_type"), col("value"))
        .write.format("noop").mode("overwrite").save()
    }
    time("scan_hash") { base().write.format("noop").mode("overwrite").save() }
    time("threshold_agg") {
      base().groupBy(col("event_type"))
        .agg(graft.functions.TopKAgg.topk(k)((-col("w")).cast("double"), col("w")).as("tk"))
        .write.format("noop").mode("overwrite").save()
    }
    time("sample_full") {
      Stats.kmvRowSample(base(), Seq("event_type"), col("w"), k)
        .groupBy(col("event_type")).agg(sort_array(collect_list(col("value"))).as("sv"))
        .write.format("noop").mode("overwrite").save()
    }
    time("exact_hist") {
      val e = Tables.events(spark, sfDir)
      val hist = e.groupBy(col("event_type"), floor(col("value")).cast("long").as("bk"))
        .agg(count(lit(1)).as("bn"))
      val wcum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("bk"))
      val cum = hist.withColumn("cum", sum(col("bn")).over(wcum))
      val n = hist.groupBy(col("event_type")).agg(sum(col("bn")).as("n_rows"))
      val tgt = n.select(col("event_type"), explode(array(Seq(50, 90, 99).map(p =>
          struct(lit(p).as("p"), expr(s"1 + ($p*(n_rows-1)) DIV 100").as("idx"))): _*)).as("t"))
        .select(col("event_type"), col("t.p").as("p"), col("t.idx").as("idx"))
      val tb = tgt.join(cum, Seq("event_type"))
        .filter(col("idx") > col("cum") - col("bn") && col("idx") <= col("cum"))
        .select(col("event_type"), col("p"), col("bk"),
          (col("idx") - (col("cum") - col("bn"))).as("off"))
      val inb = e.select(col("event_type"), floor(col("value")).cast("long").as("bk"), col("value"))
        .join(broadcast(tb), Seq("event_type", "bk"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"), col("p"), col("bk")).orderBy(col("value"))
      inb.withColumn("rn", row_number().over(wb))
        .filter(col("rn") === col("off"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full_query") {
      graft.SparkEntry.queries("q121_sample_quantiles")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
