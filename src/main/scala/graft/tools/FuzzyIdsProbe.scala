package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** q110 exchange-shape experiment (r10): does an IDS-ONLY candidate
  * exchange (join 8-byte keys + ids, distinct pairs, join strings
  * back for the verify) beat the shipped strings-through-the-join
  * shape? The shipped shape pays one wide SHJ exchange
  * (~60 B/row of strings) but zero join-backs; ids-only pays three
  * narrow exchanges (segments 24 B, distinct pairs 16 B, two
  * string join-backs). Measured head-to-head on the 10× replica.
  */
object FuzzyIdsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    val spark = GraftSession.local(32, "fuzzy-ids-probe")
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
    println(s"[ids] left=${v.count()} right=${tc.count()}")

    def rsegOf(base: DataFrame, withStr: Boolean): DataFrame = {
      val d = base
        .withColumn("rl", char_length(col("r_s")))
        .select(col("r_id"), col("r_s"), col("rl"), explode(expr(
          """array(
            |  named_struct('kind', 'P', 'key', substring(r_s, 1, rl div 2), 'len', rl),
            |  named_struct('kind', 'S', 'key', substring(r_s, CAST(rl div 2 AS INT) + 1, rl - rl div 2), 'len', rl))""".stripMargin)).as("seg"))
        .select(col("r_id"), col("r_s"), col("rl"),
          xxhash64(col("seg.kind"), col("seg.key"), col("seg.len")).as("hk"))
      if (withStr) d else d.drop("r_s")
    }
    def lkeyOf(base: DataFrame, withStr: Boolean): DataFrame = {
      val d = base
        .withColumn("ll", char_length(col("v_name")))
        .select(col("v_id"), col("v_name"), col("ll"), explode(expr(
          """array_distinct(flatten(transform(sequence(ll - 1, ll + 1), sl -> array(
            |  named_struct('kind', 'P', 'key', substring(v_name, 1, sl div 2), 'len', sl),
            |  named_struct('kind', 'S', 'key',
            |    substring(v_name, CAST(ll - (sl - sl div 2) AS INT) + 1, sl - sl div 2), 'len', sl)))))""".stripMargin)).as("seg"))
        .select(col("v_id"), col("v_name"), col("ll"),
          xxhash64(col("seg.kind"), col("seg.key"), col("seg.len")).as("hk"))
      if (withStr) d else d.drop("v_name")
    }

    def time(tag: String)(mk: => DataFrame): Unit = {
      def once: Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once
      println(f"[ids] $tag ${math.min(once, once)}%.2f s")
    }

    // shipped shape: strings ride the segment join, verify inline
    time("strings_through") {
      lkeyOf(v, withStr = true).join(rsegOf(tc, withStr = true).hint("shuffle_hash"), Seq("hk"))
        .filter(abs(col("ll") - col("rl")) <= 1)
        .withColumn("dist", levenshtein(col("v_name"), col("r_s"), 1).cast("long"))
        .filter(col("dist") >= 0 && col("dist") <= 1)
        .select(col("v_id"), col("r_id"), col("dist")).distinct()
    }
    // ids-only: narrow join, distinct pairs, strings joined back
    time("ids_only") {
      val cand = lkeyOf(v, withStr = false)
        .join(rsegOf(tc, withStr = false).hint("shuffle_hash"), Seq("hk"))
        .filter(abs(col("ll") - col("rl")) <= 1)
        .select(col("v_id"), col("r_id")).distinct()
      cand.join(v.hint("shuffle_hash"), Seq("v_id"))
        .join(tc.hint("shuffle_hash"), Seq("r_id"))
        .withColumn("dist", levenshtein(col("v_name"), col("r_s"), 1).cast("long"))
        .filter(col("dist") >= 0 && col("dist") <= 1)
        .select(col("v_id"), col("r_id"), col("dist"))
    }
    spark.stop()
  }
}
