// Stage anatomy of q110_fuzzy_join at a given SF dir: row counts and
// wall per stage (segment build, candidate join, distinct, verify),
// with and without salting — evidence for where the sf1 gap vs the
// DuckDB replay actually sits.
//   sbt 'runMain graft.tools.FuzzyProbe [sfDir]'
package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = GraftSession.local(32, "fuzzy-probe")
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
    println(s"[fuzzy] left=${v.count()} right=${tc.count()}")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[fuzzy] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (salts <- Seq(1, 4)) {
      // warm + timed
      time(s"full salts=$salts warm") {
        Dedup.fuzzyJoin1(v, col("v_id"), col("v_name"), tc, col("r_id"), col("r_s"),
          salts = salts).write.format("noop").mode("overwrite").save()
      }
      time(s"full salts=$salts") {
        Dedup.fuzzyJoin1(v, col("v_id"), col("v_name"), tc, col("r_id"), col("r_s"),
          salts = salts).write.format("noop").mode("overwrite").save()
      }
    }
    // stage anatomy of the unsalted path
    val rseg = tc
      .withColumn("rl", char_length(col("r_s")))
      .select(col("r_id"), col("r_s"), col("rl"), explode(expr(
        """array(
          |  named_struct('kind', 'P', 'key', substring(r_s, 1, rl div 2), 'len', rl),
          |  named_struct('kind', 'S', 'key', substring(r_s, CAST(rl div 2 AS INT) + 1, rl - rl div 2), 'len', rl))""".stripMargin)).as("seg"))
      .select(col("r_id"), col("r_s"), col("rl"),
        xxhash64(col("seg.kind"), col("seg.key"), col("seg.len")).as("hk"))
    val lkey = v
      .withColumn("ll", char_length(col("v_name")))
      .select(col("v_id"), col("v_name"), col("ll"), explode(expr(
        """array_distinct(flatten(transform(sequence(ll - 1, ll + 1), sl -> array(
          |  named_struct('kind', 'P', 'key', substring(v_name, 1, sl div 2), 'len', sl),
          |  named_struct('kind', 'S', 'key',
          |    substring(v_name, CAST(ll - (sl - sl div 2) AS INT) + 1, sl - sl div 2), 'len', sl)))))""".stripMargin)).as("seg"))
      .select(col("v_id"), col("v_name"), col("ll"),
        xxhash64(col("seg.kind"), col("seg.key"), col("seg.len")).as("hk"))
    time("rseg count")(println(s"[fuzzy] rseg=${rseg.count()}"))
    time("lkey count")(println(s"[fuzzy] lkey=${lkey.count()}"))
    val joined = lkey.join(rseg, Seq("hk")).filter(abs(col("ll") - col("rl")) <= 1)
    time("join count")(println(s"[fuzzy] joined=${joined.count()}"))
    val cand = joined.select(col("v_id"), col("v_name"), col("r_id"), col("r_s")).distinct()
    time("cand distinct")(println(s"[fuzzy] cand=${cand.count()}"))
    time("verify") {
      println(s"[fuzzy] verified=${cand
        .withColumn("dist", levenshtein(col("v_name"), col("r_s")).cast("long"))
        .filter(col("dist") <= 1).count()}")
    }
    spark.stop()
  }
}
