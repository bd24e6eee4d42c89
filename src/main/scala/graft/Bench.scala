package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, parquet footers) before timing
    Seq("lineitem", "events", "documents", "orders").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // a query that fails fast must NOT be reported as a (very good)
      // number — poison the min with NaN, exported as -1
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop operator-internal persists between queries
      if (ok) dt else Double.NaN
    }
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
    // Uniform warm-up: one untimed pass over the WHOLE catalog first, so
    // every timed query sees the same warmed state (codegen cache,
    // broadcast infra, shuffle dirs) regardless of bench order — the
    // r1→r2 q4/q5 "regressions" were first-run artifacts of catalog
    // growth reordering who pays the cold start.
    catalog.foreach { case (_, fn) => timeOnce(fn) }
    val results = catalog.map { case (name, fn) =>
      // min-of-2 after warm-up: the min reflects the plan, not a
      // transient stall on a shared machine (r1: the driver recorded
      // 59 s for a query that runs 0.8 s warm). Queries still over 1 s
      // get a third run — the machine's spikes last long enough to hit
      // two consecutive runs (observed: a 3 s query measuring 7-15 s).
      val two = math.min(timeOnce(fn), timeOnce(fn))
      val dt = if (two.isNaN || two <= 1.0) two else {
        // a transiently-failing third run must not poison two good
        // measurements (math.min(x, NaN) is NaN)
        val three = timeOnce(fn)
        if (three.isNaN) two else math.min(two, three)
      }
      name -> dt
    }
    // ms precision: the driver keeps only a 2000-char output tail, and a
    // 70+-query map of 17-digit doubles overflowed it in r3 (the total
    // was truncated out of BENCH_r03.json)
    // Locale.ROOT: the f-interpolator is locale-sensitive and a
    // comma-decimal default locale would emit invalid JSON
    def fmt(v: Double): String =
      if (v.isNaN) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filterNot(_.isNaN).sum
    val failed = results.count(_._2.isNaN)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // compact summary LAST so the headline number survives any tail cut
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
