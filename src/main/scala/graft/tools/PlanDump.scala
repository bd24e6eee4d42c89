package graft.tools

/** Dump `explain("formatted")` of catalog queries to files — the
  * plans/rNN before/after evidence the optimization rounds commit.
  *   sbt 'runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <key…>'
  * writes `<outDir>/<key>_<suffix>.txt` per key. NOTE: entries with
  * write side effects execute them while building the final frame (the
  * state-cycle entries persist versions at construction time); the
  * dumped plan is the final report plan those entries serve.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <key…>")
    val (dir, outDir, suffix, keys) = (args(0), args(1), args(2), args.drop(3).toSeq)
    val spark = graft.GraftSession.local(8, "plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    keys.foreach { k =>
      val df = graft.SparkEntry.queries(k)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${k}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      spark.catalog.clearCache()
      println(s"[plandump] wrote $outDir/${k}_$suffix.txt")
    }
    spark.stop()
  }
}
