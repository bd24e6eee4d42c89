// Minimal paired-point timer: wall of one (or more) catalog queries at
// an arbitrary sfDir, min-of-N warm (first run untimed). For scale
// adjudications (e.g. the q123 sf1 crossover point) where Bench's
// whole-catalog pass and fixed sfDir are the wrong tool.
//   sbt 'runMain graft.tools.QTimeProbe <sfDir> <runs> <key> [key…]'
package graft.tools

import graft.GraftSession

object QTimeProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QTimeProbe <sfDir> <runs> <key> [key…]")
    val (dir, runs, keys) = (args(0), args(1).toInt, args.drop(2).toSeq)
    val spark = GraftSession.local(32, "qtime-probe")
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = graft.SparkEntry.queries
    val out = keys.map { k =>
      val fn = qs.getOrElse(k, sys.error(s"unknown catalog key $k"))
      fn(spark, dir).count() // warm (codegen, footers, staging)
      spark.catalog.clearCache()
      val wall = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.min
      s""""$k":${fmt(wall)}"""
    }
    println(s"""{"probe":"qtime","sf":"$dir","runs":$runs,"walls":{${out.mkString(",")}}}""")
    spark.stop()
  }
}
