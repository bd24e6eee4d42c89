package graft.tools

import graft.operators.DupState

/** Operational cost of DupState retention (VERDICT r14 stretch #7):
  * measures one [[DupState.compact]] over an existing chain — wall,
  * versions deleted, bytes reclaimed — plus the chain-floor safety
  * check (a load at the retained head must still resolve). Run it on
  * the chain DupFanInProbe leaves behind (16 deltas over a full base,
  * rebased at the top): `keepLast = 1` then reclaims the entire
  * pre-rebase chain in one sweep — the worst-case compaction a daily
  * pipeline performs right after its periodic rebase. Args:
  * [dir=/tmp/graft_dup_fanin] [keepLast=1].
  */
object DupCompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("file:///tmp/graft_dup_fanin")
    val keepLast = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = graft.GraftSession.local(32, "dup-compact-probe")
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength
    val before = bytes
    val versionsBefore = DupState.listVersions(spark, dir).sorted.toSeq
    val t0 = System.nanoTime()
    val deleted = DupState.compact(spark, dir, keepLast)
    val wall = (System.nanoTime() - t0) / 1e9
    val after = bytes
    // chain-floor safety: the retained head must still load and serve
    val (head, st) = DupState.load(spark, dir)
    val compRows = st.comp.count()
    println(s"""{"probe":"dup_compact","dir":"$dir","keep_last":$keepLast,""" +
      s""""versions_before":${versionsBefore.length},"deleted":${deleted.length},""" +
      s""""wall_sec":${fmt(wall)},"bytes_before":$before,"bytes_after":$after,""" +
      s""""reclaimed_mb":${fmt((before - after) / 1048576.0)},""" +
      s""""head_after":$head,"comp_rows":$compRows}""")
    spark.stop()
  }
}
