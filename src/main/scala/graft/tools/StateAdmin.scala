// Read-only inspection of a persisted state dir (either family):
// per-version commit/layout/size/mtime, the chain the default load
// would resolve (base + delta layers), the pinned stream tag, and
// crash-debris candidates — the operational "what is this chain
// serving and what can retention reclaim" question, answered without
// loading any table. Works on any Hadoop FS scheme, like the
// families themselves.
//   sbt 'runMain graft.tools.StateAdmin <stateDir>'
package graft.tools

import org.apache.hadoop.fs.Path
import graft.operators.StateVersions

object StateAdmin {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StateAdmin <stateDir>")
    val dir = args(0)
    val spark = graft.GraftSession.local(2, "state-admin")
    spark.sparkContext.setLogLevel("ERROR")
    val fs = StateVersions.fsOf(spark, dir)

    val all = StateVersions.listVersionDirs(spark, dir).sortBy(_._1)
    require(all.nonEmpty, s"no v=N dirs under $dir")
    // family auto-detect by full-layout classifier table presence
    val classifier = Seq("keepers", "comp").find { t =>
      all.exists { case (v, _) =>
        fs.exists(new Path(s"$dir/v=$v/$t")) || fs.exists(new Path(s"$dir/v=$v/$t.d"))
      }
    }.getOrElse(sys.error(s"$dir matches neither state family (no keepers/comp dirs)"))
    val family = if (classifier == "keepers") "ingest" else "dup-cluster"
    val fulls = StateVersions.layoutVersions(spark, dir, classifier).toSet

    def duMb(p: Path): Double =
      if (!fs.exists(p)) 0.0
      else fs.getContentSummary(p).getLength / 1e6
    val committed = all.collect { case (v, true) => v }
    val rows = all.map { case (v, ok) =>
      val p = new Path(s"$dir/v=$v")
      val layout = if (fulls(v)) "full" else "delta"
      val debris = !ok && committed.nonEmpty && v < committed.max
      (v, ok, layout, duMb(p), fs.getFileStatus(p).getModificationTime, debris)
    }
    val chain = StateVersions.chain(committed, fulls)
    val tagP = new Path(s"$dir/${StateVersions.StreamTagMarker}")
    val tag = if (!fs.exists(tagP)) None else {
      val in = fs.open(tagP)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
      finally in.close()
    }

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    println(f"family=$family%s dir=$dir%s stream_tag=${tag.getOrElse("-")}%s")
    println(f"${"v"}%6s ${"state"}%-11s ${"layout"}%-6s ${"MB"}%8s  mtime")
    rows.foreach { case (v, ok, layout, mb, mt, debris) =>
      val state = if (ok) "committed" else if (debris) "DEBRIS?" else "in-flight"
      println(f"$v%6d $state%-11s $layout%-6s ${fmt(mb)}%8s  ${new java.sql.Timestamp(mt)}")
    }
    chain match {
      case Some((head, base, deltas)) =>
        println(s"default load: head v=$head = base v=$base" +
          (if (deltas.isEmpty) "" else deltas.mkString(" + deltas [", ",", "]")))
      case None =>
        println("default load: UNREADABLE — no committed full base (rebuild with a full save)")
    }
    val reclaimable = rows.collect { case (v, _, _, mb, _, true) => mb }.sum
    if (reclaimable > 0)
      println(s"debris candidates: ${fmt(reclaimable)} MB (compact() sweeps them after the grace window)")
    spark.stop()
  }
}
