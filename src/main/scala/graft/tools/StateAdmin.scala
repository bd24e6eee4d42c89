// Read-only inspection of a persisted state dir (either family):
// per-version commit/layout/size/mtime, the chain the default load
// would resolve (base + delta layers), the pinned stream tag, and
// crash-debris candidates — the operational "what is this chain
// serving and what can retention reclaim" question, answered without
// loading any table. Works on any Hadoop FS scheme, like the
// families themselves.
//   sbt 'runMain graft.tools.StateAdmin <stateDir>'
//
// --check turns the inspector into a CI/cron health gate (VERDICT
// r16 #6): exit 0 when the chain is healthy, exit 1 (after printing
// one "CHECK FAIL:" line per finding) when any of
//   - the chain is UNREADABLE (no committed full base ≤ the head),
//   - uncommitted crash debris below the committed max has sat
//     longer than the grace window (default 24 h — an in-flight
//     rewrite keeps its mtime fresh, so age = abandonment),
//   - the stream-tag marker is present but EMPTY (a truncated
//     adoption; the guard treats it as absent and rewrites, but its
//     presence means an adoption crashed mid-publish).
//   sbt 'runMain graft.tools.StateAdmin <stateDir> --check [graceHours]'
package graft.tools

import org.apache.hadoop.fs.Path
import graft.operators.StateVersions

object StateAdmin {

  /** The `--check` rules, separated from main so a spec can drive
    * both outcomes without trapping `sys.exit`. Returns one message
    * per failed check; empty = healthy (exit 0).
    */
  def check(spark: org.apache.spark.sql.SparkSession, dir: String,
      debrisGraceMs: Long): Seq[String] = {
    val fs = StateVersions.fsOf(spark, dir)
    val all = StateVersions.listVersionDirs(spark, dir).sortBy(_._1)
    if (all.isEmpty) return Seq(s"no v=N dirs under $dir — not a state dir or never bootstrapped")
    val classifier = Seq("keepers", "comp").find { t =>
      all.exists { case (v, _) =>
        fs.exists(new Path(s"$dir/v=$v/$t")) || fs.exists(new Path(s"$dir/v=$v/$t.d"))
      }
    }.getOrElse(return Seq(s"$dir matches neither state family (no keepers/comp dirs)"))
    val fulls = StateVersions.layoutVersions(spark, dir, classifier).toSet
    val committed = all.collect { case (v, true) => v }
    val chainFail = StateVersions.chain(committed, fulls) match {
      case None => Seq(s"chain UNREADABLE under $dir: no committed full base ≤ the head " +
        "(base removed externally?) — rebuild with a full save")
      case Some(_) => Seq.empty
    }
    val cutoff = System.currentTimeMillis() - debrisGraceMs
    val staleDebris = if (committed.isEmpty) Seq.empty[String] else all.toSeq.collect {
      case (v, false) if v < committed.max &&
          fs.getFileStatus(new Path(s"$dir/v=$v")).getModificationTime <= cutoff =>
        s"stale crash debris v=$v under $dir (uncommitted, below max committed " +
          s"v=${committed.max}, untouched past the grace window) — compact() reclaims it"
    }
    val tagP = new Path(s"$dir/${StateVersions.StreamTagMarker}")
    val tagFail =
      if (fs.exists(tagP) && fs.getFileStatus(tagP).getLen == 0)
        Seq(s"empty ${StateVersions.StreamTagMarker} under $dir: a tag adoption crashed " +
          "mid-publish; the next guarded batch rewrites it, but until then the dir is unpinned")
      else Seq.empty
    chainFail ++ staleDebris ++ tagFail
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StateAdmin <stateDir> [--check [graceHours]]")
    val dir = args(0)
    val checkMode = args.contains("--check")
    val spark = graft.GraftSession.local(2, "state-admin")
    spark.sparkContext.setLogLevel("ERROR")
    if (checkMode) {
      val graceH = args.dropWhile(_ != "--check").drop(1).headOption
        .map(_.toDouble).getOrElse(24.0)
      val failures = check(spark, dir, (graceH * 3600 * 1000).toLong)
      failures.foreach(f => println(s"CHECK FAIL: $f"))
      if (failures.isEmpty) println(s"CHECK OK: $dir")
      spark.stop()
      sys.exit(if (failures.isEmpty) 0 else 1)
    }
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
