package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicLong
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobCount = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobCount.incrementAndGet()
    })
    // diagnostics for the external-contention question (r6: q45 timed
    // 4.6 s in the driver bench vs 0.11 s in every fresh session —
    // same commit): wall vs process-CPU vs GC per query. wall ≫ cpu
    // with normal gc/jobs = something OUTSIDE this JVM owned the
    // cores during that window (e.g. a concurrent oracle replay);
    // high gc = heap pressure inside the bench itself.
    import scala.jdk.CollectionConverters._
    def gcMs: Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    def cpuNs: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }
    // warm the session (codegen, parquet footers) before timing
    Seq("lineitem", "events", "documents", "orders").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    final case class Meas(wall: Double, gc: Long, cpu: Double, jobs: Long)
    // per-query failed-run counter: min-of-N selection may mask a
    // query that fails on RE-execution behind one good run (leaked
    // temp view / state) — surface the count so a deterministic
    // rerun failure is visible even when the kept time looks healthy
    val runFails = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Meas = {
      val (t0, g0, c0, j0) = (System.nanoTime(), gcMs, cpuNs, jobCount.get())
      // a query that fails fast must NOT be reported as a (very good)
      // number — poison the min with NaN, exported as -1
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop operator-internal persists between queries
      Meas(if (ok) dt else Double.NaN, gcMs - g0, (cpuNs - c0) / 1e9, jobCount.get() - j0)
    }
    // CODE-FROZEN calibration probes (r10 VERDICT: the ±30-40% machine
    // band cost rounds 8-10 an investigation each). Three fixed
    // workloads whose DEFINITIONS never change round over round —
    // cross-round bench deltas normalize against them instead of being
    // re-adjudicated from cpu/wall forensics:
    //   cpu     — pure arithmetic over an in-memory range (no IO),
    //   scan    — one parquet scan-aggregate of lineitem,
    //   shuffle — one 4096-key hash exchange over lineitem.
    // Measured min-of-2 at bench START and END (the spread exposes
    // in-run drift). DO NOT EDIT these definitions.
    def calib(): (Double, Double, Double) = {
      // min-of-3 (r12 VERDICT: min-of-2 ~100 ms probes crossed the 1.5
      // spread on a demonstrably quiet machine — probe variance, not
      // contention; the third sample tightens the min estimate)
      def m2(f: => Unit): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      val cpu = m2 { spark.range(1L << 26)
        .selectExpr("sum(id * 2654435761 % 1000003) AS s").collect() }
      val scan = m2 { spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("sum(l_quantity) AS s", "count(1) AS n").collect() }
      val shuffle = m2 { spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.col("l_orderkey")),
          org.apache.spark.sql.functions.lit(4096)))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .selectExpr("sum(n) AS s").collect() }
      (cpu, scan, shuffle)
    }
    def fmtEarly(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def calibJson(c: (Double, Double, Double)): String =
      s"""{"cpu":${fmtEarly(c._1)},"scan":${fmtEarly(c._2)},"shuffle":${fmtEarly(c._3)}}"""
    // worst per-probe drift between the two brackets of a pass — > 1.5
    // means part of the pass ran on a contended machine (r11's
    // committed artifact was such a run: scan 0.449 start vs 0.167 end)
    def calibSpread(a: (Double, Double, Double), b: (Double, Double, Double)): Double = {
      def r(x: Double, y: Double) = math.max(x, y) / math.max(math.min(x, y), 1e-9)
      Seq(r(a._1, b._1), r(a._2, b._2), r(a._3, b._3)).max
    }
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
    // Uniform warm-up: one untimed pass over the WHOLE catalog first, so
    // every timed query sees the same warmed state (codegen cache,
    // broadcast infra, shuffle dirs) regardless of bench order — the
    // r1→r2 q4/q5 "regressions" were first-run artifacts of catalog
    // growth reordering who pays the cold start.
    catalog.foreach { case (_, fn) => timeOnce(fn) }
    // calibration brackets run AFTER the warm-up pass (placement is not
    // part of the frozen probe definitions): a cold-JVM start anchor
    // mostly measures JIT/codegen warm-up (r11: start ≈ 2.4-2.7× end on
    // every run), drowning the machine-band signal it exists to carry.
    def measurePass() = {
      val cs = calib()
      val rs = catalog.map { case (name, fn) =>
      // min-of-2 after warm-up: the min reflects the plan, not a
      // transient stall on a shared machine (r1: the driver recorded
      // 59 s for a query that runs 0.8 s warm). Queries still over 1 s
      // get a third run — the machine's spikes last long enough to hit
      // two consecutive runs (observed: a 3 s query measuring 7-15 s).
      def run(): Meas = {
        val m = timeOnce(fn)
        if (m.wall.isNaN) runFails(name) += 1
        m
      }
        val m1 = run(); val m2 = run()
        val two = if (m1.wall.isNaN || (!m2.wall.isNaN && m2.wall < m1.wall)) m2 else m1
        val best = if (two.wall.isNaN || two.wall <= 1.0) two else {
          // a transiently-failing third run must not poison two good
          // measurements
          val m3 = run()
          if (m3.wall.isNaN || m3.wall >= two.wall) two else m3
        }
        name -> best
      }
      val ce = calib()
      (rs, cs, ce)
    }
    // Per-query wall-time MINIMUMS across every committed
    // BENCH_full_r*.json (and .rerunN siblings) in the repo: the
    // query-level evidence that corroborates a contended verdict. A
    // probe-spread flag alone fired on both the worst run ever (r12
    // committed, 13 phantom regressions) and the best (the r12 judge's
    // 99.7 s pass) — no information. A run is only called contended
    // when the machine-band signal AND the queries themselves agree.
    val histMin: Map[String, Double] = {
      val rx = """"([A-Za-z0-9_]+)":\{"wall":([0-9.]+)""".r
      Option(new java.io.File(".").listFiles).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("BENCH_full_r") && f.getName.endsWith(".json"))
        .flatMap { f =>
          val txt = try new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            catch { case _: Throwable => "" }
          // an out-of-round artifact redirected INTO a round-family name
          // still must not seed the regression history
          if (txt.contains("\"out_of_round\":true")) Iterator.empty
          else rx.findAllMatchIn(txt).map(m => (m.group(1), m.group(2).toDouble))
        }
        .filter(_._2 > 0) // -1 = failed run, not a time
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    }
    // queries with history that regressed ≥ 3× vs their all-round min
    // AND are out of the sub-second session-floor noise band
    def regressed3x(rs: Seq[(String, Meas)]): Int = rs.count { case (k, m) =>
      !m.wall.isNaN && m.wall > 0.5 && histMin.get(k).exists(h => m.wall > 3 * h)
    }
    // Act on the calibration (r11 VERDICT: the probes proved the noise
    // narrative but nothing consumed them — the committed r11 artifact
    // was the contended run). Contended = probe spread far out of band
    // (> 2×), OR moderately out (> 1.5×) with ≥ 5 queries regressed 3×
    // vs their own history (r12 VERDICT #1: spread alone false-fires,
    // and each false fire doubles bench wall-time). One automatic
    // rerun when contended; per-query MIN across BOTH passes is kept —
    // a whole discarded pass threw away clean measurements the r12
    // artifact had available (its q100 had one good pass).
    def verdict(rs: Seq[(String, Meas)], spread: Double): Boolean =
      spread > 2.0 || (spread > 1.5 && regressed3x(rs) >= 5)
    def passTotal(rs: Seq[(String, Meas)]): Double =
      rs.map(_._2.wall).filterNot(_.isNaN).sum
    val pass1 = measurePass()
    val spread1 = calibSpread(pass1._2, pass1._3)
    val (results, calibStartV, calibEndV, spreadKept, reran, passInfo) =
      if (!verdict(pass1._1, spread1))
        (pass1._1, pass1._2, pass1._3, spread1, false,
          Seq((spread1, passTotal(pass1._1))))
      else {
        val pass2 = measurePass()
        val spread2 = calibSpread(pass2._2, pass2._3)
        val p2 = pass2._1.toMap
        val merged = pass1._1.map { case (k, m1) =>
          val m2 = p2(k)
          k -> (if (m1.wall.isNaN || (!m2.wall.isNaN && m2.wall < m1.wall)) m2 else m1)
        }
        // ADVICE r13: after a merge the artifact's per-query walls and
        // total are minima across two passes — a composite no single
        // run produced — so BOTH passes' spreads and totals are
        // recorded alongside, letting a consumer tell a merged total
        // from a single-pass one
        val info = Seq((spread1, passTotal(pass1._1)), (spread2, passTotal(pass2._1)))
        if (spread2 <= spread1) (merged, pass2._2, pass2._3, spread2, true, info)
        else (merged, pass1._2, pass1._3, spread1, true, info)
      }
    // Per-query outlier rerun (VERDICT r15 #2): the committed r15
    // artifact recorded q104 at 7.06 s where a clean pass measures
    // 4.17 s — single-pass machine noise on individual queries is now
    // the dominant error in cross-round comparisons, and the whole-pass
    // contention rerun above only fires on systemic spread. Any query
    // whose kept wall is > 2× its own all-round historical minimum AND
    // > 1 s (sub-second walls are session-floor noise either way) gets
    // one more run; the min is kept and the reran keys are recorded in
    // the artifact so a consumer can see which walls are min-of-3.
    val catalogByName = catalog.toMap
    val outlierKeys = results.collect {
      case (k, m) if !m.wall.isNaN && m.wall > 1.0 &&
        histMin.get(k).exists(h => m.wall > 2 * h) => k
    }
    val outlierSet = outlierKeys.toSet
    val resultsR = results.map { case (k, m) =>
      if (!outlierSet.contains(k)) k -> m
      else {
        val m2 = timeOnce(catalogByName(k))
        if (m2.wall.isNaN) runFails(k) += 1
        k -> (if (m2.wall.isNaN || m2.wall >= m.wall) m else m2)
      }
    }
    val nRegressed = regressed3x(resultsR)
    val contended = verdict(resultsR, spreadKept)
    val calibStart = calibJson(calibStartV)
    val calibEnd = calibJson(calibEndV)
    // ms precision: the driver keeps only a 2000-char output tail, and a
    // 70+-query map of 17-digit doubles overflowed it in r3 (the total
    // was truncated out of BENCH_r03.json)
    // Locale.ROOT: the f-interpolator is locale-sensitive and a
    // comma-decimal default locale would emit invalid JSON
    def fmt(v: Double): String =
      if (v.isNaN) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = resultsR.map { case (k, m) => s"\"" + k + "\":" + fmt(m.wall) }
      .mkString("{", ",", "}")
    val total = resultsR.map(_._2.wall).filterNot(_.isNaN).sum
    val failed = resultsR.count(_._2.wall.isNaN)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // diag for the slowest 5 BEFORE the summary (both must fit the
    // driver's 2000-char tail): wall/cpu/gc/jobs of the kept (min)
    // run — enough to separate "the plan is slow" from "the machine
    // was busy" after the fact
    // calibration line before the diag: short enough to survive the
    // 2000-char tail together with the summary
    println(s"""{"metric":"calib","start":$calibStart,"end":$calibEnd,"spread":${fmtEarly(spreadKept)},"regressed_3x":$nRegressed,"contended":$contended,"reran":$reran,"outlier_reran":${outlierKeys.size}}""")
    val slow = resultsR.filterNot(_._2.wall.isNaN).sortBy(-_._2.wall).take(5)
      .map { case (k, m) =>
        s"\"$k\":{\"wall\":${fmt(m.wall)},\"cpu\":${fmt(m.cpu)},\"gc_ms\":${m.gc},\"jobs\":${m.jobs}}"
      }.mkString("{", ",", "}")
    // run_fails: queries with ≥1 failed individual run — non-empty
    // with failed=0 means a rerun-only failure was masked by min-of-N
    val rf = runFails.toSeq.sortBy(_._1)
      .map { case (k, n) => s"\"$k\":$n" }.mkString("{", ",", "}")
    println(s"""{"metric":"diag_slowest","queries":$slow,"run_fails":$rf}""")
    // The driver keeps only a 2000-char stdout tail, which truncates
    // the head of the per-query map out of BENCH_r{N}.json — persist
    // the FULL map (+ per-query diag) to a committed file so
    // round-over-round comparison doesn't depend on ledger
    // reconstruction. Round = GRAFT_BENCH_ROUND if set, else 1 + the
    // highest committed BENCH_r* (the DRIVER's family stays the one
    // source of round numbering — inferring from the full files too
    // would mislabel the driver's run after a builder run in the
    // same round). ADVICE r8: a round's existing full file is never
    // overwritten — any collision (multiple runs in one round, or a
    // deleted/belated BENCH_r) lands in a clearly-labeled .rerunN
    // sibling instead of clobbering earlier evidence.
    val files = Option(new java.io.File(".").listFiles).getOrElse(Array.empty)
    val inferred = files
      .flatMap(f => "^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .foldLeft(0)(math.max) + 1
    val round = sys.env.get("GRAFT_BENCH_ROUND").flatMap(_.toIntOption).getOrElse(inferred)
    val fullQs = resultsR.map { case (k, m) =>
      s"\"$k\":{\"wall\":${fmt(m.wall)},\"cpu\":${fmt(m.cpu)},\"gc_ms\":${m.gc},\"jobs\":${m.jobs},\"run_fails\":${runFails(k)}}"
    }.mkString("{", ",", "}")
    // per-pass spread+total pairs (one entry = single pass; two = the
    // committed walls are cross-pass minima — see the merge above)
    val passesJson = passInfo
      .map { case (sp, tt) => s"""{"spread":${fmtEarly(sp)},"total":${fmt(tt)}}""" }
      .mkString("[", ",", "]")
    // Out-of-round fence (VERDICT r13 #1): a judge/operator bench run in
    // the SAME repo between rounds would otherwise take the next free
    // BENCH_full_r<N> slot — making the driver's own round-N run land in
    // .rerun1 and folding a foreign machine's walls into every later
    // histMin. Non-driver runs set GRAFT_BENCH_OUT=<path> (the verify
    // skill does) and their artifact goes there verbatim, stamped
    // out_of_round — never into the round family, never into histMin
    // (which only globs BENCH_full_r*.json).
    val outOverride = sys.env.get("GRAFT_BENCH_OUT").filter(_.nonEmpty)
    val fullJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${resultsR.size},"failed":$failed,"sf":"$sfDir","out_of_round":${outOverride.nonEmpty},"calib":{"start":$calibStart,"end":$calibEnd,"spread":${fmtEarly(spreadKept)},"regressed_3x":$nRegressed,"contended":$contended,"reran":$reran,"outlier_reran":${outlierKeys.map("\"" + _ + "\"").mkString("[", ",", "]")},"passes":$passesJson},"queries":$fullQs}"""
    val fullPath = outOverride.map(java.nio.file.Paths.get(_)).getOrElse(
      (Iterator(f"BENCH_full_r$round%02d.json") ++
          Iterator.from(1).map(k => f"BENCH_full_r$round%02d.rerun$k.json"))
        .map(java.nio.file.Paths.get(_))
        .find(p => !java.nio.file.Files.exists(p)).get)
    java.nio.file.Files.write(fullPath, (fullJson + "\n").getBytes("UTF-8"))
    // compact summary LAST so the headline number survives any tail cut
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${resultsR.size},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
