package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import java.io.File
import java.nio.file.Files

/** End-to-end restart/exactly-once for the curation-at-ingest
  * flagship: a run that is STOPPED after building stream state but
  * BEFORE any row has been emitted, then restarted from its
  * checkpoint, must produce a lake identical to an uninterrupted
  * run — and a further restart with no new data must add nothing.
  *
  * This is the crash-recovery contract batch parity can't prove:
  * the dedup-signature state, the window aggregates, AND the source
  * offsets all have to survive the restart through the checkpoint
  * (file-source offsets + HDFS-backed state store + sink commit
  * log). Two kill shapes are proven: a graceful stop between
  * micro-batches (first test), and a HARD kill — job-group cancel +
  * execution-thread interrupt with no stop() bookkeeping, landed
  * while a batch is in flight (offset logged, commit pending) — whose
  * recovery must come entirely from offset/commit-log reconciliation
  * (second test).
  */
class CurateRecoverySpec extends SparkSpecBase {

  private val docsA = Seq(
    (1L, "2024-01-01T10:00:00.000Z", "the quick brown fox jumps over a lazy dog and runs to the hills"),
    (2L, "2024-01-01T10:00:00.000Z", "the quick brown fox jumps over a lazy dog and runs to the hills"),
    (3L, "2024-01-01T10:00:00.000Z", "short of a text"),
    (4L, "2024-01-01T10:00:00.000Z", "we know the secret eval answer is in the box of tricks"),
    (5L, "2024-01-01T10:00:00.000Z", "a completely fresh and clean document about the weather in lisbon today"))
  private val flush1 = Seq((-1L, "2024-01-02T10:00:00.000Z", "the flush doc is a real document with words"))
  private val flush2 = Seq((-2L, "2024-01-03T10:00:00.000Z", "the second flush doc is also a real document"))

  private def writeJson(dir: String, name: String, rows: Seq[(Long, String, String)], mtime: Long): Unit = {
    val f = new File(dir, name)
    val txt = rows.map { case (id, ts, t) => s"""{"doc_id":$id,"ts":"$ts","text":"$t"}""" }
      .mkString("", "\n", "\n")
    Files.write(f.toPath, txt.getBytes("UTF-8"))
    assert(f.setLastModified(mtime)) // file-source ordering is (mtime, path)
  }

  private def startQuery(inDir: String, lake: String, ckpt: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val sp = spark
    val bench = { import sp.implicits._; Seq("the secret eval answer is in the box").toDF("text") }
    val in = sp.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING")
      .option("maxFilesPerTrigger", 1) // deterministic batch-per-file in every run
      .json(inDir)
    val out = EventStream.curateStream(in, bench, n = 3,
      minWords = 5, watermark = "30 minutes", window_ = "10 minutes")
    out.writeStream.format("parquet")
      .option("path", lake).option("checkpointLocation", ckpt)
      .outputMode("append").start()
  }

  private def runToQuiescence(inDir: String, lake: String, ckpt: String): Unit = {
    val q = startQuery(inDir, lake, ckpt)
    try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }
  }

  /** Batch ids present in one checkpoint metadata log (offsets are
    * written when a batch STARTS, commits when it finishes — a batch
    * in `offsets -- commits` is in flight).
    */
  private def logBatches(ckpt: String, log: String): Set[Long] = {
    val d = new File(ckpt, log)
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName).filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).toSet
  }

  private def lakeRows(lake: String): Set[(Long, Long, Long, Boolean)] = {
    val sp = spark
    import sp.implicits._
    if (!new File(lake).exists()) Set.empty
    else sp.read.parquet(lake)
      .select(col("doc_id"), col("nn"), col("clean_nn"), col("admitted"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
  }

  test("restart from checkpoint == uninterrupted run; replay adds nothing") {
    val root = Files.createTempDirectory("graft_recov").toFile.getAbsolutePath
    val inI = s"$root/in_i"; val inU = s"$root/in_u"
    Seq(inI, inU).foreach(new File(_).mkdirs())

    // ---- interrupted run: session 1 sees only the data batch ----
    writeJson(inI, "a.json", docsA, 1000000L)
    runToQuiescence(inI, s"$root/lake_i", s"$root/ckpt_i")
    // nothing may emit yet: the 10:00 window is still open (watermark
    // = 09:30) — everything of value is in checkpointed STATE
    assert(lakeRows(s"$root/lake_i").isEmpty, "premature emission")

    // ---- the "crash": the query is gone; new data lands ----
    writeJson(inI, "b1.json", flush1, 2000000L)
    writeJson(inI, "b2.json", flush2, 3000000L)

    // ---- restart from the same checkpoint: must skip a.json (offsets),
    // recover dedup + window state, and emit the closed windows ----
    runToQuiescence(inI, s"$root/lake_i", s"$root/ckpt_i")
    val got = lakeRows(s"$root/lake_i")
    assert(got.nonEmpty, "restart emitted nothing — state lost")

    // ---- a third run with no new data must be a no-op (exactly once) ----
    runToQuiescence(inI, s"$root/lake_i", s"$root/ckpt_i")
    assert(lakeRows(s"$root/lake_i") == got, "replay duplicated rows")

    // ---- uninterrupted reference: same files, one query lifetime ----
    writeJson(inU, "a.json", docsA, 1000000L)
    writeJson(inU, "b1.json", flush1, 2000000L)
    writeJson(inU, "b2.json", flush2, 3000000L)
    runToQuiescence(inU, s"$root/lake_u", s"$root/ckpt_u")
    assert(got == lakeRows(s"$root/lake_u"),
      s"restarted lake != uninterrupted lake: $got vs ${lakeRows(s"$root/lake_u")}")

    // ---- content: the curation decisions themselves ----
    val byId = got.groupBy(_._1)
    assert(byId.keySet.intersect(Set(1L, 2L)).size == 1, s"dedup kept both/neither of 1,2: $got")
    assert(!byId.contains(3L), "quality-gated doc leaked")
    assert(byId(4L).head._4 == false, "bench-contaminated doc admitted")
    assert(byId(5L).head._4 == true, "clean doc not admitted")
  }

  test("hard kill (no stop()) mid-batch: restart replays through the commit log exactly once") {
    // The graceful test stops between micro-batches; this one kills the
    // query's execution thread while a batch is IN FLIGHT (its offset
    // entry written, its commit entry not) and never runs any shutdown
    // path — the closest in-process stand-in for a killed daemon
    // (main.rs's hourly loop dying mid-run). Recovery must come
    // entirely from offset/commit-log reconciliation: the restart
    // re-executes the uncommitted batch, the file-sink metadata log
    // hides the dead run's orphan files, and the final lake must be
    // byte-identical to an uninterrupted lifetime.
    val root = Files.createTempDirectory("graft_recov_kill").toFile.getAbsolutePath
    val inK = s"$root/in_k"; val inU = s"$root/in_u"
    Seq(inK, inU).foreach(new File(_).mkdirs())
    Seq(inK, inU).foreach { d =>
      writeJson(d, "a.json", docsA, 1000000L)
      writeJson(d, "b1.json", flush1, 2000000L)
      writeJson(d, "b2.json", flush2, 3000000L)
    }
    val lakeK = s"$root/lake_k"; val ckptK = s"$root/ckpt_k"

    import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
    val q = startQuery(inK, lakeK, ckptK)
    val se = q.asInstanceOf[StreamingQueryWrapper].streamingQuery
    // wait on the metadata log for a batch that is started-but-
    // uncommitted (or, if all 3 committed before we ever caught one in
    // flight, kill anyway — the equality contract below holds for ANY
    // kill point)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var sawInFlight = false; var armed = false
    while (!armed && q.isActive && System.nanoTime() < deadline) {
      sawInFlight = (logBatches(ckptK, "offsets") -- logBatches(ckptK, "commits")).nonEmpty
      armed = sawInFlight || logBatches(ckptK, "commits").size >= 3
      if (!armed) Thread.sleep(1)
    }
    assert(armed, "query never started a batch within 60 s")
    // kill loop: a single interrupt can be absorbed (caught and
    // cleared inside Hadoop/parquet code while the thread is
    // RUNNABLE), so cancel the query's job group — StreamExecution
    // runs its batches under jobGroup = runId with
    // interruptOnCancel=true — and keep interrupting the execution
    // thread until it actually dies. No stop() bookkeeping runs, so
    // StreamExecution treats the interrupt as a crash, not a stop.
    while (q.isActive && System.nanoTime() < deadline) {
      spark.sparkContext.cancelJobGroup(q.runId.toString)
      se.queryExecutionThread.interrupt()
      Thread.sleep(5)
    }
    assert(!q.isActive, "query survived 60 s of kill attempts")
    try q.awaitTermination(10000) catch {
      case _: org.apache.spark.sql.streaming.StreamingQueryException => ()
    }
    // died as a CRASH, not a graceful stop: the interrupt outside
    // stop() surfaces as a query exception
    assert(q.exception.isDefined, "kill was absorbed as a graceful stop — test lost its teeth")
    info(s"killed ${if (sawInFlight) "mid-batch (offset written, commit pending)" else "between batches"}; " +
      s"offsets=${logBatches(ckptK, "offsets").size} commits=${logBatches(ckptK, "commits").size}")

    // restart from the same checkpoint: reconcile logs, replay the
    // uncommitted batch, finish the remaining files
    runToQuiescence(inK, lakeK, ckptK)
    val got = lakeRows(lakeK)
    assert(got.nonEmpty, "restart after hard kill emitted nothing — state lost")

    // replay with no new data: exactly-once
    runToQuiescence(inK, lakeK, ckptK)
    assert(lakeRows(lakeK) == got, "replay after hard kill duplicated rows")

    // uninterrupted reference over the same files
    runToQuiescence(inU, s"$root/lake_u", s"$root/ckpt_u")
    assert(got == lakeRows(s"$root/lake_u"),
      s"post-kill lake != uninterrupted lake: $got vs ${lakeRows(s"$root/lake_u")}")
  }
}
