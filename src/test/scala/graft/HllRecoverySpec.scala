package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import java.io.File
import java.nio.file.Files

/** Hard-kill recovery for the TYPED-AGGREGATOR sketch state path
  * (VERDICT r9 item 5): hllDistinctStream's per-window state is a
  * fixed 512 B register bank carried by a udaf Aggregator buffer —
  * a DIFFERENT state-store surface than the dropDuplicates /
  * flatMapGroupsWithState state CurateRecoverySpec kills. The same
  * contract must hold: kill the execution thread with NO stop()
  * bookkeeping while a batch is in flight (offset written, commit
  * pending), restart from the checkpoint, and the emitted windows
  * must equal an uninterrupted lifetime's, with a further replay
  * adding nothing — proving the serialized aggregation buffers
  * survive offset/commit-log reconciliation.
  */
class HllRecoverySpec extends SparkSpecBase {

  // window 10:00-10:10 holds 40 distinct users for 'click' (each seen
  // twice — idempotent max must survive the replayed batch) and 7 for
  // 'view'; the flush rows advance the watermark past the window
  private val eventsA: Seq[(Long, String, Long, String, Double)] =
    (1 to 80).map(i => (i.toLong, s"2024-01-01T10:0${i % 10}:00.000Z",
      (i % 40 + 1).toLong, "click", 1.0)) ++
    (81 to 87).map(i => (i.toLong, s"2024-01-01T10:0${i % 10}:00.000Z",
      (100 + i).toLong, "view", 1.0))
  private val flush1: Seq[(Long, String, Long, String, Double)] =
    Seq((-1L, "2024-01-01T12:00:00.000Z", 9991L, "click", 0.0))
  private val flush2: Seq[(Long, String, Long, String, Double)] =
    Seq((-2L, "2024-01-01T14:00:00.000Z", 9992L, "click", 0.0))

  private def writeJson(dir: String, name: String,
      rows: Seq[(Long, String, Long, String, Double)], mtime: Long): Unit = {
    val f = new File(dir, name)
    val txt = rows.map { case (id, ts, u, et, v) =>
      s"""{"event_id":$id,"ts":"$ts","user_id":$u,"event_type":"$et","value":$v}"""
    }.mkString("", "\n", "\n")
    Files.write(f.toPath, txt.getBytes("UTF-8"))
    assert(f.setLastModified(mtime))
  }

  private def startQuery(inDir: String, lake: String, ckpt: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val in = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .json(inDir)
    EventStream.hllDistinctStream(in, window_ = "10 minutes", watermark = "30 minutes")
      .writeStream.format("parquet")
      .option("path", lake).option("checkpointLocation", ckpt)
      .outputMode("append").start()
  }

  private def runToQuiescence(inDir: String, lake: String, ckpt: String): Unit = {
    val q = startQuery(inDir, lake, ckpt)
    try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }
  }

  private def logBatches(ckpt: String, log: String): Set[Long] = {
    val d = new File(ckpt, log)
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName).filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).toSet
  }

  private def lakeRows(lake: String): Set[(String, String, Long)] = {
    val sp = spark
    import sp.implicits._
    if (!new File(lake).exists()) Set.empty
    else sp.read.parquet(lake)
      .select(col("event_type"), col("w_start").cast("string"), col("est_distinct"))
      .as[(String, String, Long)].collect().toSet
  }

  test("hard kill mid-batch: HLL register state recovers exactly once from the checkpoint") {
    val root = Files.createTempDirectory("graft_hll_kill").toFile.getAbsolutePath
    val inK = s"$root/in_k"; val inU = s"$root/in_u"
    Seq(inK, inU).foreach(new File(_).mkdirs())
    Seq(inK, inU).foreach { d =>
      writeJson(d, "a.json", eventsA, 1000000L)
      writeJson(d, "b1.json", flush1, 2000000L)
      writeJson(d, "b2.json", flush2, 3000000L)
    }
    val lakeK = s"$root/lake_k"; val ckptK = s"$root/ckpt_k"

    import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
    val q = startQuery(inK, lakeK, ckptK)
    val se = q.asInstanceOf[StreamingQueryWrapper].streamingQuery
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var sawInFlight = false; var armed = false
    while (!armed && q.isActive && System.nanoTime() < deadline) {
      sawInFlight = (logBatches(ckptK, "offsets") -- logBatches(ckptK, "commits")).nonEmpty
      armed = sawInFlight || logBatches(ckptK, "commits").size >= 3
      if (!armed) Thread.sleep(1)
    }
    assert(armed, "query never started a batch within 60 s")
    while (q.isActive && System.nanoTime() < deadline) {
      spark.sparkContext.cancelJobGroup(q.runId.toString)
      se.queryExecutionThread.interrupt()
      Thread.sleep(5)
    }
    assert(!q.isActive, "query survived 60 s of kill attempts")
    try q.awaitTermination(10000) catch {
      case _: org.apache.spark.sql.streaming.StreamingQueryException => ()
    }
    assert(q.exception.isDefined, "kill was absorbed as a graceful stop — test lost its teeth")
    info(s"killed ${if (sawInFlight) "mid-batch (offset written, commit pending)" else "between batches"}; " +
      s"offsets=${logBatches(ckptK, "offsets").size} commits=${logBatches(ckptK, "commits").size}")

    runToQuiescence(inK, lakeK, ckptK)
    val got = lakeRows(lakeK)
    assert(got.nonEmpty, "restart after hard kill emitted nothing — register state lost")

    runToQuiescence(inK, lakeK, ckptK)
    assert(lakeRows(lakeK) == got, "replay after hard kill duplicated rows")

    runToQuiescence(inU, s"$root/lake_u", s"$root/ckpt_u")
    assert(got == lakeRows(s"$root/lake_u"),
      s"post-kill lake != uninterrupted lake: $got vs ${lakeRows(s"$root/lake_u")}")

    // content: the 10:00 window's click estimate must be a sane HLL
    // output for 40 distinct (m = 64 registers puts n ≈ m/2 in the
    // high-variance band between linear counting and the raw
    // formula — the measured deterministic value is 51; what this
    // asserts is that the RECOVERED registers produce the estimator's
    // answer, not garbage — exact equality with the uninterrupted
    // run is already proven above)
    val click = got.find(r => r._1 == "click" && r._2 == "2024-01-01 10:00:00")
    assert(click.isDefined, s"missing closed window in $got")
    assert(click.get._3 >= 28 && click.get._3 <= 60,
      s"recovered estimate unreasonable for 40 distinct: ${click.get._3}")
  }
}
