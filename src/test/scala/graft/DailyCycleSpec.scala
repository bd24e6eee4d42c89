package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Dedup, DupState, Ingest, StateVersions}
import graft.streaming.EventStream

/** The two-family PERSISTED daily cycle (q134's contract, VERDICT r15
  * #1): one batch driver advances BOTH state dirs in lockstep —
  * ingest saved first, dup-cluster second — and a crash between the
  * two saves leaves dup exactly one version behind. The replay of the
  * same batch must re-converge both heads to the clean run's states
  * byte-for-byte: ingest's save rewrites its own version idempotently
  * (marker removed first), dup's save writes the version it never
  * got. This spec drives that crash corner directly; the happy-path
  * disk cycle is oracle-gated by q134 itself.
  */
class DailyCycleSpec extends SparkSpecBase {

  private def baseText(j: Long) = (0 until 24).map(i => s"d${j}_w$i").mkString(" ")
  private def nearText(j: Long) = baseText(j) + " graft extra marker"
  private def novelText(id: Long) = (0 until 24).map(j => s"nv${id}_$j").mkString(" ")

  private def docs(rows: (Long, String)*): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private def corpus = docs((0L to 3L).map(j => (j, baseText(j))): _*)
  // all three ingest classes AND two dup-edge classes in one batch:
  // an exact copy (chunk-gate death + dup edge), a near copy
  // (signature-gate death + dup edge), a novel doc (admitted)
  private def batch = docs((100L, baseText(0)), (101L, nearText(1)),
    (102L, novelText(102L)))

  private val (kw, k, depth, width) = (12, 16, 2, 32)

  private def tmp(tag: String) = "file://" +
    java.nio.file.Files.createTempDirectory(s"graft_cycle_$tag").toString

  /** One daily cycle over both dirs — the q134 driver shape: each
    * family loads ≤ batchId and writes v=batchId+1, ingest first.
    */
  private def cycle(ingDir: String, dupDir: String, batchId: Long,
      b: DataFrame, crashBetweenSaves: Boolean = false): Unit = {
    val (_, ist) = Ingest.loadStates(spark, ingDir, upTo = batchId)
    val (_, _, dd) = Ingest.advanceOnceDelta(b, ist, col("doc_id"), col("text"),
      kw, k, depth, width)
    Ingest.saveStatesDelta(dd, ingDir, batchId + 1)
    if (crashBetweenSaves) return
    val (_, dst) = DupState.load(spark, dupDir, upTo = batchId)
    DupState.saveDelta(DupState.advance(dst, b, col("doc_id"), col("text")),
      dupDir, batchId + 1)
  }

  private def bootstrap(ingDir: String, dupDir: String): Unit = {
    Ingest.saveStates(Ingest.initStates(corpus, col("doc_id"), col("text"),
      kw, k, depth, width), ingDir, 0L)
    DupState.save(DupState.init(corpus, col("doc_id"), col("text")), dupDir, 0L)
  }

  private def same(a: DataFrame, b: DataFrame, tag: String): Unit =
    assert(a.except(b).isEmpty && b.except(a).isEmpty, s"$tag diverged")

  private def labels(df: DataFrame): Map[Long, Long] =
    df.select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a crash between the two family saves re-converges on replay") {
    // clean control run: bootstrap + one full cycle
    val (ingC, dupC) = (tmp("ing_ctl"), tmp("dup_ctl"))
    bootstrap(ingC, dupC)
    cycle(ingC, dupC, 0L, batch)
    // crashed run: ingest's v=1 commits, the driver dies before dup's
    val (ingX, dupX) = (tmp("ing_crash"), tmp("dup_crash"))
    bootstrap(ingX, dupX)
    cycle(ingX, dupX, 0L, batch, crashBetweenSaves = true)
    assert(Ingest.loadStates(spark, ingX)._1 == 1L)
    assert(DupState.load(spark, dupX)._1 == 0L) // one version behind
    // the scheduler replays batch 0 (its cycle never acknowledged):
    // ingest rewrites v=1 idempotently, dup catches up to v=1
    cycle(ingX, dupX, 0L, batch)
    // both heads converge to the clean run's states
    val (vI, stX) = Ingest.loadStates(spark, ingX)
    val (vD, duX) = DupState.load(spark, dupX)
    assert(vI == 1L && vD == 1L)
    val (_, stC) = Ingest.loadStates(spark, ingC)
    same(stX.keepers, stC.keepers, "keepers")
    same(stX.sigs, stC.sigs, "sigs")
    same(stX.ng3, stC.ng3, "ng3")
    same(stX.ng8, stC.ng8, "ng8")
    same(stX.cms, stC.cms, "cms")
    assert(labels(duX.comp) == labels(DupState.load(spark, dupC)._2.comp))
    // and the converged assignment equals the from-scratch closure
    assert(labels(duX.comp) ==
      labels(Dedup.dedupClusters(corpus.unionByName(batch), col("doc_id"), col("text"))))
  }

  test("a bootstrap crash that left dup AHEAD of ingest re-converges on replay") {
    // r17 advice: q134/q135 OVERLAP the two bootstraps (par2), so a
    // crash in that window can leave dup v=0 committed while ingest
    // has nothing — the INVERSE of the delta steps' documented
    // dup-one-behind state. Benign at v=0: the replay re-runs both
    // bootstraps from the same corpus; saveStates/save rewrite v=0
    // idempotently (un-publish → rewrite → re-publish) and both heads
    // converge to the clean run's states with no delta above them to
    // orphan.
    val (ingC, dupC) = (tmp("ing_bctl"), tmp("dup_bctl"))
    bootstrap(ingC, dupC)
    cycle(ingC, dupC, 0L, batch)
    val (ingX, dupX) = (tmp("ing_bcrash"), tmp("dup_bcrash"))
    // crashed overlapped bootstrap: ONLY dup committed its v=0
    DupState.save(DupState.init(corpus, col("doc_id"), col("text")), dupX, 0L)
    assert(DupState.load(spark, dupX)._1 == 0L)
    intercept[IllegalArgumentException] { Ingest.loadStates(spark, ingX) }
    // replay from the top: both bootstraps re-run, then the cycle
    bootstrap(ingX, dupX)
    cycle(ingX, dupX, 0L, batch)
    val (vI, stX) = Ingest.loadStates(spark, ingX)
    val (vD, duX) = DupState.load(spark, dupX)
    assert(vI == 1L && vD == 1L)
    val (_, stC) = Ingest.loadStates(spark, ingC)
    same(stX.keepers, stC.keepers, "keepers")
    same(stX.sigs, stC.sigs, "sigs")
    same(stX.ng3, stC.ng3, "ng3")
    same(stX.ng8, stC.ng8, "ng8")
    same(stX.cms, stC.cms, "cms")
    assert(labels(duX.comp) == labels(DupState.load(spark, dupC)._2.comp))
  }

  test("sink-level crash between the family saves replays and converges on restart") {
    // the DailyCycleSpec cycle() test drives the crash corner through
    // the batch API; this one drives it through the SINK's own
    // foreachBatch + checkpoint machinery: a file-source stream whose
    // dup save FAILS mid-batch (v=1 pre-created as a plain FILE, so
    // the parquet write cannot mkdir) after ingest's v=1 committed —
    // the query dies, the blocker is cleared, and a restart on the
    // SAME checkpoint replays batch 0: ingest rewrites v=1
    // idempotently (the arithmetic guard admits the legitimate
    // replay), dup catches up, both heads converge
    val (ingDir, dupDir) = (tmp("sink_crash_ing"), tmp("sink_crash_dup"))
    val reportDir = tmp("sink_crash_rep")
    bootstrap(ingDir, dupDir)
    val dropDir = java.nio.file.Files.createTempDirectory("graft_cycle_drop").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cycle_ckpt").toString
    val stage = java.nio.file.Files.createTempDirectory("graft_cycle_stage").toString
    batch.write.mode("overwrite").parquet(stage)
    new java.io.File(stage).listFiles.filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(dropDir, f.getName)))
    // the injected crash: dup's v=1 path exists as a plain file
    val blocker = new java.io.File(dupDir.stripPrefix("file://"), "v=1")
    assert(blocker.createNewFile())
    def startQuery() = EventStream.dailyCycleStream(
        EventStream.readSnapshots(spark, dropDir, batch),
        ingDir, dupDir, reportDir, kw, k, depth, width, streamTag = Some(ckpt))
      .option("checkpointLocation", ckpt).start()
    val q1 = startQuery()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q1.processAllAvailable() finally q1.stop()
    }
    // ingest committed its half; dup is one version behind
    assert(Ingest.loadStates(spark, ingDir)._1 == 1L)
    assert(DupState.load(spark, dupDir)._1 == 0L)
    // operator clears the blocker and restarts the SAME checkpoint
    assert(blocker.delete())
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    assert(Ingest.loadStates(spark, ingDir)._1 == 1L)
    assert(DupState.load(spark, dupDir)._1 == 1L)
    assert(labels(DupState.load(spark, dupDir)._2.comp) ==
      labels(Dedup.dedupClusters(corpus.unionByName(batch), col("doc_id"), col("text"))))
    assert(spark.read.parquet(s"$reportDir/batch=0").count() == 1L)
  }

  test("recommended rebase cadences are pinned to the measured values") {
    // the constants exist so the scaladoc's cited measurements
    // (DeltaFanInProbe: optimum ≈ 4; DupFanInProbe: retention-bound,
    // conservative 8) can never drift from what callers are told to
    // wire — a probe re-measurement must update BOTH, here and there
    assert(EventStream.IngestRebaseRecommended == 4)
    assert(EventStream.DupRebaseRecommended == 8)
  }

  test("dailyCycleStream advances both families in lockstep from one batch driver") {
    val sp = spark
    import sp.implicits._
    val (ingDir, dupDir) = (tmp("sink_ing"), tmp("sink_dup"))
    val reportDir = tmp("sink_rep")
    bootstrap(ingDir, dupDir)
    val mem = MemoryStream[(Long, String)](sp)
    val q = EventStream.dailyCycleStream(mem.toDF.toDF("doc_id", "text"),
      ingDir, dupDir, reportDir, kw, k, depth, width,
      ingestRebaseEvery = Some(2), dupRebaseEvery = Some(2)).start()
    val b2 = Seq((200L, nearText(0)), (201L, novelText(201L)))
    try {
      mem.addData((100L, baseText(0)), (101L, nearText(1)), (102L, novelText(102L)))
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // lockstep heads: both chains at v=2, v=2 the rebase (full) layer
    assert(Ingest.loadStates(spark, ingDir)._1 == 2L)
    assert(DupState.load(spark, dupDir)._1 == 2L)
    // the persisted dup assignment equals the from-scratch closure
    val all = corpus.unionByName(batch).unionByName(docs(b2: _*))
    assert(labels(DupState.load(spark, dupDir)._2.comp) ==
      labels(Dedup.dedupClusters(all, col("doc_id"), col("text"))))
    // per-batch reports carry the ingest counters plus the dup head size
    val r = spark.read.parquet(s"$reportDir/batch=1")
    assert(r.columns.contains("n_dup_assign") && r.count() == 1L)
    assert(r.select(col("n_batch")).head.getLong(0) == 2L)
  }

  test("the sink's report row value-equals the batch API's report on the same batch") {
    // stretch r16 #9: the lockstep test pins the report's SHAPE and
    // n_batch; this pins every ingest counter VALUE to what the batch
    // API (q134's driver shape) computes on the same bootstrap+batch,
    // so the sink's report row cannot drift from the entry's
    val sp = spark
    import sp.implicits._
    val (ingDir, dupDir) = (tmp("rep_ing"), tmp("rep_dup"))
    val reportDir = tmp("rep_rep")
    bootstrap(ingDir, dupDir)
    val (_, ist) = Ingest.loadStates(spark, ingDir, upTo = 0L)
    val (expReport, _, _) = Ingest.advanceOnceDelta(batch, ist,
      col("doc_id"), col("text"), kw, k, depth, width)
    val expCols = expReport.columns.toSeq
    val exp = expReport.collect().head
    val mem = MemoryStream[(Long, String)](sp)
    val q = EventStream.dailyCycleStream(mem.toDF.toDF("doc_id", "text"),
      ingDir, dupDir, reportDir, kw, k, depth, width).start()
    mem.addData((100L, baseText(0)), (101L, nearText(1)), (102L, novelText(102L)))
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$reportDir/batch=0")
    // full column contract: the advance report plus exactly the two
    // sink-added columns
    assert(got.columns.sorted.toSeq == (expCols ++ Seq("batch_id", "n_dup_assign")).sorted,
      s"report columns drifted: ${got.columns.mkString(",")}")
    assert(got.select(expCols.map(col): _*).collect().head == exp,
      "sink report values diverged from the batch API's advance report")
    assert(got.select(col("n_dup_assign")).head.getLong(0) ==
      DupState.load(spark, dupDir)._2.comp.count())
  }

  test("streamTag rejects a fresh checkpoint even after exactly one advance") {
    val sp = spark
    import sp.implicits._
    // chain advanced exactly ONCE under stream A: this is the
    // one-advance hole where version arithmetic alone cannot tell a
    // fresh checkpoint's batch 0 from a legitimate replay (max
    // committed = 1 ≤ batchId + 1)
    val dir = tmp("tag")
    DupState.save(DupState.init(corpus, col("doc_id"), col("text")), dir, 0L)
    StateVersions.requireStreamTag(spark, dir, "ckpt/A", "dup-cluster") // A adopts
    val st0 = DupState.load(spark, dir, upTo = 0L)._2
    DupState.saveDelta(DupState.advance(st0, docs((100L, baseText(0))),
      col("doc_id"), col("text")), dir, 1L)
    // same tag: a genuine replay of stream A passes the guard
    StateVersions.requireStreamTag(spark, dir, "ckpt/A", "dup-cluster")
    // stream B (fresh checkpoint, batch ids restart at 0) is rejected
    // on its FIRST batch — before the arithmetic guard would pass it
    val mem = MemoryStream[(Long, String)](sp)
    val q = EventStream.dupClusterStream(mem.toDF.toDF("doc_id", "text"), dir,
      streamTag = Some("ckpt/B")).start()
    mem.addData((300L, baseText(2)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("pinned to stream"), s"got: ${e.getMessage}")
    // nothing was written: head still v=1, assignment intact
    assert(DupState.load(spark, dir)._1 == 1L)
    assert(labels(DupState.load(spark, dir)._2.comp) ==
      labels(Dedup.dedupClusters(corpus.unionByName(docs((100L, baseText(0)))),
        col("doc_id"), col("text"))))
  }

  test("recreating the checkpoint at the SAME path is rejected by the query-id pin") {
    // VERDICT r16 #3: the location-string tag matched a
    // deleted-and-recreated checkpoint at the same path by
    // construction, reopening the one-advance rewrite window for
    // exactly the "operator wiped the corrupt checkpoint dir"
    // mistake. The tag now carries the checkpoint's query id
    // (StateVersions.tagFromCheckpoint), which Spark REGENERATES on
    // recreation — so run 2 is rejected on its first batch
    val sp = spark
    import sp.implicits._
    val dir = tmp("tag_same_path")
    DupState.save(DupState.init(corpus, col("doc_id"), col("text")), dir, 0L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tag_ckpt").toString
    // run 1: advance the chain exactly ONCE under checkpoint `ckpt`
    val mem1 = MemoryStream[(Long, String)](sp)
    val q1 = EventStream.dupClusterStream(mem1.toDF.toDF("doc_id", "text"), dir,
      streamTag = Some(ckpt)).option("checkpointLocation", ckpt).start()
    mem1.addData((100L, baseText(0)))
    try q1.processAllAvailable() finally q1.stop()
    assert(DupState.load(spark, dir)._1 == 1L)
    // the operator mistake: wipe the checkpoint and start "fresh" at
    // the SAME path — batch ids restart at 0, arithmetic alone would
    // admit the v=1 rewrite (max = 1 ≤ 0 + 1)
    def rmAll(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmAll)); f.delete()
    }
    rmAll(new java.io.File(ckpt))
    val mem2 = MemoryStream[(Long, String)](sp)
    val q2 = EventStream.dupClusterStream(mem2.toDF.toDF("doc_id", "text"), dir,
      streamTag = Some(ckpt)).option("checkpointLocation", ckpt).start()
    mem2.addData((300L, baseText(2)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(e.getMessage.contains("pinned to stream"), s"got: ${e.getMessage}")
    // chain intact: head still v=1, v=1's data unreplaced
    assert(DupState.load(spark, dir)._1 == 1L)
    assert(labels(DupState.load(spark, dir)._2.comp) ==
      labels(Dedup.dedupClusters(corpus.unionByName(docs((100L, baseText(0)))),
        col("doc_id"), col("text"))))
  }

  test("an arithmetic rejection does not leave a wrong-stream pin behind") {
    // ADVICE r16 (medium): the guards used to run tag-first, so a
    // misdirected fresh checkpoint against an untagged ≥2-advanced
    // chain ADOPTED the tag and only then failed arithmetic — pinning
    // the dir to the wrong stream and blocking the legitimate
    // checkpoint's resume. Arithmetic now runs first: the rejection
    // must leave NO _STREAM_TAG
    val sp = spark
    import sp.implicits._
    val dir = tmp("tag_order")
    DupState.save(DupState.init(corpus, col("doc_id"), col("text")), dir, 0L)
    val st0 = DupState.load(spark, dir, upTo = 0L)._2
    DupState.saveDelta(DupState.advance(st0, docs((100L, baseText(0))),
      col("doc_id"), col("text")), dir, 1L)
    val st1 = DupState.load(spark, dir, upTo = 1L)._2
    DupState.saveDelta(DupState.advance(st1, docs((101L, nearText(1))),
      col("doc_id"), col("text")), dir, 2L)
    val mem = MemoryStream[(Long, String)](sp)
    val q = EventStream.dupClusterStream(mem.toDF.toDF("doc_id", "text"), dir,
      streamTag = Some("ckpt/wrong")).start()
    mem.addData((300L, baseText(2)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("does not match the state dir's history"),
      s"got: ${e.getMessage}")
    assert(!new java.io.File(dir.stripPrefix("file://"),
      StateVersions.StreamTagMarker).exists(), "arithmetic rejection left a tag pin")
  }

  test("an empty stream-tag marker is treated as absent and rewritten") {
    // ADVICE r16 (low): tag adoption used create-then-write — a crash
    // between the two left a zero-byte marker that pinned every later
    // batch to stream ''. Adoption now publishes via temp+rename, and
    // an empty marker reads as ABSENT
    val dir = tmp("tag_empty")
    DupState.save(DupState.init(corpus, col("doc_id"), col("text")), dir, 0L)
    val marker = new java.io.File(dir.stripPrefix("file://"),
      StateVersions.StreamTagMarker)
    assert(marker.createNewFile() && marker.length() == 0L)
    StateVersions.requireStreamTag(spark, dir, "ckpt/X", "dup-cluster") // adopts
    assert(marker.length() > 0L)
    StateVersions.requireStreamTag(spark, dir, "ckpt/X", "dup-cluster") // same passes
    val e = intercept[IllegalArgumentException] {
      StateVersions.requireStreamTag(spark, dir, "ckpt/Y", "dup-cluster")
    }
    assert(e.getMessage.contains("pinned to stream 'ckpt/X'"), s"got: ${e.getMessage}")
  }
}
