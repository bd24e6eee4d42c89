package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, SessionOut}
import java.sql.Timestamp

class StreamingSpec extends SparkSpecBase {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed rollup with watermark aggregates per user+window") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedRollup(input.toDF(), "10 minutes", "20 minutes")
      .writeStream.format("memory").queryName("rollup_out").outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(1), 7, "click", 5.0), Event(2, ts(4), 7, "click", 9.0),
        Event(3, ts(12), 7, "view", 1.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData(Event(4, Timestamp.valueOf("2024-01-01 11:30:00"), 8, "click", 2.0))
      q.processAllAvailable()
      val out = sp.table("rollup_out").select("user_id", "low", "high", "n")
        .as[(Long, Double, Double, Long)].collect().toSet
      assert(out.contains((7L, 5.0, 9.0, 2L)))
      assert(out.contains((7L, 1.0, 1.0, 1L)))
    } finally q.stop()
  }

  test("stateful stream sessionization emits sessions after gap timeout") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionizeStream(input.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      input.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(2), 7, "click", 2.0))
      q.processAllAvailable()
      // a much later event closes user 7's session via inline gap split,
      // and advances the watermark so the timeout fires
      input.addData(Event(3, Timestamp.valueOf("2024-01-01 12:00:00"), 7, "click", 4.0))
      q.processAllAvailable()
      input.addData(Event(4, Timestamp.valueOf("2024-01-01 14:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
      val out = sp.table("sess_out").as[SessionOut].collect()
      val first = out.find(_.session_start == ts(0).getTime)
      assert(first.exists(s => s.n_events == 2 && s.total_value == 3.0))
    } finally q.stop()
  }
}

class SessionizeParitySpec extends SparkSpecBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.functions._
  import graft.streaming.EventStream
  import graft.operators.Rollups
  import java.sql.Timestamp

  test("stream sessionization equals the batch sessionize rollup on real events") {
    val spark2 = spark
    import spark2.implicits._
    val gapMs = 1800000L
    val raw = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Event].collect().toSeq

    // batch ground truth: (user_id, start_ms) -> (n_events, total_value)
    val batch = Rollups.sessionize(
        graft.sources.Tables.events(spark, sfDir).withColumn("ms", expr("ts_ns div 1000000")),
        col("user_id"), col("ms"), col("event_id"), gapMs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n"), min(col("ms")).as("start_ms"),
        sum(col("value")).as("total"))
      .select(col("user_id"), col("start_ms"), col("n"), col("total"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (u, st, n, t) => (u, st) -> (n, t) }.toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val out = EventStream.sessionizeStream(mem.toDS(), gapMs)
    val q = out.writeStream.format("memory").queryName("sess_equiv")
      .outputMode("append").start()
    try {
      mem.addData(raw)
      q.processAllAvailable()
      // advance the watermark far past every session's gap so all
      // remaining state times out and emits
      val maxTs = raw.map(_.ts.getTime).max
      mem.addData(EventStream.Event(-1L, new Timestamp(maxTs + 10L * gapMs), -1L, "flush", 0.0))
      q.processAllAvailable()
      mem.addData(EventStream.Event(-2L, new Timestamp(maxTs + 20L * gapMs), -1L, "flush2", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_equiv")
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("session_start"), col("n_events"), col("total_value"))
        .as[(Long, Long, Long, Double)].collect()
        .map { case (u, st, n, t) => (u, st) -> (n, t) }.toMap
      assert(streamed.keySet == batch.keySet,
        s"stream vs batch sessions differ: ${streamed.keySet.diff(batch.keySet).size} extra, ${batch.keySet.diff(streamed.keySet).size} missing of ${batch.size}")
      // counts exact; value totals to float tolerance (batch sums in
      // partition order, the stream folds in (ts, event_id) order)
      val bad = streamed.collect { case (key, (n, t)) =>
        val (bn, bt) = batch(key)
        (key, n, bn, t, bt)
      }.filter { case (_, n, bn, t, bt) => n != bn || math.abs(t - bt) > 1e-6 }
      assert(bad.isEmpty, s"per-session mismatch: ${bad.take(3)}")
    } finally q.stop()
  }
}

class StreamingDedupSpec extends SparkSpecBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import java.sql.Timestamp

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  test("ingest-time simhash dedup keeps one doc per signature within the watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val input = MemoryStream[Doc]
    val q = EventStream.dedupBySimhash(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        Doc(1, t0, "the quick brown fox jumps over the lazy dog"),
        Doc(2, t0, "the quick brown fox jumps over the lazy dog"), // exact dup
        Doc(3, t0, "a completely different document about spark engines"))
      q.processAllAvailable()
      input.addData( // same text again, still inside the watermark window
        Doc(4, Timestamp.valueOf("2024-01-01 10:05:00"), "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      val out = sp.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(out.intersect(Set(1L, 2L, 4L)).size == 1, s"expected one survivor of the dup group, got $out")
      assert(out.contains(3L))
      // signature column is stamped by the native kernel at ingest
      val sh = sp.table("dedup_out").select("sh").as[Long].collect()
      assert(sh.distinct.length == sh.length)
    } finally q.stop()
  }
}

class StreamingChunkDedupSpec extends SparkSpecBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import java.sql.Timestamp

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  test("streaming chunk dedup matches batch chunkDedup when docs arrive in id order") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val docs = Seq(
      (1L, "a b c d e f"), // 3 chunks
      (2L, "a b c d e f"), // exact copy — every chunk duplicates doc 1
      (3L, "a b x y"),     // first chunk duplicates doc 1, keeps "x y"
      (4L, "q r q r")      // within-doc duplicate: one "q r" survives
    )
    val input = MemoryStream[Doc]
    val q = EventStream.chunkDedupStream(input.toDF(), 2, "10 minutes")
      .writeStream.format("memory").queryName("chunk_out").outputMode("append").start()
    try {
      // one microbatch per doc: arrival order = doc_id order, which is
      // exactly the regime where stream ≡ batch
      docs.foreach { case (id, text) =>
        input.addData(Doc(id, t0, text)); q.processAllAvailable()
      }
      val streamed = sp.table("chunk_out")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(struct(col("idx"), col("chunk")))),
            x => x.getField("chunk")), " ").as("text_kept"))
        .orderBy("doc_id")
        .select("doc_id", "n_kept", "text_kept").as[(Long, Long, String)].collect().toSeq
      val batch = graft.operators.Dedup.chunkDedup(
          docs.toDF("doc_id", "text"), col("doc_id"), col("text"), 2)
        .orderBy("doc_id")
        .select("doc_id", "n_kept", "text_kept").as[(Long, Long, String)].collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}

class StreamIntervalJoinSpec extends SparkSpecBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import graft.streaming.EventStream
  import graft.streaming.EventStream.Event
  import java.sql.Timestamp

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("stream-stream interval join matches events within the time window only") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = EventStream.intervalJoin(
      purchases.toDF(), clicks.toDF(), before = "5 minutes", after = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ij_out").outputMode("append").start()
    try {
      clicks.addData(
        Event(10, ts(1), 7, "click", 1.0),   // within 5 min of the purchase at :04
        Event(11, ts(20), 7, "click", 2.0),  // outside
        Event(12, ts(3), 8, "click", 3.0))   // other user
      purchases.addData(Event(50, ts(4), 7, "purchase", 9.0))
      q.processAllAvailable()
      // advance both watermarks so state for the early rows is evictable
      clicks.addData(Event(13, Timestamp.valueOf("2024-01-01 13:00:00"), 1, "click", 0.0))
      purchases.addData(Event(51, Timestamp.valueOf("2024-01-01 13:00:00"), 1, "purchase", 0.0))
      q.processAllAvailable()
      val out = sp.table("ij_out").select("l_id", "r_id")
        .as[(Long, Long)].collect().toSet
      assert(out.contains((50L, 10L)), "in-window same-user click must join")
      assert(!out.exists(_._2 == 11L), "click outside the interval must not join")
      assert(!out.exists(_._2 == 12L), "other user's click must not join")
    } finally q.stop()
  }
}

class StreamIntervalParitySpec extends SparkSpecBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.functions._
  import graft.streaming.EventStream
  import graft.streaming.EventStream.Event
  import java.sql.Timestamp

  test("stream interval join equals the batch bounded-range join on real events") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    // ms-floored timestamps on the stream side so both formulations
    // compare the identical integer instant
    val evs = graft.sources.Tables.events(sp, sfDir)
      .withColumn("ms", expr("ts_ns div 1000000"))
      .select(col("event_id"), col("ms"), col("user_id"), col("event_type"), col("value"))
      .collect().map(r => Event(r.getLong(0), new Timestamp(r.getLong(1)), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val joined = EventStream.intervalJoin(
      purchases.toDF().filter(col("event_type") === "purchase"),
      clicks.toDF().filter(col("event_type") === "click"),
      before = "5 minutes", after = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("parity_out").outputMode("append").start()
    val stream = try {
      purchases.addData(evs.toIndexedSeq)
      clicks.addData(evs.toIndexedSeq)
      q.processAllAvailable()
      sp.table("parity_out").groupBy(col("l_id")).count()
        .as[(Long, Long)].collect().toMap
    } finally q.stop()
    val e = graft.sources.Tables.events(sp, sfDir).withColumn("ms", expr("ts_ns div 1000000"))
    val pur = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        (col("ms") - 300000L).as("w_start"), (col("ms") + 300000L).as("w_end"))
    val clk = e.filter(col("event_type") === "click").select(col("user_id"), col("ms").as("cms"))
    val batch = graft.operators.Rollups
      .boundedRangeJoin(pur, clk, "user_id", "w_start", "w_end", "cms", 600000L)
      .groupBy(col("pid")).count().as[(Long, Long)].collect().toMap
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"stream vs batch mismatch: only-stream=${(stream.toSet diff batch.toSet).take(3)} only-batch=${(batch.toSet diff stream.toSet).take(3)}")
  }
}
