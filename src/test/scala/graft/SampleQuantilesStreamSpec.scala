package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Stats}
import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import java.sql.Timestamp

/** sampleQuantilesStream: the ≤ k (hash, value) buffer per window
  * must select the SAME sample as the batch kmvRowSample threshold on
  * identical rows (hash ties absent at 53 bits), so per-window
  * quantiles equal a lake backfill through q121's path — and a window
  * with ≤ k rows reproduces its exact quantiles (sample ≡ window).
  */
class SampleQuantilesStreamSpec extends SparkSpecBase {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streamed sample quantiles per window == batch kmvRowSample path on the same rows") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    val K = 32
    // window 10:00-10:10: 500 rows (sampling engages, 500 > k);
    // window 10:10-10:20: 20 rows (below k — sample IS the window,
    // quantiles must be exact)
    val w1 = (1 to 500).map(i =>
      Event(i.toLong, ts(i % 10), i.toLong, "click", (i * 37 % 500) + 0.25))
    val w2 = (1001 to 1020).map(i =>
      Event(i.toLong, ts(10 + i % 5), i.toLong, "click", (i % 20) * 2.0))
    val input = MemoryStream[Event]
    val q = EventStream.sampleQuantilesStream(input.toDF(), k = K,
        window_ = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("sq_out").outputMode("append").start()
    try {
      input.addData(w1 ++ w2: _*)
      q.processAllAvailable()
      input.addData(Event(9999, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "x", 0.0))
      q.processAllAvailable()
      val got = sp.table("sq_out")
        .select(col("w_start").cast("string"), col("n_sample"),
          col("p50_s"), col("p90_s"), col("p99_s"))
        .as[(String, Long, Double, Double, Double)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap

      // batch replay: same wide hash, kmvRowSample per window key
      val batch = (w1 ++ w2).toDF()
      def ph(b: Int, p: Long) = Dedup.polyHash(batch,
        concat(col("event_id").cast("string"), lit("/qs")), b, p)
      val w = pmod(ph(Dedup.PolyB1, Dedup.PolyP1) * lit(Dedup.PolyP2) +
        ph(Dedup.PolyB2, Dedup.PolyP2), lit(1L << 53))
      val base = batch.select(
        window(col("ts"), "10 minutes")("start").cast("string").as("wk"),
        col("value"), w.as("w"))
      val want = Stats.kmvRowSample(base, Seq("wk"), col("w"), K)
        .groupBy(col("wk")).agg(sort_array(collect_list(col("value"))).as("sv"))
        .select(col("wk"), size(col("sv")).cast("long").as("ns"),
          expr("element_at(sv, CAST(1 + (50*(size(sv)-1)) DIV 100 AS INT))"),
          expr("element_at(sv, CAST(1 + (90*(size(sv)-1)) DIV 100 AS INT))"),
          expr("element_at(sv, CAST(1 + (99*(size(sv)-1)) DIV 100 AS INT))"))
        .as[(String, Long, Double, Double, Double)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap

      assert(got.view.filterKeys(want.keySet).toMap == want,
        s"stream $got != batch $want")

      // below-k window: quantiles are the window's exact quantiles
      val small = got("2024-01-01 10:10:00")
      assert(small._1 == 20L)
      val sv = w2.map(_.value).sorted
      assert(small._2 == sv(1 + (50 * 19) / 100 - 1))
      assert(small._4 == sv(1 + (99 * 19) / 100 - 1))
    } finally q.stop()
  }

  test("boundary hash tie: stream buffer truncates to k, batch threshold enlarges (documented divergence)") {
    // The one place the two faces CAN differ (KmvSampleAgg.scala
    // boundary contract): rows tied at the k-th smallest hash. The
    // batch threshold filter keeps EVERY row with hash ≤ threshold
    // (multiset semantics — the sample may exceed k); the stream's
    // bounded buffer keeps exactly k, tie-broken by (hash, value)
    // ascending. At 53 hash bits this needs a planted collision
    // (~2^-53 naturally) — VERDICT r9 item 6 asked for the planted
    // case, not just the tie-free parity above.
    val sp = spark
    import sp.implicits._
    val K = 4
    // hashes 1,2,3 below the boundary; THREE rows tied at hash 10 =
    // the k-th smallest; values distinguish the tied rows
    val rows = Seq((1L, 101.0), (2L, 102.0), (3L, 103.0),
      (10L, 5.0), (10L, 6.0), (10L, 7.0))
      .map { case (h, v) => ("g", h, v) }.toDF("grp", "h", "v")

    // batch face: threshold = 4th smallest hash = 10 → ALL tied rows
    // pass the ≤ filter — the sample ENLARGES to 6
    val batch = graft.operators.Stats.kmvRowSample(rows, Seq("grp"), col("h"), K)
      .select(col("v")).as[Double].collect().sorted.toSeq
    assert(batch == Seq(5.0, 6.0, 7.0, 101.0, 102.0, 103.0),
      s"batch must keep every boundary tie: $batch")

    // stream face (same udaf the windowed stream carries as state):
    // exactly k rows, the tie resolved to the SMALLEST tied value
    val stream = rows.groupBy(col("grp"))
      .agg(graft.functions.KmvSampleAgg.sample(K)(col("h"), col("v")).as("sp"))
      .select(explode(col("sp")).as("p")).select(col("p._2")).as[Double]
      .collect().sorted.toSeq
    assert(stream == Seq(5.0, 101.0, 102.0, 103.0),
      s"stream must truncate to k keeping (hash, value)-smallest: $stream")

    // the divergence is CONTAINED: stream sample ⊆ batch sample, and
    // they agree exactly on everything below the boundary
    assert(stream.toSet.subsetOf(batch.toSet))
  }
}
