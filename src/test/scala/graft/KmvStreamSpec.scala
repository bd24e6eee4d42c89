package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Kmv}
import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import java.sql.Timestamp

/** kmvDistinctStream: per-(type, window) distinct-user estimates off
  * a bounded state-store sketch must EQUAL the batch Kmv path on the
  * same rows — the stream and a lake backfill can never disagree —
  * and windows under k report exactly.
  */
class KmvStreamSpec extends SparkSpecBase {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streamed KMV distinct per window == batch sketch on the same rows; exact below k") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    val K = 8
    // window 10:00-10:10: users 1..20 with heavy repeats (40 events,
    // 20 distinct — above k, estimator engages); window 10:10-10:20:
    // users 100..103 (below k — must be EXACT)
    val w1 = (1 to 40).map(i => Event(i.toLong, ts(i % 10), (i % 20 + 1).toLong, "click", 1.0))
    val w2 = (41 to 48).map(i => Event(i.toLong, ts(10 + i % 5), (100 + i % 4).toLong, "click", 1.0))
    val input = MemoryStream[Event]
    val q = EventStream.kmvDistinctStream(input.toDF(), k = K,
        window_ = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("kmv_out").outputMode("append").start()
    try {
      input.addData(w1 ++ w2: _*)
      q.processAllAvailable()
      // watermark push to close both windows
      input.addData(Event(99, Timestamp.valueOf("2024-01-01 12:00:00"), 999, "x", 0.0))
      q.processAllAvailable()
      val got = sp.table("kmv_out")
        .select(col("w_start").cast("string"), col("est_distinct"))
        .as[(String, Long)].collect().toMap

      // batch replay of the same rows through the batch operator
      val batch = (w1 ++ w2).toDF()
      val h = Dedup.polyHash(batch,
        concat(col("user_id").cast("string"), lit("/kmv")), Dedup.PolyB1, Dedup.PolyP1)
      val want = Kmv.sketch(
          batch.select(window(col("ts"), "10 minutes")("start").cast("string").as("w"), h.as("h")),
          Seq(col("w")), col("h"), K)
        .select(col("w"), Kmv.estimate(col("ks"), K, Dedup.PolyP1).as("est"))
        .as[(String, Long)].collect().toMap

      assert(got.view.filterKeys(want.keySet).toMap == want,
        s"stream $got != batch $want")
      assert(got("2024-01-01 10:10:00") == 4L, s"below-k window not exact: $got")
      assert(got("2024-01-01 10:00:00") > 0L)
    } finally q.stop()
  }
}
