package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Stats}
import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import java.sql.Timestamp

/** hllDistinctStream: per-(type, window) estimates off the fixed
  * 512 B register bank must EQUAL the batch hllRegisters/hllEstimate
  * path on the same rows — the stream and a lake backfill can never
  * disagree — and heavy duplication must not change the registers
  * (max is idempotent).
  */
class HllStreamSpec extends SparkSpecBase {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streamed HLL distinct per window == batch register path on the same rows") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    // window 10:00-10:10: 200 distinct users, each seen 3x; window
    // 10:10-10:20: 5 distinct (small-range LC branch in a window)
    val w1 = (1 to 600).map(i => Event(i.toLong, ts(i % 10), (i % 200 + 1).toLong, "click", 1.0))
    val w2 = (601 to 615).map(i => Event(i.toLong, ts(10 + i % 5), (1000 + i % 5).toLong, "click", 1.0))
    val input = MemoryStream[Event]
    val q = EventStream.hllDistinctStream(input.toDF(),
        window_ = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("hll_out").outputMode("append").start()
    try {
      input.addData(w1 ++ w2: _*)
      q.processAllAvailable()
      input.addData(Event(999, Timestamp.valueOf("2024-01-01 12:00:00"), 9999, "x", 0.0))
      q.processAllAvailable()
      val got = sp.table("hll_out")
        .select(col("w_start").cast("string"), col("est_distinct"))
        .as[(String, Long)].collect().toMap

      val batch = (w1 ++ w2).toDF()
      def ph(b: Int, p: Long) = Dedup.polyHash(batch,
        concat(col("user_id").cast("string"), lit("/hll")), b, p)
      val wide = ph(Dedup.PolyB1, Dedup.PolyP1) * lit(Dedup.PolyP2) +
        ph(Dedup.PolyB2, Dedup.PolyP2)
      val base = batch.select(window(col("ts"), "10 minutes")("start").cast("string").as("w"),
        wide.as("wh"))
      val want = Stats.hllEstimate(
          Stats.hllRegisters(base, Seq(col("w")), col("wh")), Seq(col("w")))
        .as[(String, Long)].collect().toMap

      assert(got.view.filterKeys(want.keySet).toMap == want,
        s"stream $got != batch $want")
      // sanity on bands: 200 within ~3 sigma, 5 from the LC branch
      val big = got("2024-01-01 10:00:00")
      assert(big > 120 && big < 280, s"200-distinct window way off: $big")
      assert(got("2024-01-01 10:10:00") <= 10L)
    } finally q.stop()
  }
}
