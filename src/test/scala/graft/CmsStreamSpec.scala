package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Stats}
import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import java.sql.Timestamp

/** cmsHeavyStream: a closed window's flattened cell bank, unflattened
  * by Stats.cmsBankRows, must EQUAL the batch Stats.cmsCells table on
  * the same rows CELL BY CELL (sums — so a persisted lake sketch
  * advances from stream banks via cmsMerge exactly), and probing the
  * bank with the shared Stats.cmsEstimate must report every planted
  * heavy key at est ≥ its true count (CMS never undercounts).
  */
class CmsStreamSpec extends SparkSpecBase {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streamed CMS cell bank per window == batch cmsCells on the same rows") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    val (depth, width) = (4, 256)
    // one 10-minute window: user 7 is a planted heavy hitter (300
    // hits), users 100-199 one hit each
    val heavy = (1 to 300).map(i => Event(i.toLong, ts(i % 10), 7L, "click", 1.0))
    val tail = (301 to 400).map(i => Event(i.toLong, ts(i % 10), (i - 201).toLong, "view", 1.0))
    val input = MemoryStream[Event]
    val q = EventStream.cmsHeavyStream(input.toDF(), depth, width,
        window_ = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("cms_out").outputMode("append").start()
    try {
      input.addData(heavy ++ tail: _*)
      q.processAllAvailable()
      input.addData(Event(999, Timestamp.valueOf("2024-01-01 12:00:00"), 9999, "x", 0.0))
      q.processAllAvailable()
      val bank = sp.table("cms_out")
        .filter(col("w_start").cast("string") === "2024-01-01 10:00:00")
      assert(bank.count() == 1)
      assert(bank.select(col("n_rows")).as[Long].head() == 400L)

      val streamCells = Stats.cmsBankRows(bank, col("cells"), width)
        .as[(Int, Long, Long)].collect().toSet

      val batch = (heavy ++ tail).toDF()
      val h = Dedup.polyHash(batch,
        concat(col("user_id").cast("string"), lit("/cms")), Dedup.PolyB1, Dedup.PolyP1)
      val occ = batch.select(h.as("h"))
      val batchCells = Stats.cmsCells(occ, col("h"), depth, width)
        .select(col("s"), col("bucket"), col("cell"))
        .as[(Int, Long, Long)].collect().toSet
      assert(streamCells == batchCells, "stream bank != batch cell table")

      // shared estimate probe: the planted hitter reads ≥ its true
      // count through the SAME cmsEstimate the batch/oracle path uses
      val cand = occ.distinct().select(col("h").as("ng"))
      val est = Stats.cmsEstimate(Stats.cmsBankRows(bank, col("cells"), width),
          cand, depth, width)
      val hHeavy = batch.filter(col("user_id") === 7L).select(h.as("ng")).distinct()
        .as[Long].head()
      val eHeavy = est.filter(col("ng") === hHeavy).select(col("est")).as[Long].head()
      assert(eHeavy >= 300L, s"CMS undercounted the planted hitter: $eHeavy")
    } finally q.stop()
  }
}
