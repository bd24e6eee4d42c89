package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.operators.Dedup
import java.sql.Timestamp

// top-level, NOT an inner class: UnsafeProjection codegen cannot
// instantiate an inner case class (needs the outer pointer) and
// silently drops the projection to interpreted mode
final case class NoveltyDoc(doc_id: Long, ts: Timestamp, text: String)

class NoveltyStreamSpec extends SparkSpecBase {

  test("streaming novelty at ingest equals batch ngramNovelty when arrival follows doc order") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .orderBy(col("doc_id")).limit(30)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    // batch ground truth (first introducer = min doc_id = arrival order)
    val batchDf = graft.sources.Tables.documents(spark, sfDir)
      .orderBy(col("doc_id")).limit(30)
    val batch = Dedup.ngramNovelty(batchDf, col("doc_id"), col("text"), 3)
      .select(col("doc_id"), col("nn"), col("novel"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, nn, nv) => id -> ((nn, nv)) }.toMap

    val mem = MemoryStream[NoveltyDoc]
    val out = EventStream.noveltyStream(mem.toDF(), 3, "10 minutes", "30 minutes")
    val q = out.writeStream.format("memory").queryName("novelty_out")
      .outputMode("append").start()
    try {
      // one micro-batch per doc, in doc_id order — first-introducer
      // within a batch is otherwise partition-order-dependent
      docs.zipWithIndex.foreach { case ((id, text), i) =>
        mem.addData(NoveltyDoc(id, Timestamp.valueOf(f"2024-01-01 10:${i % 50}%02d:00"), text))
        q.processAllAvailable()
      }
      // flush: advance the watermark far enough to close every window
      mem.addData(NoveltyDoc(-1L, Timestamp.valueOf("2024-01-02 10:00:00"), "flush flush flush"))
      q.processAllAvailable()
      mem.addData(NoveltyDoc(-2L, Timestamp.valueOf("2024-01-03 10:00:00"), "flush2 flush2 flush2"))
      q.processAllAvailable()

      val streamed = sp.table("novelty_out").filter(col("doc_id") >= 0)
        .select(col("doc_id"), col("nn"), col("novel"))
        .as[(Long, Long, Long)].collect()
        .map { case (id, nn, nv) => id -> ((nn, nv)) }.toMap
      // streaming emits only novel>0 docs; batch marks the rest 0
      val batchPos = batch.filter { case (_, (_, nv)) => nv > 0 }
      assert(streamed == batchPos,
        s"stream ${streamed.size} rows vs batch ${batchPos.size}: " +
          s"diff=${(streamed.toSet diff batchPos.toSet).take(3)} ${(batchPos.toSet diff streamed.toSet).take(3)}")
      // and every absent doc really had zero novelty in batch
      batch.keySet.diff(streamed.keySet).foreach { id =>
        assert(batch(id)._2 == 0L, s"doc $id absent from stream but batch novel=${batch(id)._2}")
      }
    } finally q.stop()
  }
}
