package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import java.sql.Timestamp

/** The composite curation-at-ingest flagship: quality gate → simhash
  * dedup → stream-static benchmark decontamination → per-doc admit.
  * Hand-built docs where each stage's decision is derivable by eye.
  */
// top-level, NOT an inner class: Spark's UnsafeProjection codegen
// cannot instantiate an inner case class (needs the outer pointer)
// and silently drops the whole projection to interpreted mode
final case class CurateDoc(doc_id: Long, ts: Timestamp, text: String)

class CurateStreamSpec extends SparkSpecBase {

  test("curateStream gates quality, drops dup signatures, flags bench overlap, admits the clean") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext

    // bench suite contributes 3-grams from one sentence
    val bench = Seq("the secret eval answer is in the box").toDF("text")

    val clean = "the quick brown fox jumps over a lazy dog and runs to the hills"
    val docs = Seq(
      (1L, clean),                                    // admitted
      (2L, clean),                                    // same signature -> deduped out
      (3L, "short of a text"),                        // quality fail (4 words < minWords 5)
      (4L, "we know the secret eval answer is in the box of tricks"), // bench 3-grams -> admitted=false
      (5L, "a completely fresh and clean document about the weather in lisbon today")) // admitted

    val mem = MemoryStream[CurateDoc]
    val out = EventStream.curateStream(mem.toDF(), bench, n = 3,
      minWords = 5, watermark = "30 minutes", window_ = "10 minutes")
    val q = out.writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    try {
      docs.foreach { case (id, text) =>
        mem.addData(CurateDoc(id, Timestamp.valueOf("2024-01-01 10:00:00"), text))
        q.processAllAvailable()
      }
      // flush: two far-future docs push the watermark past the window
      mem.addData(CurateDoc(-1L, Timestamp.valueOf("2024-01-02 10:00:00"), "the flush doc is a real document with words"))
      q.processAllAvailable()
      mem.addData(CurateDoc(-2L, Timestamp.valueOf("2024-01-03 10:00:00"), "the second flush doc is also a real document"))
      q.processAllAvailable()

      val rows = sp.table("curate_out").filter(col("doc_id") >= 0)
        .select(col("doc_id"), col("nn"), col("clean_nn"), col("admitted"))
        .as[(Long, Int, Long, Boolean)].collect().toSeq.sortBy(_._1)

      assert(rows.map(_._1) == Seq(1L, 4L, 5L)) // 2 deduped, 3 quality-gated
      val byId = rows.map(r => r._1 -> r).toMap
      assert(byId(1L)._4, "doc 1 should be admitted")
      assert(byId(5L)._4, "doc 5 should be admitted")
      assert(!byId(4L)._4, "doc 4 overlaps the bench suite")
      // doc 4: 11 distinct 3-grams; the 6 bench 3-grams of the shared
      // 8-word span appear; "answer is in"/"is in the" etc. are hits
      assert(byId(4L)._2 > byId(4L)._3, "doc 4 must have contaminated n-grams")
      assert(byId(1L)._2 == byId(1L)._3 && byId(1L)._2 > 0)
    } finally q.stop()
  }

  test("curateStream equals the batch gate+dedup+decontaminate chain on real documents") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    import graft.operators.{Dedup, TextAnalysis => TA}

    val base = graft.sources.Tables.documents(spark, sfDir)
      .orderBy(col("doc_id")).limit(40)
      .select(col("doc_id"), col("text"))
    // plant an exact duplicate (dedup must drop it) — the real corpus
    // has none inside 40 docs
    val docs = base.unionByName(base.filter(col("doc_id") === 3)
        .select((col("doc_id") + 9000).as("doc_id"), col("text")))
      .as[(Long, String)].collect().sortBy(_._1)
    val bench = base.filter(col("doc_id") < 5).select(col("text")) // first docs double as the bench suite

    // batch reference: same gate, first-keep per signature (arrival =
    // id order), then "any bench 8-gram" contamination
    val gated = docs.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        TA.gopherFlags(base, col("text"), 5, 100000).last.as("pass"))
      .filter(col("pass") === 1)
      .withColumn("sh", call_function("graft_simhash62", col("text")))
    val kept = gated.groupBy(col("sh")).agg(min(col("doc_id")).as("doc_id"))
      .join(gated, Seq("doc_id", "sh"))
    val benchNg = bench.select(explode(Dedup.hashedNgrams(bench, col("text"), 8)).as("ng")).distinct()
    val expect = kept
      .select(col("doc_id"), Dedup.hashedNgrams(kept, col("text"), 8).as("ngs"))
      .select(col("doc_id"), size(col("ngs")).as("nn"), explode_outer(col("ngs")).as("ng"))
      .join(benchNg.withColumn("hit", lit(1)), Seq("ng"), "left")
      .groupBy(col("doc_id"), col("nn"))
      .agg(count(when(col("ng").isNotNull && col("hit").isNull, 1)).as("clean_nn"))
      .select(col("doc_id"), col("nn"), col("clean_nn"),
        (col("clean_nn") === col("nn")).as("admitted"))
      .as[(Long, Int, Long, Boolean)].collect().toSet

    val mem = MemoryStream[CurateDoc]
    val out = EventStream.curateStream(mem.toDF(), bench, n = 8,
      minWords = 5, watermark = "30 minutes", window_ = "10 minutes")
    val q = out.writeStream.format("memory").queryName("curate_par")
      .outputMode("append").start()
    try {
      docs.foreach { case (id, text) =>
        mem.addData(CurateDoc(id, Timestamp.valueOf("2024-01-01 10:00:00"), text))
        q.processAllAvailable()
      }
      mem.addData(CurateDoc(-1L, Timestamp.valueOf("2024-01-02 10:00:00"), "the flush doc is a real document with words"))
      q.processAllAvailable()
      mem.addData(CurateDoc(-2L, Timestamp.valueOf("2024-01-03 10:00:00"), "the second flush doc is also a real document"))
      q.processAllAvailable()
      val streamed = sp.table("curate_par").filter(col("doc_id") >= 0)
        .select(col("doc_id"), col("nn"), col("clean_nn"), col("admitted"))
        .as[(Long, Int, Long, Boolean)].collect().toSet
      assert(streamed == expect,
        s"missing=${(expect -- streamed).take(3)} extra=${(streamed -- expect).take(3)}")
      assert(expect.exists(!_._4), "bench overlap must reject at least one doc")
      assert(!streamed.exists(_._1 == 9003L), "planted duplicate must be deduped")
    } finally q.stop()
  }

  test("curateStream admits zero-ngram docs that pass quality (trivially clean)") {
    val sp = spark
    import sp.implicits._
    implicit val sc = sp.sqlContext
    val bench = Seq("irrelevant bench content here").toDF("text")
    val mem = MemoryStream[CurateDoc]
    // n = 16 > doc length (13 words) -> zero n-grams; doc passes the
    // gate (13 words, >= 2 stopwords, alpha-heavy)
    val out = EventStream.curateStream(mem.toDF(), bench, n = 16,
      minWords = 5, watermark = "30 minutes", window_ = "10 minutes")
    val q = out.writeStream.format("memory").queryName("curate_out0")
      .outputMode("append").start()
    try {
      mem.addData(CurateDoc(1L, Timestamp.valueOf("2024-01-01 10:00:00"),
        "the quick brown fox jumps over a lazy dog and runs to hills"))
      q.processAllAvailable()
      mem.addData(CurateDoc(-1L, Timestamp.valueOf("2024-01-02 10:00:00"), "the flush doc is a real document with words"))
      q.processAllAvailable()
      mem.addData(CurateDoc(-2L, Timestamp.valueOf("2024-01-03 10:00:00"), "the second flush doc is also a real document"))
      q.processAllAvailable()
      val rows = sp.table("curate_out0").filter(col("doc_id") >= 0)
        .select(col("doc_id"), col("nn"), col("clean_nn"), col("admitted"))
        .as[(Long, Int, Long, Boolean)].collect().toSeq
      assert(rows == Seq((1L, 0, 0L, true)))
    } finally q.stop()
  }
}
