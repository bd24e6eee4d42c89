package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.operators.{TextAnalysis => TA}
import graft.sources.Tables

/** Parity contract for the TextStats kernel: the one-pass byte walk
  * must replicate the composed regex/split expression forms
  * bit-for-bit — on randomized strings (whitespace variants, unicode,
  * surrogate pairs, punctuation, stopwords in every position) against
  * java.util.regex references (the same engine Spark's regexp
  * expressions call), and on real documents against the fallback
  * column forms through the full Catalyst path.
  */
class TextStatsKernelSpec extends SparkSpecBase {

  private def kernel(s: String): (Long, Long, Long, Long) = {
    val arr = graft.functions.TextStats(
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(s)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    (arr(0), arr(1), arr(2), arr(3))
  }

  private def reference(s: String): (Long, Long, Long, Long) = {
    val nChars = s.codePointCount(0, s.length).toLong
    // Spark trim strips 0x20 only; split(trim, "\s+") has limit -1
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val t = s.substring(b, e)
    val nWords = t.split("\\s+", -1).length.toLong
    val keptStr = s.replaceAll("[^a-zA-Z0-9\\s]", "")
    val nPunct = nChars - keptStr.codePointCount(0, keptStr.length)
    val m = java.util.regex.Pattern.compile("\\b(the|a|of|to|and|in|is)\\b").matcher(s)
    var nStop = 0L
    while (m.find()) nStop += 1
    (nChars, nWords, nPunct, nStop)
  }

  test("kernel equals the java.util.regex references on randomized strings") {
    val token = Gen.oneOf(
      Gen.oneOf(TA.stopwords),              // stopwords everywhere
      Gen.oneOf("the.", "a,", "Athe", "the_x", "_a", "is9"), // boundary traps
      Gen.alphaNumStr.suchThat(_.length <= 8),
      Gen.oneOf("ä", "日本語", "€", new String(Character.toChars(0x1F642)),
        "!!", "...", ";:", " "))
    val sep = Gen.oneOf(" ", "  ", "\t", " \t ", "\n", "", " ")
    val gen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(n + 1, sep)
    } yield seps.head + toks.zip(seps.tail).map { case (t, sp) => t + sp }.mkString
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000)
        .withInitialSeed(Seed(42L)),
      Prop.forAll(gen) { s => kernel(s) == reference(s) })
    assert(res.passed, res.status.toString)
  }

  test("kernel-backed TA features equal the composed column forms on real documents") {
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // TA.* resolve to the kernel (registered in the test session);
    // the right-hand forms are the explicit fallbacks
    val both = d.select(col("doc_id"),
      TA.wsTokenCount(col("text")).as("kw"),
      TA.punctCount(col("text")).as("kp"),
      TA.stopHits(col("text")).as("ks"),
      size(split(trim(col("text")), "\\s+")).as("fw"),
      (length(col("text")) - length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", ""))).as("fp"),
      size(expr(s"regexp_extract_all(text, '\\\\b(${TA.stopwords.mkString("|")})\\\\b', 0)")).as("fs"))
    assert(both.filter(col("kw") =!= col("fw") || col("kp") =!= col("fp") ||
      col("ks") =!= col("fs")).count() == 0)
    // the kernel is actually registered — this test must not silently
    // compare fallback against fallback
    assert(spark.sessionState.functionRegistry.functionExists(
      graft.functions.TextStats.identifier))
  }

  test("two kernel instances in one projection survive CODEGEN_ONLY") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val sp = spark
      import sp.implicits._
      val out = Seq(("a the b", "x !! y")).toDF("t1", "t2")
        .select(element_at(call_function("graft_text_stats", col("t1")), 4).as("s1"),
          element_at(call_function("graft_text_stats", col("t2")), 3).as("s2"))
        .as[(Long, Long)].collect().head
      assert(out == ((2L, 2L))) // "a" and "the" both hit; "!!" is 2 punct
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
