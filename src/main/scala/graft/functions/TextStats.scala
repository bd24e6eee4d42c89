package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The four quality-scoring text statistics in ONE native byte pass:
  * `[n_chars, n_words, n_punct, n_stop]` as array<long>, where each
  * element replicates the composed-expression form bit-for-bit:
  *
  *  - n_chars = `length(text)` — code points (count non-continuation
  *    UTF-8 bytes);
  *  - n_words = `size(split(trim(text), "\s+"))` — Spark trim strips
  *    0x20 ONLY; Java split with limit -1 emits a leading empty token
  *    when the trimmed string starts with other whitespace and a
  *    trailing one when it ends with it, and the empty string yields
  *    [""] (count 1) — all replicated;
  *  - n_punct = `length(text) - length(regexp_replace(text,
  *    "[^a-zA-Z0-9\s]", ""))` — code points that are neither ASCII
  *    alphanumeric nor ASCII \s (non-ASCII counts: CJK text is
  *    "punctuation" to this ASCII-centric score, matching the regex);
  *  - n_stop = `size(regexp_extract_all(text, "\b(the|a|of|to|and|in|
  *    is)\b", 0))` — java.util.regex's \b (the engine behind Spark's
  *    regexp functions) classifies word characters as
  *    `Character.isLetterOrDigit(cp) || cp == '_'` EVEN WITHOUT
  *    UNICODE_CHARACTER_CLASS (the documented \b/\w asymmetry:
  *    "äa"/"日a" hide the `a`, "€a" does not), so the count is the
  *    number of maximal such word-character runs (by code point)
  *    equal to a stopword — boundaries cannot fall inside a run, no
  *    regex engine needed.
  *
  * Exists because the regex forms cost ~30 µs per ~300-char doc in
  * the JVM — the quality-feature scan dominates every quality-gated
  * catalog query at scale (measured 3.2 s of q87's 3.6 s at sf1)
  * while DuckDB's RE2 does the same scan 3× faster. One JIT'd byte
  * walk is ~10-30× faster than the regex stack and keeps the whole
  * feature family scan-bound. Real `doGenCode` via reference-object
  * call (the NgramHashes pattern — collision-immune, stays inside
  * whole-stage codegen).
  *
  * The DuckDB oracles are unchanged: they already replay the regex
  * semantics this kernel replicates, and the oracle gate plus the
  * ScalaCheck parity contract (kernel ≡ composed-expression forms on
  * randomized strings) pin the equivalence.
  */
case class TextStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_text_stats"

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')
  // Java regex \s (default, non-UNICODE_CHARACTER_CLASS)
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private def isStop(bytes: Array[Byte], start: Int, end: Int): Boolean = {
    val words = TextStats.StopwordBytes
    val len = end - start
    var k = 0
    while (k < words.length) {
      val w = words(k)
      if (w.length == len) {
        var i = 0
        while (i < len && bytes(start + i) == w(i)) i += 1
        if (i == len) return true
      }
      k += 1
    }
    false
  }

  /** The whole kernel as one JIT-friendly call — shared by the
    * interpreted eval and the generated code.
    */
  def compute(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    val n = bytes.length
    var chars = 0L
    var kept = 0L // code points surviving regexp_replace([^a-zA-Z0-9\s])
    var stops = 0L
    var runStart = -1
    var i = 0
    while (i < n) {
      val b = bytes(i)
      var cp = 0
      var len = 1
      if (b >= 0) { cp = b; len = 1 }
      else if ((b & 0xe0) == 0xc0 && i + 1 < n) {
        cp = ((b & 0x1f) << 6) | (bytes(i + 1) & 0x3f); len = 2
      } else if ((b & 0xf0) == 0xe0 && i + 2 < n) {
        cp = ((b & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f); len = 3
      } else if ((b & 0xf8) == 0xf0 && i + 3 < n) {
        cp = ((b & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f); len = 4
      } else {
        // malformed / truncated UTF-8 (possible via cast-from-binary):
        // consume one byte as a replacement-class code point rather
        // than reading past the buffer
        cp = 0xfffd; len = 1
      }
      chars += 1
      if (b >= 0 && (isAlnum(b) || isWs(b))) kept += 1
      // java.util.regex \b word character (see scaladoc)
      if (cp == '_' || Character.isLetterOrDigit(cp)) {
        if (runStart < 0) runStart = i
      } else if (runStart >= 0) {
        if (isStop(bytes, runStart, i)) stops += 1
        runStart = -1
      }
      i += len
    }
    if (runStart >= 0 && isStop(bytes, runStart, n)) stops += 1

    // n_words over the 0x20-trimmed span
    var ts = 0
    var te = n
    while (ts < te && bytes(ts) == ' ') ts += 1
    while (te > ts && bytes(te - 1) == ' ') te -= 1
    val words =
      if (te == ts) 1L // "".split → [""]
      else {
        var runs = 0L
        var inRun = false
        var j = ts
        while (j < te) {
          val ws = bytes(j) >= 0 && isWs(bytes(j))
          if (!ws && !inRun) { runs += 1; inRun = true }
          else if (ws) inRun = false
          j += 1
        }
        val lead = if (bytes(ts) >= 0 && isWs(bytes(ts))) 1L else 0L
        val tail = if (bytes(te - 1) >= 0 && isWs(bytes(te - 1))) 1L else 0L
        runs + lead + tail
      }

    new GenericArrayData(Array(chars, words, chars - kept, stops))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("textStats", this, classOf[TextStats].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  /** Canonical stopword list — TextAnalysis.stopwords aliases this. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is")
  private[functions] val StopwordBytes: Array[Array[Byte]] =
    Stopwords.map(_.getBytes("UTF-8")).toArray

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_text_stats")
  val info: ExpressionInfo = new ExpressionInfo(classOf[TextStats].getName, "graft_text_stats")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_text_stats(text) takes exactly 1 argument")
    TextStats(children.head)
  }
}
