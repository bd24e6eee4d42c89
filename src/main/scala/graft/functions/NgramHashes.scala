package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram poly-hashes of a document in one native pass:
  * split on single spaces (empties kept, like `split(text, ' ')` /
  * DuckDB `string_split`), join n-word windows with a space, dedup the
  * ngram STRINGS (first occurrence), then poly-hash each — exactly
  * `ngr` in the dedup oracles:
  * `SELECT DISTINCT doc_id, polyhash(w[i]||' '||w[i+1]||…)`.
  *
  * Exists because the composed-HOF formulation (split → transform →
  * concat_ws → array_distinct → explode → hash) pays interpreted
  * lambda dispatch per ngram — ~5 s of the sf0.1 dedup bench just to
  * stage (doc, ngram-hash) rows. One eval per document in plain JIT'd
  * code makes the staging scan-bound. Fewer than n words → empty array
  * (matches DuckDB generate_series semantics).
  *
  * Real `doGenCode` (not CodegenFallback): the generated code calls
  * [[compute]] through a reference object, so the staging scan —
  * the hottest §2C scan family (minhash / ngram-jaccard /
  * decontaminate / rarity) — stays inside whole-stage codegen instead
  * of forcing the surrounding stage onto the interpreted path.
  */
case class NgramHashes(child: Expression, n: Int, b: Int, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && n <= 16, "ngram width must be in [1, 16]")
  require(b > 0 && b <= 1024, "poly base must be in (0, 1024]")
  require(p > 0 && p < Int.MaxValue.toLong + 1, "poly modulus must fit in 31 bits")

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"

  private def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * b + cp) % p
      i += Character.charCount(cp)
    }
    h
  }

  /** The whole kernel as one JIT-friendly call — shared by the
    * interpreted eval and the generated code.
    */
  def compute(input: UTF8String): ArrayData = {
    val words = input.toString.split(" ", -1)
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(seen.iterator.map(polyHash).toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("ngramHashes", this, classOf[NgramHashes].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashes {
  val identifier: FunctionIdentifier = FunctionIdentifier("graft_ngram_hashes")
  val info: ExpressionInfo = new ExpressionInfo(classOf[NgramHashes].getName, "graft_ngram_hashes")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 4, "graft_ngram_hashes(text, n, base, modulus) takes exactly 4 arguments")
    (children(1), children(2), children(3)) match {
      case (Literal(n: Int, _), Literal(b: Int, _), Literal(p: Long, _)) =>
        NgramHashes(children(0), n, b, p)
      case (Literal(n: Int, _), Literal(b: Int, _), Literal(p: Int, _)) =>
        NgramHashes(children(0), n, b, p.toLong)
      case other => throw new IllegalArgumentException(
        s"graft_ngram_hashes n/base/modulus must be integer literals, got $other")
    }
  }
}
