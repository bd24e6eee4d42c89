package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL word-n-gram poly-hashes: one hash per n-gram position,
  * in document order, duplicates KEPT — the sibling of [[NgramHashes]]
  * (which dedups the ngram strings) for the operators whose semantics
  * live on positions or occurrence counts rather than the ngram SET:
  * span-level decontamination needs `posexplode` to recover token
  * offsets, and coverage/LM-style scoring needs every occurrence to
  * count. Element k (0-based) hashes words [k, k+n) — so a match at
  * array position k is the token span [k+1, k+n] (1-based), which is
  * the exact contract the span-surgery operators rely on.
  *
  * Same split semantics as the distinct kernel (single spaces, empties
  * kept, < n words → empty array) and the same reference-object-call
  * `doGenCode`, so the staging scan stays inside whole-stage codegen.
  */
case class NgramHashSeq(child: Expression, n: Int, b: Int, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && n <= 16, "ngram width must be in [1, 16]")
  require(b > 0 && b <= 1024, "poly base must be in (0, 1024]")
  require(p > 0 && p < Int.MaxValue.toLong + 1, "poly modulus must fit in 31 bits")

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hash_seq"

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
    val m = words.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      out(i) = polyHash(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("ngramHashSeq", this, classOf[NgramHashSeq].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashSeq {
  val identifier: FunctionIdentifier = FunctionIdentifier("graft_ngram_hash_seq")
  val info: ExpressionInfo = new ExpressionInfo(classOf[NgramHashSeq].getName, "graft_ngram_hash_seq")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 4, "graft_ngram_hash_seq(text, n, base, modulus) takes exactly 4 arguments")
    (children(1), children(2), children(3)) match {
      case (Literal(n: Int, _), Literal(b: Int, _), Literal(p: Long, _)) =>
        NgramHashSeq(children(0), n, b, p)
      case (Literal(n: Int, _), Literal(b: Int, _), Literal(p: Int, _)) =>
        NgramHashSeq(children(0), n, b, p.toLong)
      case other => throw new IllegalArgumentException(
        s"graft_ngram_hash_seq n/base/modulus must be integer literals, got $other")
    }
  }
}
