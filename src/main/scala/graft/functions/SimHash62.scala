package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 62-bit SimHash of a document in one native pass — the per-document
  * fusion of [[graft.operators.Dedup.simHashDf]]'s explode → two
  * poly-hashes → 62 bit-majority aggregates pipeline. Token b-th bit
  * votes +1/-1; result bit b is 1 iff the vote sum is positive. Bits
  * 0..30 come from poly(131, 2^31-1), bits 31..61 from
  * poly(137, 2147483629) — identical to the composed form and to the
  * dedup_simhash DuckDB oracle.
  *
  * The composed pipeline shuffles one row per (doc, token) into a
  * 62-aggregate groupBy; this kernel makes signature computation
  * scan-local (no exchange), which is also the only layout that works
  * when the corpus is 100 TB: signatures are a map-side projection
  * computed at ingest, not an aggregation.
  */
case class SimHash62(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash62"

  override def nullSafeEval(input: Any): Any =
    SimHash62.compute(input.asInstanceOf[UTF8String])

  // Generated code is a single static call into the JIT'd kernel — the
  // expression stays inside whole-stage codegen (no interpreted
  // fallback path for the whole projection, which is what
  // CodegenFallback costs on the hottest §2C scan).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash62.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash62 {

  private def poly(s: String, b: Int, p: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * b + cp) % p
      i += Character.charCount(cp)
    }
    h
  }

  /** The 62-bit SimHash kernel (called from generated code via the
    * companion's static forwarder).
    */
  def compute(input: UTF8String): Long = {
    // EXACTLY the composed pipeline's tokenization: Spark trim() strips
    // ' ' only; split(str, "\s+") is Java split with limit -1 (keeps
    // leading/trailing empty tokens, which then vote like any token).
    var s = input.toString
    var b0 = 0
    var e0 = s.length
    while (b0 < e0 && s.charAt(b0) == ' ') b0 += 1
    while (e0 > b0 && s.charAt(e0 - 1) == ' ') e0 -= 1
    s = s.substring(b0, e0)
    val toks = s.split("\\s+", -1)
    val votes = new Array[Int](62)
    var t = 0
    while (t < toks.length) {
      val h1 = poly(toks(t), 131, 2147483647L)
      val h2 = poly(toks(t), 137, 2147483629L)
      var b = 0
      while (b < 31) {
        votes(b) += (if (((h1 >> b) & 1L) == 1L) 1 else -1)
        votes(b + 31) += (if (((h2 >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 62) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_simhash62")
  val info: ExpressionInfo = new ExpressionInfo(classOf[SimHash62].getName, "graft_simhash62")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_simhash62(text) takes exactly 1 argument")
    SimHash62(children.head)
  }
}
