package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen random-hyperplane signature over an array<float>
  * embedding: bit j (j < nBits) is set iff the dot product of the
  * embedding with pseudo-random hyperplane j is positive. Hyperplane
  * component (j, d) is `(((j*64 + d) * 1103515245 + 12345) % 2147483647
  * % 1000) / 1000.0 - 0.5` — plain 64-bit integer arithmetic, so the
  * identical signature is computable in DuckDB SQL (the knn_lsh /
  * dedup_embedding_cosine oracles) and in the HOF fallback in
  * [[graft.operators.Similarity.rhSignature]]. Dot products fold left
  * in element order with a double accumulator, bit-identical to both.
  *
  * This is the ANN bucketing hot path: one O(nBits·d) kernel per row
  * inside whole-stage codegen, vs nested interpreted lambdas for the
  * HOF form (~10× on the sf0.1 bench).
  */
case class RhSig(child: Expression, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nBits > 0 && nBits <= 62, "rh signature width must be in [1, 62]")

  // getFloat would read garbage from an array<double> child — fail
  // analysis instead (the HOF fallback casts; this kernel must not)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rhsig"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var dp = 0.0
      var d = 0
      while (d < n) {
        val w = (((j * 64 + d) * 1103515245L + 12345L) % 2147483647L % 1000L) / 1000.0 - 0.5
        dp += a.getFloat(d).toDouble * w
        d += 1
      }
      if (dp > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  // Locals via ctx.freshName: a signature next to a cosine re-rank in
  // the same projection shares one generated function; fixed names
  // collide in Janino and silently de-optimize the whole stage.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val dp = ctx.freshName("dp")
      val d = ctx.freshName("d")
      val w = ctx.freshName("w")
      s"""
         |int $n = $c.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double $dp = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $w = ((($j * 64 + $d) * 1103515245L + 12345L) % 2147483647L % 1000L) / 1000.0 - 0.5;
         |    $dp += ((double) $c.getFloat($d)) * $w;
         |  }
         |  if ($dp > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RhSig {
  val identifier: FunctionIdentifier = FunctionIdentifier("graft_rhsig")
  val info: ExpressionInfo = new ExpressionInfo(classOf[RhSig].getName, "graft_rhsig")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_rhsig(embedding, nBits) takes exactly 2 arguments")
    children(1) match {
      case Literal(b: Int, _) => RhSig(children(0), b)
      case other => throw new IllegalArgumentException(s"graft_rhsig nBits must be an integer literal, got $other")
    }
  }
}
