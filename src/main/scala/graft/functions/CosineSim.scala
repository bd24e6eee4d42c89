package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen cosine similarity over two array<float> columns.
  *
  * Single pass, three double accumulators (dot, ‖a‖², ‖b‖²), folding
  * left in element order — bit-identical to the HOF formulation in
  * [[graft.operators.Similarity]] (and to DuckDB's list_reduce fold),
  * but runs inside whole-stage codegen with no per-element lambda
  * dispatch or intermediate arrays. This is the ANN hot path at scale:
  * the brute-force scan is O(N·d) calls of this kernel.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // getFloat on a non-float array would read garbage — fail analysis
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  // Every local goes through ctx.freshName: two instances of this
  // kernel routinely land in ONE generated function (cosine re-rank
  // next to a signature in the same projection), and fixed names make
  // Janino reject the whole function → silent interpreted fallback.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  val identifier: FunctionIdentifier = FunctionIdentifier("graft_cosine")
  val info: ExpressionInfo = new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_cosine takes exactly 2 arguments")
    CosineSim(children(0), children(1))
  }
}
