package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen polynomial string hash: fold over unicode codepoints
  * of `h = (h * b + codepoint) % p`, starting from 0.
  *
  * The point of this hash (vs xxhash64) is *cross-engine portability*:
  * the identical value is computable in plain DuckDB SQL as
  * `list_reduce(list_concat([0], list_transform(generate_series(1, length(s)),
  *   i -> unicode(s[i:i]))), (acc, c) -> (acc * b + c) % p)`,
  * which lets the MinHash-LSH / SimHash dedup pipelines be verified
  * end-to-end by the DuckDB oracle instead of rows-only checks.
  * With p < 2^31 and b <= 1024 the accumulator stays well inside a
  * 64-bit long (max ~2^41), so the fold never overflows in either
  * engine. Used as the shingle/token hash by [[graft.operators.Dedup]]
  * (reference near-dup semantics: crates/oracle dedups snapshots by
  * content equality, weather_data.rs:213-235; the LSH families extend
  * that to near-duplicates per the training-pipeline brief).
  */
case class PolyHash(child: Expression, b: Int, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(b > 0 && b <= 1024, "poly base must be in (0, 1024]")
  require(p > 0 && p < Int.MaxValue.toLong + 1, "poly modulus must fit in 31 bits")

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * b + cp) % p
      i += Character.charCount(cp)
    }
    h
  }

  // Locals via ctx.freshName: the dedup staging projections put two
  // poly-hashes (different b/p) in one generated function; fixed names
  // collide in Janino and drop the whole projection to interpreted.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * $b + $cp) % ${p}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  val identifier: FunctionIdentifier = FunctionIdentifier("graft_polyhash")
  val info: ExpressionInfo = new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 3, "graft_polyhash(str, base, modulus) takes exactly 3 arguments")
    (children(1), children(2)) match {
      case (Literal(b: Int, _), Literal(p: Long, _)) => PolyHash(children(0), b, p)
      case (Literal(b: Int, _), Literal(p: Int, _)) => PolyHash(children(0), b, p.toLong)
      case other => throw new IllegalArgumentException(
        s"graft_polyhash base/modulus must be integer literals, got $other")
    }
  }
}
