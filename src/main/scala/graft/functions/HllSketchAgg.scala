package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.operators.Stats

/** Dense HLL register bank as a typed aggregator — the streaming face
  * of [[graft.operators.Stats.hllRegisters]]: m = 64 longs per group
  * (a FIXED 512 B of state per open window, even tighter than the KMV
  * buffer's ≤ k·8 B), updated by the same idx/rho mapping the batch
  * operator and the DuckDB oracles use, so a windowed stream estimate
  * and a lake backfill agree by construction
  * ([[graft.operators.Stats.hllEstimateCol]] applies the shared
  * integer formula to the finished array).
  *
  * Input is the 62-bit wide hash (h1·P2 + h2 of the two portable
  * poly-hash pairs); rho is leading-zeros + 1 over the 32 bits above
  * the register index — `33 - bitlen(r)`, the JVM mirror of the SQL
  * `33 - length(bin(r))` (see hllRegisters' scaladoc on why trailing
  * zeros would bias a polynomial hash).
  */
final class HllSketchAgg extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](Stats.HllM)

  override def reduce(b: Array[Long], wide: Long): Array[Long] = {
    val idx = (wide % Stats.HllM).toInt
    val r = (wide / Stats.HllM) & ((1L << Stats.HllW) - 1)
    val rho =
      if (r == 0L) Stats.HllW + 1
      else Stats.HllW + 1 - (64 - java.lang.Long.numberOfLeadingZeros(r))
    if (rho > b(idx)) b(idx) = rho
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Stats.HllM) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object HllSketchAgg {
  /** Untyped column form: `sketch(wideHashCol)` → array<bigint> of the
    * 64 dense registers (absent = 0), feeding Stats.hllEstimateCol.
    */
  def sketch: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllSketchAgg, Encoders.scalaLong)
}
