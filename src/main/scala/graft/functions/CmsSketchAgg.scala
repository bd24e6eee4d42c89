package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.operators.Dedup

/** Count-min-sketch cell bank as a typed aggregator — the streaming
  * face of [[graft.operators.Stats.cmsCells]]: depth × width summed
  * counters flattened into ONE buffer array (row s, bucket b at index
  * s·width + b), so a windowed stream carries a FIXED depth·width·8 B
  * of state per open window (8 KB at the q98 4×256 dims) no matter
  * how many distinct keys pass through — the same
  * bounded-state-per-window argument as [[HllSketchAgg]], for
  * frequency instead of cardinality.
  *
  * The bucket mapping is the SAME affine permutation family the batch
  * sketch and the DuckDB oracles use ([[Dedup.minHashPerm]]:
  * (h·(2s+1) + s·7919+1) mod P1 mod width), and cells are plain sums,
  * so a finished window bank equals the batch
  * [[graft.operators.Stats.cmsCells]] table on the same rows CELL BY
  * CELL (CmsParitySpec), merges with a persisted lake sketch by
  * cell-wise addition ([[graft.operators.Stats.cmsMerge]]), and
  * probes with the shared estimate
  * ([[graft.operators.Stats.cmsEstimate]] over the unflattened bank).
  */
final class CmsSketchAgg(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 1, "cms dims must be positive")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], ng: Long): Array[Long] = {
    var s = 0
    while (s < depth) {
      // floorMod, not %: bit-identical to the batch path's pmod on the
      // non-negative polyHash domain, and still a VALID bucket (instead
      // of a negative index crashing the reduce) if a caller ever feeds
      // a signed hash such as xxhash64 (ADVICE r10).
      val bucket = Math.floorMod(
        Math.floorMod(ng * (2 * s + 1) + (s * 7919 + 1), Dedup.PolyP1), width.toLong).toInt
      b(s * width + bucket) += 1L
      s += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CmsSketchAgg {
  /** Untyped column form: `sketch(depth, width)(hashCol)` →
    * array<bigint> of depth·width flattened cells.
    */
  def sketch(depth: Int, width: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CmsSketchAgg(depth, width), Encoders.scalaLong)
}
