package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV sketch as a typed aggregator: the k smallest DISTINCT hash
  * values of a group, sorted ascending — [[graft.operators.Kmv]]'s
  * sketch contract as a single aggregation buffer, so the sketch can
  * live where an agg buffer lives: a streaming state store.
  *
  * The batch path (Kmv.sketch) pre-distincts and reuses TopKAgg; a
  * stream can't afford a second stateful distinct before the windowed
  * agg, so this buffer dedups on insert instead. Buffer is ≤ k longs
  * (k·8 B per open window in the state store — bounded BY
  * CONSTRUCTION, the property that lets a 100 TB stream keep
  * per-window distinct-user estimates without per-user state), and
  * partial-aggregates map-side like any Aggregator.
  */
final class KmvSketchAgg(k: Int) extends Aggregator[Long, List[Long], Array[Long]] {
  require(k >= 1, "k must be positive")

  override def zero: List[Long] = Nil

  // sorted-ascending insert keeping ≤ k distinct members: O(k) per
  // row with k≈64 — cheaper than any tree for these sizes
  override def reduce(b: List[Long], h: Long): List[Long] = {
    if (b.contains(h)) b
    else {
      val merged = (h :: b).sorted
      if (merged.size > k) merged.take(k) else merged
    }
  }

  override def merge(x: List[Long], y: List[Long]): List[Long] = {
    val merged = (x ++ y).distinct.sorted
    if (merged.size > k) merged.take(k) else merged
  }

  override def finish(b: List[Long]): Array[Long] = b.toArray

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketchAgg {
  /** Untyped column form: `sketch(k)(hashCol)` → array<bigint>, the
    * k smallest distinct hashes ascending (feeds Kmv.estimate).
    */
  def sketch(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvSketchAgg(k), Encoders.scalaLong)
}
