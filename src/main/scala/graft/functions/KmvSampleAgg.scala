package graft.functions

import scala.annotation.tailrec

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded uniform row-sample as a typed aggregator — the streaming
  * face of [[graft.operators.Stats.kmvRowSample]]: the k rows with the
  * smallest sample hashes ride a single aggregation buffer of ≤ k
  * (hash, value) pairs, so a windowed stream keeps a uniform sample
  * (and therefore quantile estimates) per open window in O(k) state —
  * no per-row reservoir RNG (hash order IS the randomness, and it is
  * replayable), no full-window retention.
  *
  * Ordering is the exact LONG hash (no double roundtrip like TopKAgg
  * needs), tie-broken by value ascending. Boundary contract vs the
  * batch operator: the batch threshold keeps ALL rows tied at the
  * k-th hash (sample may exceed k); this buffer truncates to exactly
  * ≤ k by (hash, value) order. With the 53-bit wide hash the
  * collision probability is ~2^-53 per pair, so the two faces select
  * identical samples in practice — and the spec asserts exactly that
  * on tie-free data.
  */
final class KmvSampleAgg(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {

  require(k >= 1, "sample size must be >= 1")

  private val ord: Ordering[(Long, Double)] = Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def zero: List[(Long, Double)] = Nil

  // buffer invariant: sorted ascending by (hash, value), length <= k
  private def insertSorted(xs: List[(Long, Double)], a: (Long, Double)): List[(Long, Double)] =
    xs match {
      case h :: t if ord.lteq(h, a) => h :: insertSorted(t, a)
      case _ => a :: xs
    }

  override def reduce(b: List[(Long, Double)], a: (Long, Double)): List[(Long, Double)] = {
    val n = b.length
    if (n >= k && ord.gteq(a, b.last)) b
    else {
      val r = insertSorted(b, a)
      if (n >= k) r.init else r
    }
  }

  override def merge(x: List[(Long, Double)], y: List[(Long, Double)]): List[(Long, Double)] = {
    @tailrec
    def go(a: List[(Long, Double)], b: List[(Long, Double)], left: Int,
        acc: List[(Long, Double)]): List[(Long, Double)] =
      if (left == 0) acc.reverse
      else (a, b) match {
        case (Nil, Nil) => acc.reverse
        case (ha :: ta, hb :: _) if ord.lteq(ha, hb) => go(ta, b, left - 1, ha :: acc)
        case (ha :: ta, Nil) => go(ta, b, left - 1, ha :: acc)
        case (_, hb :: tb) => go(a, tb, left - 1, hb :: acc)
      }
    go(x, y, k, Nil)
  }

  override def finish(b: List[(Long, Double)]): Seq[(Long, Double)] = b

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

object KmvSampleAgg {
  /** Untyped column form: `sample(k)(hashCol, valueCol)` →
    * array<struct<_1:bigint,_2:double>> of the k smallest-hash rows,
    * hash-ascending.
    */
  def sample(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvSampleAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
}
