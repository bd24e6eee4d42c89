package graft.functions

import scala.annotation.tailrec

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded distinct-set aggregator: collects up to `cap` DISTINCT
  * longs per group, kept sorted ascending; once a group exceeds `cap`
  * distinct values the buffer saturates at the `cap` SMALLEST — so
  * `size(result) <= k` is an exact "group has at most k distinct
  * members, and here they all are" test when called with cap = k + 1.
  *
  * Built for inverted-index candidate generation (rare-ngram buckets):
  * the df-cap filter and the member list come out of ONE partial
  * aggregation whose per-key state is bounded by the knob, not the
  * data — a stop-phrase n-gram with 10^9 occurrences costs each mapper
  * at most `cap` longs of state and the exchange at most `cap` longs
  * per key per mapper, where both a collect_list and the classic
  * rare-filter + self-join formulation shuffle every occurrence of the
  * hot key into one task. The buffer rides the shuffle as a real
  * array<bigint> (product encoder), so partial aggregation stays
  * columnar.
  */
class BoundedSetAgg(cap: Int) extends Aggregator[Long, List[Long], Seq[Long]] {

  require(cap >= 1, "bounded-set cap must be >= 1")

  override def zero: List[Long] = Nil

  // buffer invariant: sorted ascending, distinct, length <= cap
  override def reduce(b: List[Long], a: Long): List[Long] = {
    val n = b.length
    if (n >= cap && a >= b.last) b // saturated and not among the cap smallest
    else {
      @tailrec
      def ins(xs: List[Long], acc: List[Long]): List[Long] = xs match {
        case h :: _ if h == a => b // already present
        case h :: t if h < a => ins(t, h :: acc)
        case _ => acc reverse_::: (a :: xs)
      }
      val r = ins(b, Nil)
      if (r.length > cap) r.init else r
    }
  }

  override def merge(b1: List[Long], b2: List[Long]): List[Long] = {
    @tailrec
    def go(x: List[Long], y: List[Long], left: Int, acc: List[Long]): List[Long] =
      if (left == 0) acc.reverse
      else (x, y) match {
        case (Nil, Nil) => acc.reverse
        case (hx :: tx, hy :: ty) if hx == hy => go(tx, ty, left - 1, hx :: acc)
        case (hx :: tx, hy :: _) if hx < hy => go(tx, y, left - 1, hx :: acc)
        case (hx :: tx, Nil) => go(tx, y, left - 1, hx :: acc)
        case (_, hy :: ty) => go(x, ty, left - 1, hy :: acc)
      }
    go(b1, b2, cap, Nil)
  }

  override def finish(r: List[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BoundedSetAgg {
  /** Untyped bounded-set UDAF: `boundedSet(cap)(idCol)` aggregates to
    * the sorted array of the group's distinct values, saturated at the
    * `cap` smallest — partial-aggregates map-side with O(cap) state per
    * key, so hot keys cannot skew the exchange.
    */
  def boundedSet(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BoundedSetAgg(cap), Encoders.scalaLong)
}
