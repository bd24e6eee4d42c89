package graft.functions

import scala.annotation.tailrec

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY.md §2 custom-function tier:
  * TypedColumn aggregate): keeps the k highest-scored (score, id)
  * pairs per group in a fixed-size buffer that is mergeable across
  * partitions — per-group ranking WITHOUT a window sort. The shuffle
  * carries at most k pairs per group per mapper (vs every row for
  * row_number), which is the difference between feasible and not at
  * 10^6+ groups × 10^4 candidates.
  *
  * The buffer is kept best-first sorted, so reduce is a bounded
  * insert-if-better: a row no better than the current k-th is dropped
  * with zero allocation (the overwhelmingly common case once the
  * buffer fills), an improving row pays one O(k) ordered insert —
  * never a full re-sort per input row — and merge is an O(k) sorted
  * merge. The buffer rides the shuffle as a real
  * array<struct<_1:double,_2:bigint>> (product encoder, not Kryo
  * blobs), so partial aggregation stays columnar.
  *
  * Ties break toward the smaller id (same ordering the catalog's
  * window formulation uses).
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  require(k >= 1, "top-k width must be >= 1")

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: List[(Double, Long)] = Nil

  // buffer invariant: sorted by ord (best first), length <= k
  private def insertSorted(xs: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    xs match {
      case h :: t if ord.lteq(h, a) => h :: insertSorted(t, a)
      case _ => a :: xs
    }

  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] = {
    val n = b.length // <= k
    if (n >= k && ord.gteq(a, b.last)) b // not better than the worst kept
    else {
      val r = insertSorted(b, a)
      if (n >= k) r.init else r
    }
  }

  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] = {
    @tailrec
    def go(x: List[(Double, Long)], y: List[(Double, Long)], left: Int,
        acc: List[(Double, Long)]): List[(Double, Long)] =
      if (left == 0) acc.reverse
      else (x, y) match {
        case (Nil, Nil) => acc.reverse
        case (hx :: tx, hy :: _) if ord.lteq(hx, hy) => go(tx, y, left - 1, hx :: acc)
        case (hx :: tx, Nil) => go(tx, y, left - 1, hx :: acc)
        case (_, hy :: ty) => go(x, ty, left - 1, hy :: acc)
      }
    go(b1, b2, k, Nil)
  }

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  // product (not kryo) output: `udaf(new TopKAgg(k), …)` then yields a
  // real array<struct<_1:double,_2:bigint>> column, so the catalog's
  // DataFrame paths can posexplode it into (rank, id, score) rows
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  /** Untyped top-k UDAF: `topk(k)(scoreCol, idCol)` aggregates to the
    * k highest (score, id) pairs, descending, ties toward smaller id —
    * partial-aggregates map-side, so the shuffle after a scored scan
    * carries at most k pairs per group per mapper.
    */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
}
