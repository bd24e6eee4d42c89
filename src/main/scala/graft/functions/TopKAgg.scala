package graft.functions

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
  * Ties break toward the smaller id (same ordering the catalog's
  * window formulation uses).
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: List[(Double, Long)] = Nil

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sorted(ord).take(k)

  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    trim(a :: b)

  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    trim(b1 ++ b2)

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r.sorted(ord)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
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
