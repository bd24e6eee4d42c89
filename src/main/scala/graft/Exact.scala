package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers that make float aggregates bit-identical between Spark
  * and DuckDB: testdata doubles carry at most 2 decimal digits, so
  * casting to DECIMAL(18,2) is exact and all downstream decimal
  * arithmetic is order-independent. Export back as DOUBLE (exact —
  * values stay far below 2^53).
  */
object Exact {
  /** Exact decimal view of a ≤2-decimal double column. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-independent exact sum of a ≤2-decimal double column, exported as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact sum of an already-decimal expression, exported as double. */
  def dsum2(c: Column): Column = sum(c).cast("double")

  /** Deterministic average: exact decimal sum, then one double
    * division — bit-identical across engines and partitionings.
    * (No rounding: Spark's round() goes through the shortest decimal
    * string while DuckDB rounds the binary double, and they disagree
    * within half an ulp of a tie — observed at sf0.1.)
    */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(c)
}
