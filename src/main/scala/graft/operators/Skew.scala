package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins at scale.
  *
  * AQE's skew-join split (enabled in GraftSession) handles most cases
  * at runtime; explicit salting remains necessary when a *single key*
  * exceeds one task's memory (e.g. one station with 10^9 rows) and for
  * aggregations. Pattern: salt the big side randomly-but-
  * deterministically, replicate the small side across all salts.
  */
object Skew {

  /** Join `big` (salted on hash(id-col) % salts) with `small`
    * (replicated `salts` times) on `key` — equi-join semantics
    * preserved, hot keys spread over `salts` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      saltSource: Column): DataFrame = {
    val b = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1)).cast("array<bigint>")))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: pre-aggregate on
    * (key, salt), then merge per key. `partials` maps each metric to
    * its (pre, post) aggregate pair, e.g. count→(count, sum).
    */
  def twoPhaseCount(df: DataFrame, key: Column, saltSource: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("key"))
      .agg(sum(col("partial_n")).as("n"))
}
