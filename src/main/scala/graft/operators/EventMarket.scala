package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end prediction-market ETL — the reference oracle's
  * `etl_data` flow (oracle.rs:355-430: update weather → update entry
  * scores → rank → enumerate outcomes → sign), re-expressed as one
  * distributed dataflow over DataFrames instead of row-at-a-time
  * loops over a local DB.
  *
  * Inputs:
  *  - entries: (entry_id, event_id, station_id, choice_temp_high,
  *    choice_temp_low, choice_wind) with 'over'|'par'|'under' choices
  *  - forecasts: (event_id, station_id, temp_high, temp_low, wind_speed)
  *  - observations: (event_id, station_id, obs_temp_high, obs_temp_low,
  *    obs_wind)
  */
object EventMarket {

  /** Score every entry (oracle.rs:484-770): sum of per-field
    * over/par/under points across the entry's stations, joined against
    * forecast + observation — inner joins ≡ the reference's
    * skip-if-missing `continue`s.
    */
  def scoreEntries(entries: DataFrame, forecasts: DataFrame, observations: DataFrame): DataFrame =
    entries
      .join(forecasts, Seq("event_id", "station_id"))
      .join(observations, Seq("event_id", "station_id"))
      .withColumn("pts",
        Scoring.oupPoints(col("choice_temp_high"), col("temp_high"), col("obs_temp_high")) +
        Scoring.oupPoints(col("choice_temp_low"), col("temp_low"), col("obs_temp_low")) +
        Scoring.oupPoints(col("choice_wind"), col("wind_speed"), col("obs_wind")))
      .groupBy(col("event_id"), col("entry_id"))
      .agg(sum(col("pts")).as("base_score"))

  /** Total score with created-at tiebreak + per-event ranking; top-k
    * winners per event (oracle.rs:745-800).
    */
  def winners(scores: DataFrame, entryTsMillis: org.apache.spark.sql.Column, k: Int): DataFrame =
    Scoring.rankWinners(
      scores.withColumn("total_score", Scoring.totalScore(col("base_score"), entryTsMillis)),
      col("event_id"), col("total_score"), k)

  /** Attestation batch: for each event, the winner ranking as outcome
    * bytes + a deterministic mock signature (stands in for musig2) —
    * computed distributed, one row per event.
    */
  def attestations(winnersDf: DataFrame): DataFrame = {
    val spark = winnersDf.sparkSession
    import spark.implicits._
    winnersDf
      .groupBy(col("event_id"))
      .agg(collect_list(struct(col("rank"), col("entry_id"))).as("ranked"))
      .as[(Long, Seq[(Int, Long)])]
      .map { case (eventId, ranked) =>
        val perm = ranked.sortBy(_._1).map(_._2)
        val msg = Scoring.outcomeMessage(perm)
        (eventId, perm, Scoring.attest(eventId.toString, msg))
      }
      .toDF("event_id", "winner_entries", "attestation")
  }
}
