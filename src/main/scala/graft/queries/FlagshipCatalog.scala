package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{ForecastPipeline, Weather}

/** The reference's two flagship canned queries, run end-to-end over a
  * synthetic forecast/observation stream derived deterministically
  * from `events` (identical derivation in the DuckDB oracle):
  *
  *  - q27_forecast_daily  ≡ forecasts_data  (weather_data.rs:90-424)
  *  - q28_observation_daily ≡ daily_observations (weather_data.rs:576-691)
  */
object FlagshipCatalog {

  private val ClampLo = 1704412800L // 2024-01-05T00:00:00Z
  private val ClampHi = 1709251200L // 2024-03-01T00:00:00Z

  /** Synthetic forecast rows: hourly windows of event_type-dependent
    * duration, fields derived from value and props.k.
    */
  def synthForecasts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("gen_ms", expr("ts_ns div 1000000"))
      .withColumn("begin_s", expr("((ts_ns div 1000000) div 3600000) * 3600"))
      .withColumn("dur_h",
        when(col("event_type") === "click", 1)
          .when(col("event_type") === "view", 3)
          .when(col("event_type") === "purchase", 6)
          .when(col("event_type") === "signup", 12)
          .otherwise(24))
      .withColumn("end_s", col("begin_s") + col("dur_h") * 3600)
      .filter(col("begin_s") >= ClampLo && col("begin_s") < ClampHi)
      .select(
        col("user_id").as("station_id"), col("event_id"), col("gen_ms"),
        col("begin_s"), col("end_s"),
        (floor(col("value")) - 3).as("min_temp"),
        (floor(col("value")) + 4).as("max_temp"),
        ((col("k") * 7) % 520).as("wind_speed"),
        ((col("k") * 11) % 400).as("wind_direction"),
        (col("k") % 110).as("rh_max"),
        (col("k") % 95).as("rh_min"),
        (col("k") % 101).cast("double").as("pop12"),
        when(col("event_type").isin("click", "view", "purchase"), col("value")).as("qpf"),
        when(col("event_type").isin("signup", "purchase"), col("value")).as("snow_amt"),
        when(col("event_type").isin("signup", "purchase"), (col("k") % 15).cast("double")).as("snow_ratio"),
        when(col("event_type") === "error", col("value")).as("ice_amt"))

  private val synthSql =
    s"""ev AS (
       |  SELECT user_id AS station_id, event_id, event_type, value,
       |    CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k,
       |    epoch_ns(ts)//1000000 AS gen_ms,
       |    ((epoch_ns(ts)//1000000)//3600000)*3600 AS begin_s
       |  FROM events),
       |synth AS (
       |  SELECT station_id, event_id, gen_ms, begin_s,
       |    begin_s + (CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 3 WHEN 'purchase' THEN 6 WHEN 'signup' THEN 12 ELSE 24 END)*3600 AS end_s,
       |    CAST(FLOOR(value) AS BIGINT) - 3 AS min_temp,
       |    CAST(FLOOR(value) AS BIGINT) + 4 AS max_temp,
       |    (k*7) % 520 AS wind_speed,
       |    (k*11) % 400 AS wind_direction,
       |    k % 110 AS rh_max,
       |    k % 95 AS rh_min,
       |    CAST(k % 101 AS DOUBLE) AS pop12,
       |    CASE WHEN event_type IN ('click','view','purchase') THEN value END AS qpf,
       |    CASE WHEN event_type IN ('signup','purchase') THEN value END AS snow_amt,
       |    CASE WHEN event_type IN ('signup','purchase') THEN CAST(k % 15 AS DOUBLE) END AS snow_ratio,
       |    CASE WHEN event_type = 'error' THEN value END AS ice_amt
       |  FROM ev
       |  WHERE begin_s >= $ClampLo AND begin_s < $ClampHi)""".stripMargin

  private def durationCte(f: String, p: String): String =
    s"""${p}d AS (SELECT station_id, day, dur_s, COUNT(*) AS row_count,
       |    SUM(CASE WHEN next_begin IS NOT NULL AND end_s = next_begin THEN 1 ELSE 0 END) AS chain_count
       |  FROM (SELECT station_id, day, dur_s, begin_s, end_s,
       |      LEAD(begin_s) OVER (PARTITION BY station_id, day, dur_s ORDER BY begin_s) AS next_begin
       |    FROM pr WHERE $f IS NOT NULL) t GROUP BY 1,2,3 HAVING COUNT(*) > 1),
       |${p}b AS (SELECT station_id, day, dur_s AS best_dur FROM (
       |    SELECT *, row_number() OVER (PARTITION BY station_id, day ORDER BY CAST(chain_count AS DOUBLE)/row_count DESC, dur_s ASC) AS rn FROM ${p}d) t
       |  WHERE rn = 1),
       |${p}m AS (SELECT station_id, day, MIN(dur_s) AS min_dur FROM pr WHERE $f IS NOT NULL GROUP BY 1,2),
       |${p}c AS (SELECT ${p}m.station_id, ${p}m.day, COALESCE(${p}b.best_dur, ${p}m.min_dur) AS chosen_dur
       |  FROM ${p}m LEFT JOIN ${p}b ON ${p}m.station_id = ${p}b.station_id AND ${p}m.day = ${p}b.day)""".stripMargin

  private val q27Oracle =
    s"""WITH $synthSql,
       |ded AS (SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY station_id, begin_s, end_s ORDER BY gen_ms DESC, event_id DESC) AS rn
       |    FROM synth) t WHERE rn = 1),
       |pr AS (SELECT station_id, begin_s//86400 AS day, begin_s, end_s, end_s - begin_s AS dur_s,
       |    qpf, snow_amt, snow_ratio, ice_amt
       |  FROM ded WHERE qpf IS NOT NULL OR snow_amt IS NOT NULL OR ice_amt IS NOT NULL),
       |${durationCte("qpf", "q")},
       |${durationCte("snow_amt", "s")},
       |${durationCte("ice_amt", "i")},
       |dq AS (SELECT pr.station_id, pr.day,
       |    CAST(SUM(CASE WHEN pr.qpf >= 0 THEN CAST(pr.qpf AS DECIMAL(18,2)) END) AS DOUBLE)/100.0 AS total_qpf
       |  FROM pr JOIN qc ON pr.station_id = qc.station_id AND pr.day = qc.day
       |  WHERE pr.qpf IS NOT NULL AND pr.dur_s = qc.chosen_dur GROUP BY 1, 2),
       |ds AS (SELECT pr.station_id, pr.day,
       |    CAST(SUM(CASE WHEN pr.snow_amt >= 0 THEN CAST(pr.snow_amt AS DECIMAL(18,2)) END) AS DOUBLE)/50.0 AS snow_out,
       |    CAST(SUM(CASE WHEN pr.snow_ratio > 0 THEN CAST(pr.snow_ratio AS DECIMAL(18,2)) END) AS DOUBLE)
       |      / COUNT(CASE WHEN pr.snow_ratio > 0 THEN 1 END) AS avg_snow_ratio
       |  FROM pr JOIN sc ON pr.station_id = sc.station_id AND pr.day = sc.day
       |  WHERE pr.snow_amt IS NOT NULL AND pr.dur_s = sc.chosen_dur GROUP BY 1, 2),
       |di AS (SELECT pr.station_id, pr.day,
       |    CAST(SUM(CASE WHEN pr.ice_amt >= 0 THEN CAST(pr.ice_amt AS DECIMAL(18,2)) END) AS DOUBLE)/200.0 AS ice_out
       |  FROM pr JOIN ic ON pr.station_id = ic.station_id AND pr.day = ic.day
       |  WHERE pr.ice_amt IS NOT NULL AND pr.dur_s = ic.chosen_dur GROUP BY 1, 2),
       |qs AS (SELECT COALESCE(dq.station_id, ds.station_id) AS station_id, COALESCE(dq.day, ds.day) AS day,
       |    dq.total_qpf, ds.snow_out, ds.avg_snow_ratio
       |  FROM dq FULL OUTER JOIN ds ON dq.station_id = ds.station_id AND dq.day = ds.day),
       |dp AS (SELECT COALESCE(qs.station_id, di.station_id) AS station_id, COALESCE(qs.day, di.day) AS day,
       |    qs.total_qpf, qs.snow_out, qs.avg_snow_ratio, di.ice_out
       |  FROM qs FULL OUTER JOIN di ON qs.station_id = di.station_id AND qs.day = di.day),
       |df2 AS (SELECT station_id, begin_s//86400 AS day,
       |    MIN(begin_s) AS min_begin, MAX(end_s) AS max_end,
       |    MIN(min_temp) FILTER (WHERE min_temp IS NOT NULL AND min_temp >= -200 AND min_temp <= 200) AS temp_low,
       |    MAX(max_temp) FILTER (WHERE max_temp IS NOT NULL AND max_temp >= -200 AND max_temp <= 200) AS temp_high,
       |    MAX(wind_speed) FILTER (WHERE wind_speed IS NOT NULL AND wind_speed >= 0 AND wind_speed <= 500) AS wind_speed,
       |    MAX(wind_direction) FILTER (WHERE wind_direction IS NOT NULL AND wind_direction >= 0 AND wind_direction <= 360) AS wind_direction,
       |    MAX(rh_max) FILTER (WHERE rh_max IS NOT NULL AND rh_max >= 0 AND rh_max <= 100) AS humidity_max,
       |    MIN(rh_min) FILTER (WHERE rh_min IS NOT NULL AND rh_min >= 0 AND rh_min <= 100) AS humidity_min,
       |    MAX(pop12) FILTER (WHERE pop12 IS NOT NULL) AS precip_chance
       |  FROM ded GROUP BY 1, 2)
       |SELECT df2.station_id, df2.day,
       |  GREATEST($ClampLo, df2.min_begin) AS start_s,
       |  LEAST($ClampHi, df2.max_end) AS end_s,
       |  df2.temp_low, df2.temp_high, df2.wind_speed, df2.wind_direction,
       |  df2.humidity_max, df2.humidity_min, df2.precip_chance,
       |  GREATEST(0.0, COALESCE(
       |    dp.total_qpf - dp.snow_out / NULLIF(dp.avg_snow_ratio, 0.0) - COALESCE(dp.ice_out, 0.0),
       |    dp.total_qpf - COALESCE(dp.ice_out, 0.0))) AS rain_amt,
       |  dp.snow_out AS snow_amt, dp.ice_out AS ice_amt
       |FROM df2 LEFT JOIN dp ON df2.station_id = dp.station_id AND df2.day = dp.day
       |ORDER BY df2.station_id, df2.day""".stripMargin

  private val q27 = Q(
    "q27_forecast_daily",
    (s, dir) => ForecastPipeline.run(synthForecasts(s, dir), ClampLo, ClampHi)
      .orderBy(col("station_id"), col("day")),
    Some(q27Oracle))

  // q28 — daily_observations (weather_data.rs:576-691) ----------------------

  private val q28 = Q(
    "q28_observation_daily",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("wx",
          when(col("event_type") === "click", "RA BR")
            .when(col("event_type") === "signup", "SN")
            .when(col("event_type") === "purchase", "FZRA")
            .when(col("event_type") === "error", ""))
        .withColumn("wind", col("k") % 520)
        .withColumn("wdir", (col("k") * 3) % 400)
        .withColumn("precip_type", Weather.classifyPrecip(col("wx"), col("value")))
        .withColumn("day", expr("((ts_ns div 1000000) div 86400000)"))
      e.groupBy(col("user_id").as("station_id"), col("day"))
        .agg(
          min(col("value")).as("temp_low"),
          max(col("value")).as("temp_high"),
          max(when(col("wind").isNotNull && col("wind") >= 0 && col("wind") <= 500, col("wind"))).as("wind_speed"),
          max(when(col("wdir").isNotNull && col("wdir") >= 0 && col("wdir") <= 360, col("wdir"))).as("wind_direction"),
          Weather.magnusHumidity(
            sum(col("value").cast("decimal(18,2)")).cast("double") / count(col("value")),
            sum((col("value") - 2.0).cast("decimal(18,2)")).cast("double") / count(col("value"))).as("humidity"),
          (sum(when(col("value") >= 0 && col("precip_type") === "rain", col("value").cast("decimal(18,2)"))).cast("double") / 100.0).as("rain_amt"),
          (sum(when(col("value") >= 0 && col("precip_type") === "snow", col("value").cast("decimal(18,2)"))).cast("double") / 10.0).as("snow_amt"),
          (sum(when(col("value") >= 0 && col("precip_type") === "ice", col("value").cast("decimal(18,2)"))).cast("double") / 100.0).as("ice_amt"))
        .orderBy(col("station_id"), col("day"))
    },
    Some("""WITH e AS (
           |  SELECT user_id AS station_id, value,
           |    CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
           |    ((epoch_ns(ts)//1000000)//86400000) AS day,
           |    CASE event_type WHEN 'click' THEN 'RA BR' WHEN 'signup' THEN 'SN'
           |      WHEN 'purchase' THEN 'FZRA' WHEN 'error' THEN '' END AS wx
           |  FROM events),
           |c AS (
           |  SELECT *, (k % 520) AS wind, ((k*3) % 400) AS wdir,
           |    CASE WHEN wx IS NOT NULL AND wx != '' THEN
           |        CASE WHEN regexp_matches(wx, '(^|\s)(SN|BLSN|DRSN)(\s|$)') THEN 'snow'
           |             WHEN regexp_matches(wx, '(^|\s)(FZRA|FZDZ|PL|GR|GS|IC)(\s|$)') THEN 'ice'
           |             ELSE 'rain' END
           |      WHEN value IS NOT NULL AND value <= 2.0 THEN 'snow'
           |      ELSE 'rain' END AS precip_type
           |  FROM e)
           |SELECT station_id, day,
           |  MIN(value) AS temp_low, MAX(value) AS temp_high,
           |  MAX(wind) FILTER (WHERE wind IS NOT NULL AND wind >= 0 AND wind <= 500) AS wind_speed,
           |  MAX(wdir) FILTER (WHERE wdir IS NOT NULL AND wdir >= 0 AND wdir <= 360) AS wind_direction,
           |  CAST(ROUND(100.0
           |    * EXP(17.625 * (CAST(SUM(CAST(value - 2.0 AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value)) / (243.04 + (CAST(SUM(CAST(value - 2.0 AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value))))
           |    / EXP(17.625 * (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value)) / (243.04 + (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value))))) AS BIGINT) AS humidity,
           |  CAST(SUM(CASE WHEN value >= 0 AND precip_type = 'rain' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)/100.0 AS rain_amt,
           |  CAST(SUM(CASE WHEN value >= 0 AND precip_type = 'snow' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)/10.0 AS snow_amt,
           |  CAST(SUM(CASE WHEN value >= 0 AND precip_type = 'ice' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)/100.0 AS ice_amt
           |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // q29 — stations() (weather_data.rs:693-750): DISTINCT station dims
  // over schema-evolved snapshots (old snapshots lack state/iata/elev),
  // COALESCE'd to defaults. Customer plays the station feed: "old"
  // rows drop the enriched columns.

  private val q29 = Q(
    "q29_stations",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val old = c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("station_id"), col("c_name").as("station_name"))
      val nw = c.filter(col("c_custkey") % 2 =!= 0)
        .select(col("c_custkey").as("station_id"), col("c_name").as("station_name"),
          col("c_mktsegment").as("state"), col("c_acctbal").as("elevation_m"))
      old.unionByName(nw, allowMissingColumns = true)
        .select(col("station_id"),
          coalesce(col("station_name"), lit("")).as("station_name"),
          coalesce(col("state"), lit("")).as("state"),
          col("elevation_m"))
        .distinct()
        .orderBy(col("station_id"))
    },
    Some("""SELECT DISTINCT station_id,
           |  COALESCE(station_name, '') AS station_name,
           |  COALESCE(state, '') AS state,
           |  elevation_m
           |FROM (
           |  SELECT c_custkey AS station_id, c_name AS station_name FROM customer WHERE c_custkey % 2 = 0
           |  UNION ALL BY NAME
           |  SELECT c_custkey AS station_id, c_name AS station_name, c_mktsegment AS state, c_acctbal AS elevation_m
           |  FROM customer WHERE c_custkey % 2 <> 0)
           |ORDER BY station_id""".stripMargin))

  // q30 — observation_data() (weather_data.rs:426-574): whole-range
  // per-station aggregation with GREATEST/LEAST window clamps on the
  // observation timestamps (ms), Magnus humidity, per-class precip.

  private val q30 = Q(
    "q30_observation_range",
    (s, dir) => {
      val lo = 1704844800000L // 2024-01-10T00:00:00Z ms
      val hi = 1708300800000L // 2024-02-19T00:00:00Z ms
      val e = Tables.events(s, dir)
        .withColumn("ms", expr("ts_ns div 1000000"))
        .filter(col("ms") >= lo && col("ms") <= hi)
        .withColumn("wx",
          when(col("event_type") === "click", "RA BR")
            .when(col("event_type") === "signup", "SN")
            .when(col("event_type") === "purchase", "FZRA")
            .when(col("event_type") === "error", ""))
        .withColumn("precip_type", Weather.classifyPrecip(col("wx"), col("value")))
      e.groupBy(col("user_id").as("station_id"))
        .agg(
          greatest(lit(lo), min(col("ms"))).as("start_ms"),
          least(lit(hi), max(col("ms"))).as("end_ms"),
          min(col("value")).as("temp_low"),
          max(col("value")).as("temp_high"),
          Weather.magnusHumidity(
            sum(col("value").cast("decimal(18,2)")).cast("double") / count(col("value")),
            sum((col("value") - 2.0).cast("decimal(18,2)")).cast("double") / count(col("value"))).as("humidity"),
          (sum(when(col("value") >= 0 && col("precip_type") === "rain", col("value").cast("decimal(18,2)"))).cast("double") / 100.0).as("rain_amt"),
          (sum(when(col("value") >= 0 && col("precip_type") === "snow", col("value").cast("decimal(18,2)"))).cast("double") / 10.0).as("snow_amt"),
          (sum(when(col("value") >= 0 && col("precip_type") === "ice", col("value").cast("decimal(18,2)"))).cast("double") / 100.0).as("ice_amt"))
        .orderBy(col("station_id"))
    },
    Some("""WITH e AS (
           |  SELECT user_id AS station_id, value, epoch_ns(ts)//1000000 AS ms,
           |    CASE event_type WHEN 'click' THEN 'RA BR' WHEN 'signup' THEN 'SN'
           |      WHEN 'purchase' THEN 'FZRA' WHEN 'error' THEN '' END AS wx
           |  FROM events
           |  WHERE epoch_ns(ts)//1000000 >= 1704844800000 AND epoch_ns(ts)//1000000 <= 1708300800000),
           |c AS (
           |  SELECT *,
           |    CASE WHEN wx IS NOT NULL AND wx != '' THEN
           |        CASE WHEN regexp_matches(wx, '(^|\s)(SN|BLSN|DRSN)(\s|$)') THEN 'snow'
           |             WHEN regexp_matches(wx, '(^|\s)(FZRA|FZDZ|PL|GR|GS|IC)(\s|$)') THEN 'ice'
           |             ELSE 'rain' END
           |      WHEN value IS NOT NULL AND value <= 2.0 THEN 'snow'
           |      ELSE 'rain' END AS precip_type
           |  FROM e)
           |SELECT station_id,
           |  GREATEST(1704844800000, MIN(ms)) AS start_ms,
           |  LEAST(1708300800000, MAX(ms)) AS end_ms,
           |  MIN(value) AS temp_low, MAX(value) AS temp_high,
           |  CAST(ROUND(100.0
           |    * EXP(17.625 * (CAST(SUM(CAST(value - 2.0 AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value)) / (243.04 + (CAST(SUM(CAST(value - 2.0 AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value))))
           |    / EXP(17.625 * (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value)) / (243.04 + (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value))))) AS BIGINT) AS humidity,
           |  CAST(SUM(CASE WHEN value >= 0 AND precip_type = 'rain' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)/100.0 AS rain_amt,
           |  CAST(SUM(CASE WHEN value >= 0 AND precip_type = 'snow' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)/10.0 AS snow_amt,
           |  CAST(SUM(CASE WHEN value >= 0 AND precip_type = 'ice' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)/100.0 AS ice_amt
           |FROM c GROUP BY station_id ORDER BY station_id""".stripMargin))

  val all: Seq[Q] = Seq(q27, q28, q29, q30)
}
