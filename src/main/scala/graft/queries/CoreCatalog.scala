package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Exact._
import graft.sources.Tables
import graft.operators.{Rollups, Scoring, Weather}

/** One catalog entry: a Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver replays at sf0.01.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Core relational surface (SURVEY.md §2 table A): the reference
  * oracle's canned DuckDB queries re-expressed Spark-first.
  * Reference anchors cite crates/oracle/src/db/weather_data.rs and
  * crates/oracle/src/oracle.rs.
  */
object CoreCatalog {

  // Shared SQL fragments -----------------------------------------------------

  /** events timestamp at millisecond floor, identical in both engines:
    * Spark floors raw parquet nanos; DuckDB 1.x truncates ns→us on
    * read, then // floors to ms — truncation composes.
    */
  private val duckMs = "epoch_ns(ts)//1000000"

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)
  private def msCol = expr("ts_ns div 1000000")

  // q2 — predicate + projection pushdown (weather_data.rs:107-174) ----------

  private val q2 = Q(
    "q2_filter_project",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), to_date(col("l_shipdate")).as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           |  CAST(l_shipdate AS DATE) AS ship_date
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           |  AND l_quantity < 10
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  // q3 — fact⋈dim join + grouped agg + top-k (TPC-H Q3 shape) ---------------

  private val q3 = Q(
    "q3_join_agg",
    (s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1996-07-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"), col("o_orderpriority"))
        .agg(dsum2(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },
    Some("""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND o_orderdate < TIMESTAMP '1996-07-01'
           |  AND l_shipdate > TIMESTAMP '1996-07-01'
           |GROUP BY 1, 2, 3
           |ORDER BY revenue DESC, l_orderkey
           |LIMIT 20""".stripMargin))

  // q4 — broadcast dim join --------------------------------------------------

  private val q4 = Q(
    "q4_broadcast_join",
    (s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_size") <= 10)
      Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  COUNT(*) AS n
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE p_size <= 10
           |GROUP BY p_brand ORDER BY p_brand""".stripMargin))

  // q5 — multi-way star join (TPC-H Q5 shape) -------------------------------

  private val q5 = Q(
    "q5_multi_join",
    (s, dir) => {
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum2(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
           |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin))

  // q6 — FILTER-guarded aggregates (weather_data.rs:365-373,531-552) --------

  private val q6 = Q(
    "q6_conditional_agg",
    (s, dir) =>
      ev(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_all"),
          count(when(col("value") > 50, 1)).as("n_hi"),
          dsum2(when(col("value") >= 10 && col("value") <= 90, dec(col("value")))).as("sum_mid"),
          max(when(col("value") < 10, col("value"))).as("max_lo"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type,
           |  COUNT(*) AS n_all,
           |  COUNT(*) FILTER (WHERE value > 50) AS n_hi,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE value >= 10 AND value <= 90) AS DOUBLE) AS sum_mid,
           |  MAX(value) FILTER (WHERE value < 10) AS max_lo
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  // q7 — ORDER BY + LIMIT top-k ---------------------------------------------

  private val q7 = Q(
    "q7_topk",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15),
    Some("""SELECT o_orderkey, o_totalprice, o_orderpriority
           |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin))

  // q8 — DISTINCT dimension extraction (stations(), weather_data.rs:693-750)

  private val q8 = Q(
    "q8_distinct_dims",
    (s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_mktsegment"), col("n_name"))
        .distinct()
        .orderBy(col("c_mktsegment"), col("n_name")),
    Some("""SELECT DISTINCT c_mktsegment, n_name
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           |ORDER BY c_mktsegment, n_name""".stripMargin))

  // q9 — dedup-latest per key (deduped_forecasts, weather_data.rs:213-235) --

  private val q9 = Q(
    "q9_latest_per_key",
    (s, dir) =>
      Rollups.latestPerKey(ev(s, dir), Seq(col("user_id")), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id"), col("value"), col("event_type"))
        .orderBy(col("user_id")),
    Some("""SELECT user_id, event_id, value, event_type FROM (
           |  SELECT user_id, event_id, value, event_type,
           |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           |  FROM events) t WHERE rn = 1 ORDER BY user_id""".stripMargin))

  // q10 — LEAD chain detection (qpf_duration, weather_data.rs:256-266) ------

  private val q10 = Q(
    "q10_lead_chain",
    (s, dir) =>
      Rollups.leadChain(ev(s, dir), col("user_id"), col("event_type"), msCol, 600000L)
        .orderBy(col("key"), col("bucket")),
    Some(s"""SELECT user_id AS key, event_type AS bucket, COUNT(*) AS row_count,
            |  CAST(SUM(CASE WHEN next_ms IS NOT NULL AND next_ms - ts_ms <= 600000 THEN 1 ELSE 0 END) AS BIGINT) AS chain_count
            |FROM (
            |  SELECT user_id, event_type, $duckMs AS ts_ms,
            |    LEAD($duckMs) OVER (PARTITION BY user_id, event_type ORDER BY $duckMs) AS next_ms
            |  FROM events) t
            |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // q11 — per-key daily rollup (daily_observations, weather_data.rs:576-691)

  private val q11 = Q(
    "q11_daily_rollup",
    (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).cast("string").as("date"))
        .agg(
          min(col("value")).as("temp_low"),
          max(col("value")).as("temp_high"),
          davg(col("value")).as("avg_value"),
          max(Weather.guarded(col("value"), 0, 100)).as("guard_high"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("date")),
    Some("""SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
           |  MIN(value) AS temp_low, MAX(value) AS temp_high,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value,
           |  MAX(value) FILTER (WHERE value IS NOT NULL AND value >= 0 AND value <= 100) AS guard_high,
           |  COUNT(*) AS n
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // q12 — Magnus-formula humidity (weather_data.rs:540-546) -----------------

  private val q12 = Q(
    "q12_magnus_humidity",
    (s, dir) => {
      val t = ev(s, dir).groupBy(col("user_id"))
        .agg((sum(dec(col("value"))).cast("double") / count(col("value"))).as("tv"))
      t.select(col("user_id"),
          Weather.magnusHumidity(col("tv"), col("tv") - 2.0).as("humidity"))
        .orderBy(col("user_id"))
    },
    Some("""WITH t AS (
           |  SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS tv
           |  FROM events GROUP BY user_id)
           |SELECT user_id,
           |  CAST(ROUND(100.0 * EXP(17.625 * (tv - 2.0) / (243.04 + (tv - 2.0))) / EXP(17.625 * tv / (243.04 + tv))) AS BIGINT) AS humidity
           |FROM t ORDER BY user_id""".stripMargin))

  // q132 — corrupt-row tolerance on the Magnus surface: one planted
  // physically-impossible reading (tv = −243.04 °C, the formula's
  // pole) rides the q12 chain; the humidity for it must come out NULL
  // (surfaced as −1 via COALESCE so the row survives the hash compare)
  // while every real row is untouched. Under plain ANSI division the
  // single garbage row would kill the WHOLE job — this entry gates the
  // r15 try_divide fix end-to-end against DuckDB's division-by-zero
  // (NULL) semantics. The planted value arrives through the same
  // decimal-mean path as real data: DECIMAL(18,2) −243.04 is exact,
  // its double conversion identical in both engines, and
  // 243.04 + (−243.04) is exactly 0.0 in IEEE.

  private val q132 = Q(
    "q132_corrupt_row_null",
    (s, dir) => {
      val t = ev(s, dir).groupBy(col("user_id"))
        .agg((sum(dec(col("value"))).cast("double") / count(col("value"))).as("tv"))
        .unionByName(s.range(1).select(lit(999999L).as("user_id"),
          lit(-243.04).cast("double").as("tv")))
      t.select(col("user_id"),
          coalesce(Weather.magnusHumidity(col("tv"), col("tv") - 2.0), lit(-1L))
            .as("humidity"))
        .orderBy(col("user_id"))
    },
    Some("""WITH t AS (
           |  SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS tv
           |  FROM events GROUP BY user_id
           |  UNION ALL SELECT 999999, CAST(-243.04 AS DOUBLE))
           |SELECT user_id,
           |  COALESCE(CAST(ROUND(100.0 * EXP(17.625 * (tv - 2.0) / (243.04 + (tv - 2.0))) / EXP(17.625 * tv / (243.04 + tv))) AS BIGINT), -1) AS humidity
           |FROM t ORDER BY user_id""".stripMargin))

  // q13 — regexp classification → per-class sums (weather_data.rs:514-552) --

  private val q13 = Q(
    "q13_classify_agg",
    (s, dir) => {
      // Two screens before each regex, identical in both dialects:
      // an EQUALITY fast path (the common case — event_type IS the
      // bare token, where `u = 'SIGNUP'` certifies the word-boundary
      // match with no regex at all), then a literal `contains`
      // pre-screen for multi-token values (the boundary pattern can
      // only match rows containing the literal, and codegen'd
      // substring search is ~100× cheaper per row than
      // java.util.regex). The regex now runs only on multi-token
      // rows that contain a token — r7 diag showed two rlikes over
      // every row costing 4.2 s of serial CPU at sf0.1. Both screens
      // are semantic no-ops (equality ⊆ boundary match ⊆ contains).
      val u = upper(col("event_type"))
      val cls = when(u.isin("SIGNUP", "PURCHASE") ||
            ((u.contains("SIGNUP") || u.contains("PURCHASE")) &&
              u.rlike("(^|\\s)(SIGNUP|PURCHASE)(\\s|$)")), "snow")
        .when(u.isin("ERROR", "CRASH") ||
            ((u.contains("ERROR") || u.contains("CRASH")) &&
              u.rlike("(^|\\s)(ERROR|CRASH)(\\s|$)")), "ice")
        .otherwise("rain")
      ev(s, dir).withColumn("precip_type", cls)
        .groupBy(col("precip_type"))
        .agg(dsum(col("value")).as("amt"), count(lit(1)).as("n"))
        .orderBy(col("precip_type"))
    },
    Some("""SELECT CASE
           |    WHEN UPPER(event_type) IN ('SIGNUP', 'PURCHASE')
           |      OR ((contains(UPPER(event_type), 'SIGNUP') OR contains(UPPER(event_type), 'PURCHASE'))
           |        AND regexp_matches(UPPER(event_type), '(^|\s)(SIGNUP|PURCHASE)(\s|$)')) THEN 'snow'
           |    WHEN UPPER(event_type) IN ('ERROR', 'CRASH')
           |      OR ((contains(UPPER(event_type), 'ERROR') OR contains(UPPER(event_type), 'CRASH'))
           |        AND regexp_matches(UPPER(event_type), '(^|\s)(ERROR|CRASH)(\s|$)')) THEN 'ice'
           |    ELSE 'rain' END AS precip_type,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amt,
           |  COUNT(*) AS n
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  // q14 — unit conversion expr (convert_temperature, weather_data.rs:54-60) -

  private val q14 = Q(
    "q14_unit_convert",
    (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(Weather.cToF(col("value"))).as("f_low"),
          max(Weather.cToF(col("value"))).as("f_high"))
        .orderBy(col("user_id")),
    Some("""SELECT user_id,
           |  MIN(value * 9 / 5 + 32) AS f_low,
           |  MAX(value * 9 / 5 + 32) AS f_high
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  // q15 — FULL OUTER combine of per-field daily aggs (weather_data.rs:347-358)

  private val q15 = Q(
    "q15_full_outer_combine",
    (s, dir) => {
      // One conditional-agg pass replaces the chained FULL OUTER joins
      // of three per-type groupBys: grouping the IN-filtered scan
      // yields exactly the (user, date) keys with ≥1 of the three
      // types, and a FILTER-guarded decimal sum is NULL for an absent
      // type — the same rows, nulls, and schema with ONE scan and zero
      // joins (the r7 plan read three full scans of the fact table;
      // at 100× that is the difference that matters). The oracle keeps
      // the reference's FULL OUTER shape verbatim (daily_precip,
      // weather_data.rs:347-358) — same result set by construction
      // FOR NON-NULL KEYS: a FULL OUTER join never matches NULL
      // (user_id, date) keys (each side would emit its own row) while
      // a groupBy collapses them into one, so both shapes filter NULL
      // keys explicitly (ADVICE r8) — the single-scan ≡ outer-chain
      // equivalence is structural, not an accident of the data.
      def amt(t: String, as: String) =
        sum(when(col("event_type") === t, dec(col("value")))).cast("double").as(as)
      ev(s, dir)
        .filter(col("event_type").isin("click", "view", "purchase"))
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .withColumn("date", to_date(col("ts")).cast("string"))
        .groupBy(col("user_id"), col("date"))
        .agg(amt("click", "click_amt"), amt("view", "view_amt"),
          amt("purchase", "purchase_amt"))
        .orderBy(col("user_id"), col("date"))
    },
    Some("""WITH c AS (SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
           |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS click_amt
           |  FROM events WHERE event_type = 'click'
           |    AND user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
           |v AS (SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
           |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS view_amt
           |  FROM events WHERE event_type = 'view'
           |    AND user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
           |p AS (SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
           |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_amt
           |  FROM events WHERE event_type = 'purchase'
           |    AND user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
           |cv AS (SELECT COALESCE(c.user_id, v.user_id) AS user_id, COALESCE(c.date, v.date) AS date,
           |    c.click_amt, v.view_amt
           |  FROM c FULL OUTER JOIN v ON c.user_id = v.user_id AND c.date = v.date)
           |SELECT COALESCE(cv.user_id, p.user_id) AS user_id, COALESCE(cv.date, p.date) AS date,
           |  cv.click_amt, cv.view_amt, p.purchase_amt
           |FROM cv FULL OUTER JOIN p ON cv.user_id = p.user_id AND cv.date = p.date
           |ORDER BY user_id, date""".stripMargin))

  // q16 — DISTINCT ON by computed ranking (best_qpf_duration, :267-271) -----

  private val q16 = Q(
    "q16_best_duration",
    (s, dir) =>
      Rollups.bestByRatio(
          Rollups.leadChain(ev(s, dir), col("user_id"), col("event_type"), msCol, 600000L))
        .orderBy(col("key")),
    Some(s"""WITH ch AS (
            |  SELECT user_id AS key, event_type AS bucket, COUNT(*) AS row_count,
            |    CAST(SUM(CASE WHEN next_ms IS NOT NULL AND next_ms - ts_ms <= 600000 THEN 1 ELSE 0 END) AS BIGINT) AS chain_count
            |  FROM (
            |    SELECT user_id, event_type, $duckMs AS ts_ms,
            |      LEAD($duckMs) OVER (PARTITION BY user_id, event_type ORDER BY $duckMs) AS next_ms
            |    FROM events) t
            |  GROUP BY 1, 2)
            |SELECT key, bucket, row_count, chain_count FROM (
            |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY CAST(chain_count AS DOUBLE) / row_count DESC, bucket ASC) AS rn
            |  FROM ch) r WHERE rn = 1 ORDER BY key""".stripMargin))

  // q17 — Over/Par/Under entry scoring (oracle.rs:484-770) ------------------

  /** Synthetic market over events: "forecast" = latest pre-noon value
    * per user-day, "observed" = daily max; entrant choice derived from
    * user_id. Inner-join semantics mirror the reference's skip-if-
    * missing continues.
    */
  private def scoresDf(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).withColumn("date", to_date(col("ts")).cast("string"))
    val fc = Rollups.latestPerKey(
        e.filter(hour(col("ts")) < 12), Seq(col("user_id"), col("date")), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("date"), round(col("value")).cast("long").as("fc"))
    val obs = e.groupBy(col("user_id"), col("date"))
      .agg(round(max(col("value"))).cast("long").as("obs"))
    val choice = element_at(array(lit("over"), lit("par"), lit("under")), (pmod(col("user_id"), lit(3)) + 1).cast("int"))
    fc.join(obs, Seq("user_id", "date"))
      .withColumn("choice", choice)
      .withColumn("pts", Scoring.oupPoints(col("choice"), col("fc"), col("obs")))
      .groupBy(col("user_id"))
      .agg(sum(col("pts")).as("base_score"))
  }

  private val scoresSql =
    """SELECT user_id, CAST(SUM(pts) AS BIGINT) AS base_score FROM (
      |  SELECT fc.user_id,
      |    CASE WHEN choice = 'over'  AND obs > fc THEN 10
      |         WHEN choice = 'par'   AND obs = fc THEN 20
      |         WHEN choice = 'under' AND obs < fc THEN 10
      |         ELSE 0 END AS pts
      |  FROM (
      |    SELECT user_id, date, fc,
      |      CASE user_id % 3 WHEN 0 THEN 'over' WHEN 1 THEN 'par' ELSE 'under' END AS choice
      |    FROM (
      |      SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
      |        CAST(ROUND(value) AS BIGINT) AS fc,
      |        row_number() OVER (PARTITION BY user_id, CAST(CAST(ts AS DATE) AS VARCHAR) ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events WHERE EXTRACT(hour FROM ts) < 12) t WHERE rn = 1) fc
      |  JOIN (
      |    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
      |      CAST(ROUND(MAX(value)) AS BIGINT) AS obs
      |    FROM events GROUP BY 1, 2) ob
      |  ON fc.user_id = ob.user_id AND fc.date = ob.date) x
      |GROUP BY user_id""".stripMargin

  private val q17 = Q(
    "q17_score_entries",
    (s, dir) => scoresDf(s, dir).orderBy(col("user_id")),
    Some(s"SELECT user_id, base_score FROM ($scoresSql) sc ORDER BY user_id"))

  // q18 — score-desc ranking w/ tie-break, top-k (oracle.rs:745-800) --------

  private val q18 = Q(
    "q18_rank_winners",
    (s, dir) => {
      val sc = scoresDf(s, dir)
        .withColumn("event", pmod(col("user_id"), lit(5)))
        .withColumn("total_score", Scoring.totalScore(col("base_score"), col("user_id") * 37))
      Scoring.rankWinners(sc, col("event"), col("total_score"), 3)
        .select(col("event"), col("rank"), col("user_id"), col("total_score"))
        .orderBy(col("event"), col("rank"))
    },
    Some(s"""WITH sc AS ($scoresSql),
            |tot AS (
            |  SELECT user_id, user_id % 5 AS event,
            |    CAST(GREATEST(10000, base_score * 10000) - (user_id * 37) % 10000 AS BIGINT) AS total_score
            |  FROM sc)
            |SELECT event, rank, user_id, total_score FROM (
            |  SELECT *, CAST(row_number() OVER (PARTITION BY event ORDER BY total_score DESC) AS INT) AS rank
            |  FROM tot) r WHERE rank <= 3 ORDER BY event, rank""".stripMargin))

  // q19 — semi-join / EXISTS -------------------------------------------------

  private val q19 = Q(
    "q19_semi_join",
    (s, dir) => {
      val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= 48).select(col("l_orderkey"))
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 48)
           |ORDER BY o_orderkey""".stripMargin))

  // q20 — UNION-by-name schema evolution (weather_data.rs:198-211) ----------

  private val q20 = Q(
    "q20_union_schema_evo",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val cut = lit("1999-01-01").cast("timestamp")
      val old = l.filter(col("l_shipdate") < cut).select(col("l_orderkey"), col("l_quantity"))
      val nw = l.filter(col("l_shipdate") >= cut).select(col("l_orderkey"), col("l_quantity"), col("l_tax"))
      old.unionByName(nw, allowMissingColumns = true)
        .groupBy(col("l_tax").isNotNull.as("has_tax"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
          dsum(coalesce(col("l_tax"), lit(0))).as("sum_tax"))
        .orderBy(col("has_tax"))
    },
    Some("""SELECT l_tax IS NOT NULL AS has_tax, COUNT(*) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(COALESCE(l_tax, 0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_tax
           |FROM (
           |  SELECT l_orderkey, l_quantity FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
           |  UNION ALL BY NAME
           |  SELECT l_orderkey, l_quantity, l_tax FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01')
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // q21 — outcome permutation enumeration (outcome_generator.rs:5-14) -------

  private val q21 = Q(
    "q21_outcome_perms",
    (s, dir) => {
      val players = ev(s, dir).select(col("user_id")).distinct().orderBy(col("user_id")).limit(8)
      Scoring.rankingPermutations(players, 3)
        .orderBy(col("p1"), col("p2"), col("p3"))
    },
    Some("""WITH p AS (SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 8)
           |SELECT CAST(a.user_id AS BIGINT) AS p1, CAST(b.user_id AS BIGINT) AS p2, CAST(c.user_id AS BIGINT) AS p3
           |FROM p a, p b, p c
           |WHERE a.user_id <> b.user_id AND a.user_id <> c.user_id AND b.user_id <> c.user_id
           |UNION ALL SELECT -1, -1, -1
           |ORDER BY p1, p2, p3""".stripMargin))

  // q22 — GREATEST/LEAST clamping (weather_data.rs:177-189) -----------------

  private val q22 = Q(
    "q22_greatest_least_clamp",
    (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"))
        .agg(
          greatest(lit("2024-01-05").cast("date"), min(to_date(col("ts")))).cast("string").as("start_date"),
          least(lit("2024-03-01").cast("date"), max(to_date(col("ts")))).cast("string").as("end_date"))
        .orderBy(col("user_id")),
    Some("""SELECT user_id,
           |  CAST(GREATEST(DATE '2024-01-05', MIN(CAST(ts AS DATE))) AS VARCHAR) AS start_date,
           |  CAST(LEAST(DATE '2024-03-01', MAX(CAST(ts AS DATE))) AS VARCHAR) AS end_date
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  // q23 — gap sessionization (streaming analog in graft.streaming) ----------

  private val q23 = Q(
    "q23_sessionize",
    (s, dir) =>
      Rollups.sessionize(ev(s, dir).withColumn("ms", msCol), col("user_id"), col("ms"), col("event_id"), 1800000L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"), (max(col("ms")) - min(col("ms"))).as("dur_ms"), min(col("ms")).as("start_ms"))
        .orderBy(col("user_id"), col("session_idx")),
    Some(s"""WITH e AS (SELECT user_id, event_id, $duckMs AS ms FROM events),
            |f AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS nw
            |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
            |g AS (SELECT *, CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx FROM f)
            |SELECT user_id, session_idx, COUNT(*) AS n_events, MAX(ms) - MIN(ms) AS dur_ms, MIN(ms) AS start_ms
            |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // q24 — date-partitioned lake round-trip with partition pruning
  // (file_access.rs filename-date pruning → real partition columns).
  // Writes the events table into a Lake layout, reads a date range
  // back (pruned scan), and aggregates — proving partition fidelity.

  private val q24 = Q(
    "lake_daily_prune",
    (s, dir) => {
      val path = s"/tmp/graft_lake/${new java.io.File(dir).getName}/events"
      graft.sources.Lake.write(ev(s, dir).drop("ts_ns"), path, to_date(col("ts")))
      graft.sources.Lake.readRange(s, path, "2024-01-10", "2024-01-20")
        .groupBy(col("p_date").cast("string").as("date"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("date"))
    },
    Some("""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS date, COUNT(*) AS n,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events
           |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[Q] = Seq(q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13,
    q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q132)
}
