package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Dedup, Kmv, Stats, TextAnalysis => TA}
import PipelineCatalog.polySql

/** The SKETCH family of SURVEY.md §2C, split out of PipelineCatalog
  * (VERDICT r15 #5): KMV distinct/merge/intersect/incremental, the
  * deterministic HLL entries, CMS heavy hitters and its incremental
  * advance, sample quantiles, and stratified allocation — all
  * bounded-exchange, mergeability oracle-gated. Registration stays in
  * PipelineCatalog.all (same keys, same order).
  */
object SketchCatalog {

  // q98_heavy_hitters — count-min-sketch frequency profile: words
  // whose min-over-4-rows bucket sum clears 2% of total occurrences
  // (SF-independent integer threshold), with the exact count alongside
  // (est >= cnt always — CMS only over-counts). The sketch groupBy has
  // a knob-bounded key space (4×256 cells), so no vocabulary-sized
  // state exists anywhere on the sketch path.

  private[queries] val heavyHitters = Q(
    "q98_heavy_hitters",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val occ = d.select(explode(Dedup.hashedNgramSeq(d, col("text"), 1)).as("ng"))
      graft.operators.Stats.cmsHeavyHitters(occ, col("ng"), 4, 256, 2, 100)
        .orderBy(col("ng"))
    },
    Some(s"""WITH words AS (SELECT string_split(text, ' ') AS w FROM documents),
            |occ0 AS (SELECT unnest(w) AS t FROM words),
            |occ AS (SELECT ${polySql("t", Dedup.PolyB1, Dedup.PolyP1)} AS ng FROM occ0),
            |seeds AS (SELECT unnest(generate_series(0, 3)) AS s),
            |sketch AS (SELECT s, (ng * (2*s+1) + (s*7919+1)) % ${Dedup.PolyP1} % 256 AS bucket,
            |    CAST(COUNT(*) AS BIGINT) AS cell
            |  FROM occ CROSS JOIN seeds GROUP BY 1, 2),
            |th AS (SELECT CAST(COUNT(*) AS BIGINT) * 2 // 100 AS min_est FROM occ),
            |keys AS (SELECT DISTINCT ng FROM occ),
            |est AS (SELECT ng, MIN(cell) AS est
            |  FROM (SELECT ng, s, (ng * (2*s+1) + (s*7919+1)) % ${Dedup.PolyP1} % 256 AS bucket
            |        FROM keys CROSS JOIN seeds) k
            |  JOIN sketch USING (s, bucket) GROUP BY ng),
            |hit AS (SELECT ng, est FROM est CROSS JOIN th WHERE est >= min_est),
            |exact AS (SELECT ng, CAST(COUNT(*) AS BIGINT) AS cnt FROM occ
            |  WHERE ng IN (SELECT ng FROM hit) GROUP BY ng)
            |SELECT h.ng, h.est, x.cnt FROM hit h JOIN exact x USING (ng)
            |ORDER BY ng""".stripMargin))

  // q114_kmv_distinct — K-minimum-values distinct-count sketch: the
  // PORTABLE approximate-distinct (HLL++ exists in operators/Stats
  // but its hashing isn't oracle-replayable; KMV over the portable
  // poly-hash is fully deterministic, so the ORACLE REPLAYS THE
  // SKETCH — an approximate algorithm under the exact gate, like
  // q59's minhash estimator). est = (k−1)·P div h_k with h_k the
  // k-th smallest distinct hash; groups with < k distinct values
  // report exactly (standard KMV small-side). Scale shape: distinct
  // is a partial-agg; the k-smallest per group ride the bounded
  // TopKAgg (≤ k pairs per group per mapper cross the wire, never
  // the value set); the sketch is mergeable by construction.

  private[queries] val kmvDistinct = Q(
    "q114_kmv_distinct",
    (s, dir) => {
      val k = 64
      val e = Tables.events(s, dir)
      // salted+suffixed so the polynomial WRAPS the modulus: the bare
      // hash of a short numeric string stays < 131^len and is nowhere
      // near uniform on [0, P) — the first cut estimated 19M for 1500
      val h = Dedup.polyHash(e, concat(col("user_id").cast("string"), lit("/kmv")),
        Dedup.PolyB1, Dedup.PolyP1)
      e.select(col("event_type"), h.as("h")).distinct()
        .groupBy(col("event_type"))
        .agg(graft.functions.TopKAgg.topk(k)((-col("h")).cast("double"), col("h")).as("tk"),
          count(lit(1)).as("n_exact"))
        .withColumn("est", when(col("n_exact") < k, col("n_exact"))
          .otherwise(expr(s"CAST(${k - 1} AS BIGINT) * ${Dedup.PolyP1}L div element_at(tk, $k)._2")))
        .select(col("event_type"), col("n_exact"), col("est"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH dh AS (SELECT DISTINCT event_type,
            |    ${polySql("(CAST(user_id AS VARCHAR) || '/kmv')", Dedup.PolyB1, Dedup.PolyP1)} AS h
            |  FROM events),
            |r AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM dh),
            |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact FROM dh GROUP BY event_type),
            |kth AS (SELECT event_type, h AS hk FROM r WHERE rn = 64)
            |SELECT n.event_type, n.n_exact,
            |  CASE WHEN n.n_exact < 64 THEN n.n_exact
            |       ELSE CAST(63 AS BIGINT) * ${Dedup.PolyP1} // kth.hk END AS est
            |FROM n LEFT JOIN kth USING (event_type) ORDER BY n.event_type""".stripMargin))

  // q115_kmv_merge — KMV MERGEABILITY, the property that makes the
  // sketch work at 100 TB: per-(type, day) sketches (the persisted
  // daily state a lake job writes) merge by taking the k smallest of
  // the union'd members, and the merged estimate EQUALS the direct
  // whole-corpus estimate exactly — k-smallest-of-union-of-k-smallest
  // ≡ k-smallest-overall (days below k keep everything). The entry
  // outputs both paths plus the equality flag; the oracle replays
  // both and must agree on the flag being true everywhere.

  private[queries] val kmvMerge = Q(
    "q115_kmv_merge",
    (s, dir) => {
      val k = 64
      val e = Tables.events(s, dir)
      val h = Dedup.polyHash(e, concat(col("user_id").cast("string"), lit("/kmv")),
        Dedup.PolyB1, Dedup.PolyP1)
      val dh = e.select(col("event_type"), to_date(col("ts")).as("day"), h.as("h")).distinct()
      def estCol(tk: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(n < k, n).otherwise(
          expr(s"CAST(${k - 1} AS BIGINT) * ${Dedup.PolyP1}L div element_at(tk, $k)._2"))
      val perDay = dh.groupBy(col("event_type"), col("day"))
        .agg(graft.functions.TopKAgg.topk(k)((-col("h")).cast("double"), col("h")).as("tk"))
      val merged = perDay
        .select(col("event_type"), col("day"), explode(col("tk")).as("p"))
        .select(col("event_type"), col("p._2").as("h")).distinct()
        .groupBy(col("event_type"))
        .agg(graft.functions.TopKAgg.topk(k)((-col("h")).cast("double"), col("h")).as("tk"),
          count(lit(1)).as("nm"))
        .select(col("event_type"), estCol(col("tk"), col("nm")).as("est_merged"))
      val direct = dh.select(col("event_type"), col("h")).distinct()
        .groupBy(col("event_type"))
        .agg(graft.functions.TopKAgg.topk(k)((-col("h")).cast("double"), col("h")).as("tk"),
          count(lit(1)).as("nd"))
        .select(col("event_type"), estCol(col("tk"), col("nd")).as("est_direct"))
      val nDays = dh.groupBy(col("event_type")).agg(countDistinct(col("day")).as("n_days"))
      merged.join(direct, Seq("event_type")).join(nDays, Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("est_merged"), col("est_direct"),
          (col("est_merged") === col("est_direct")).as("merge_exact"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH dh AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
            |    ${polySql("(CAST(user_id AS VARCHAR) || '/kmv')", Dedup.PolyB1, Dedup.PolyP1)} AS h
            |  FROM events),
            |perday AS (SELECT event_type, day, h FROM (
            |    SELECT event_type, day, h, row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rn
            |    FROM dh) t WHERE rn <= 64),
            |munion AS (SELECT DISTINCT event_type, h FROM perday),
            |mrank AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
            |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nm FROM munion),
            |mest AS (SELECT event_type,
            |    CASE WHEN MAX(nm) < 64 THEN MAX(nm)
            |         ELSE CAST(63 AS BIGINT) * ${Dedup.PolyP1} // MAX(CASE WHEN rn = 64 THEN h END) END AS est_merged
            |  FROM mrank GROUP BY event_type),
            |drank AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
            |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
            |  FROM (SELECT DISTINCT event_type, h FROM dh) t),
            |dest AS (SELECT event_type,
            |    CASE WHEN MAX(nd) < 64 THEN MAX(nd)
            |         ELSE CAST(63 AS BIGINT) * ${Dedup.PolyP1} // MAX(CASE WHEN rn = 64 THEN h END) END AS est_direct
            |  FROM drank GROUP BY event_type),
            |nd2 AS (SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days FROM dh GROUP BY event_type)
            |SELECT m.event_type, n.n_days, m.est_merged, d.est_direct,
            |  m.est_merged = d.est_direct AS merge_exact
            |FROM mest m JOIN dest d USING (event_type) JOIN nd2 n USING (event_type)
            |ORDER BY m.event_type""".stripMargin))

  // q117_kmv_dedup_report — the KMV ESTIMATOR feeding the dedup
  // report: per-SOURCE exact-dup profile (n_rows, estimated distinct
  // texts, estimated dup ppm) where q96's corpus-wide exact
  // md5-groupBy is replaced by the q114 sketch over the portable text
  // hash. This is the per-key scale path: at 100 TB the exact group
  // table is corpus-sized state, while the KMV exchange carries ≤ k
  // hashes per source per mapper (bounded TopKAgg) — the per-domain
  // dup-rate dashboard costs a dimension-sized aggregate. Same
  // planted +10000 exact copies as q96's corpus, KEYED by source so
  // every source carries real dup mass; est clamps at n_rows (KMV
  // can overestimate; a dup fraction below 0 is a lie) and groups
  // under k report exactly (standard KMV small-side). Deterministic
  // end-to-end — the oracle replays the sketch (q114 pattern).

  private[queries] val kmvDedupReport = Q(
    "q117_kmv_dedup_report",
    (s, dir) => {
      val k = 64
      val d = Tables.documents(s, dir).select(col("source"), col("doc_id"), col("text"))
      val c = d.unionByName(d.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select(col("source"), (col("doc_id") + 10000).as("doc_id"), col("text")))
      val h = Dedup.polyHash(c, concat(col("text"), lit("/kmv")),
        Dedup.PolyB1, Dedup.PolyP1)
      val rows = c.groupBy(col("source")).agg(count(lit(1)).as("n_rows"))
      val dh = c.select(col("source"), h.as("h")).distinct()
        .groupBy(col("source"))
        .agg(graft.functions.TopKAgg.topk(k)((-col("h")).cast("double"), col("h")).as("tk"),
          count(lit(1)).as("n_exact"))
        .withColumn("est0", when(col("n_exact") < k, col("n_exact"))
          .otherwise(expr(s"CAST(${k - 1} AS BIGINT) * ${Dedup.PolyP1}L div element_at(tk, $k)._2")))
      rows.join(dh.select(col("source"), col("est0")), Seq("source"))
        .withColumn("est_distinct", least(col("est0"), col("n_rows")))
        .withColumn("est_dup_ppm",
          expr("(n_rows - est_distinct) * 1000000 DIV n_rows"))
        .select(col("source"), col("n_rows"), col("est_distinct"), col("est_dup_ppm"))
        .orderBy(col("source"))
    },
    Some(s"""WITH c AS (SELECT source, doc_id, text FROM documents
            |  UNION ALL SELECT source, doc_id + 10000, text FROM documents WHERE doc_id % 10 = 0),
            |rows_ AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows FROM c GROUP BY source),
            |dh AS (SELECT DISTINCT source,
            |    ${polySql("(text || '/kmv')", Dedup.PolyB1, Dedup.PolyP1)} AS h FROM c),
            |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
            |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_exact FROM dh),
            |est AS (SELECT source,
            |    CASE WHEN MAX(n_exact) < 64 THEN MAX(n_exact)
            |         ELSE CAST(63 AS BIGINT) * ${Dedup.PolyP1} // MAX(CASE WHEN rn = 64 THEN h END) END AS est0
            |  FROM r GROUP BY source)
            |SELECT w.source, w.n_rows, least(e.est0, w.n_rows) AS est_distinct,
            |  (w.n_rows - least(e.est0, w.n_rows)) * 1000000 // w.n_rows AS est_dup_ppm
            |FROM rows_ w JOIN est e USING (source)
            |ORDER BY w.source""".stripMargin))

  // q118_kmv_incr — the INCREMENTAL KMV state operator (operators/
  // Kmv): per-(event_type, day) k-smallest sketches persisted as a
  // state table, advanced per batch by sketch-the-batch + exact merge
  // — history is never reread; the batch×state cost is |batch| +
  // |touched state rows| and every exchange carries ≤ k 8-byte hashes
  // per group per mapper. The planted batch is a new month of days
  // with half its users novel (+1000000) and half repeats of existing
  // ids, so the advance exercises both new-day append and cross-day
  // overlap at merge time. The per-type dashboard rollup merges the
  // advanced state rows (q117's shape fed from state instead of a
  // corpus rescan). The oracle replays sketch → advance → rollup
  // directly over the union corpus — legal because advance ≡
  // sketch-of-union by the q115 exact-mergeability contract.

  private[queries] val kmvIncr = Q(
    "q118_kmv_incr",
    (s, dir) => {
      val k = 64
      val e = Tables.events(s, dir)
      def h(c: org.apache.spark.sql.Column) =
        Dedup.polyHash(e, concat(c.cast("string"), lit("/kmv")), Dedup.PolyB1, Dedup.PolyP1)
      val grain = Seq(col("event_type"), col("day"))
      val base = e.select(col("event_type"), to_date(col("ts")).as("day"),
        h(col("user_id")).as("h"))
      val state0 = Kmv.sketch(base, grain, col("h"), k)
      val batch = e.select(col("event_type"), date_add(to_date(col("ts")), 30).as("day"),
        h(when(pmod(col("user_id"), lit(2)) === 0, col("user_id") + 1000000)
          .otherwise(col("user_id"))).as("h"))
      val state1 = Kmv.advance(state0, batch, grain, col("h"), k)
      val nDays = state1.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
      Kmv.merge(state1, Seq(col("event_type")), k)
        .select(col("event_type"), Kmv.estimate(col("ks"), k, Dedup.PolyP1).as("est_total"))
        .join(nDays, Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("est_total"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH base AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
            |    ${polySql("(CAST(user_id AS VARCHAR) || '/kmv')", Dedup.PolyB1, Dedup.PolyP1)} AS h
            |  FROM events),
            |batch AS (SELECT DISTINCT event_type, CAST(ts AS DATE) + 30 AS day,
            |    ${polySql("(CAST(CASE WHEN user_id % 2 = 0 THEN user_id + 1000000 ELSE user_id END AS VARCHAR) || '/kmv')", Dedup.PolyB1, Dedup.PolyP1)} AS h
            |  FROM events),
            |u AS (SELECT * FROM base UNION SELECT * FROM batch),
            |perday AS (SELECT event_type, day, h FROM (
            |    SELECT event_type, day, h, row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rn
            |    FROM u) t WHERE rn <= 64),
            |ndays AS (SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
            |  FROM perday GROUP BY event_type),
            |mu AS (SELECT DISTINCT event_type, h FROM perday),
            |mr AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
            |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nm FROM mu),
            |est AS (SELECT event_type,
            |    CASE WHEN MAX(nm) < 64 THEN MAX(nm)
            |         ELSE CAST(63 AS BIGINT) * ${Dedup.PolyP1} // MAX(CASE WHEN rn = 64 THEN h END) END AS est_total
            |  FROM mr GROUP BY event_type)
            |SELECT e.event_type, n.n_days, e.est_total
            |FROM est e JOIN ndays n USING (event_type)
            |ORDER BY e.event_type""".stripMargin))

  // q119_hll_distinct — deterministic HyperLogLog distinct count
  // (operators/Stats.hllRegisters/hllEstimate), closing the sketch
  // family's register-bounded half: where q114's KMV ships ≤ k hashes
  // per group, HLL ships ≤ m = 64 (idx, max-rho) register rows per
  // group per mapper WITH NO PRE-DISTINCT PASS AT ALL (max is
  // idempotent — duplicates never cost a shuffle). Spark's own
  // approx_count_distinct is the same algorithm but its xxHash64
  // register mapping is not replayable in DuckDB SQL; this one is
  // deterministic end-to-end: a 62-bit wide hash from the two portable
  // poly-hash pairs (h1·P2 + h2), rho = leading zeros + 1 via the
  // engine-portable length(bin(r)) bit-length (value-threshold
  // geometric — see Stats.hllRegisters on why trailing zeros bias), an
  // integer-scaled harmonic mean (exact BIGINT in both engines), and
  // the linear-counting small-range branch from a table of 63
  // integers precomputed in Scala and embedded as the SAME literals in
  // both dialects — libm's ln would not replay bit-identically.
  // n_exact rides alongside and err_ppm puts the estimator's accuracy
  // (σ ≈ 13% at m = 64) inside the gated result itself.

  private[queries] val hllDistinct = Q(
    "q119_hll_distinct",
    (s, dir) => {
      val e = Tables.events(s, dir)
      def ph(b: Int, p: Long) =
        Dedup.polyHash(e, concat(col("user_id").cast("string"), lit("/hll")), b, p)
      val wide = ph(Dedup.PolyB1, Dedup.PolyP1) * lit(Dedup.PolyP2) +
        ph(Dedup.PolyB2, Dedup.PolyP2)
      val est = Stats.hllEstimate(
        Stats.hllRegisters(e, Seq(col("event_type")), wide), Seq(col("event_type")))
      val exact = e.groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n_exact"))
      est.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_exact"), col("est"),
          expr("abs(est - n_exact) * 1000000 div n_exact").as("err_ppm"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH wh AS (SELECT event_type,
            |    (${polySql("(CAST(user_id AS VARCHAR) || '/hll')", Dedup.PolyB1, Dedup.PolyP1)} * ${Dedup.PolyP2}
            |     + ${polySql("(CAST(user_id AS VARCHAR) || '/hll')", Dedup.PolyB2, Dedup.PolyP2)}) AS wh
            |  FROM events),
            |rr AS (SELECT event_type, wh % 64 AS idx, (wh // 64) % 4294967296 AS r FROM wh),
            |reg AS (SELECT event_type, idx,
            |    MAX(CASE WHEN r = 0 THEN 33 ELSE 33 - length(bin(r)) END) AS reg
            |  FROM rr GROUP BY 1, 2),
            |agg AS (SELECT event_type,
            |    CAST(SUM(CAST(1 AS BIGINT) << (33 - reg)) AS BIGINT)
            |      + (64 - COUNT(*)) * ${1L << (Stats.HllW + 1)} AS s,
            |    64 - COUNT(*) AS v
            |  FROM reg GROUP BY 1),
            |fin AS (SELECT event_type, CAST(CASE
            |      WHEN v > 0 AND ${Stats.HllRawNum} // (${Stats.HllAlphaDen} * s) <= 160
            |        THEN (${Stats.hllLcSql})[v]
            |      ELSE ${Stats.HllRawNum} // (${Stats.HllAlphaDen} * s) END AS BIGINT) AS est
            |  FROM agg),
            |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
            |  FROM events GROUP BY 1)
            |SELECT x.event_type, x.n_exact, f.est,
            |  abs(f.est - x.n_exact) * 1000000 // x.n_exact AS err_ppm
            |FROM ex x JOIN fin f USING (event_type) ORDER BY x.event_type""".stripMargin))

  // q120_hll_merge — HLL MERGEABILITY at the register level: per-day
  // register tables max-merge to the per-type table EXACTLY (max is
  // associative), so persisted daily register state rolls up to any
  // grain with estimates identical to a direct whole-corpus pass —
  // the q115 contract for the register-bounded sketch. The oracle
  // replays both paths and the equality flag must be true everywhere.

  private[queries] val hllMergeQ = Q(
    "q120_hll_merge",
    (s, dir) => {
      val e = Tables.events(s, dir)
      def ph(b: Int, p: Long) =
        Dedup.polyHash(e, concat(col("user_id").cast("string"), lit("/hll")), b, p)
      val wide = ph(Dedup.PolyB1, Dedup.PolyP1) * lit(Dedup.PolyP2) +
        ph(Dedup.PolyB2, Dedup.PolyP2)
      val base = e.select(col("event_type"), to_date(col("ts")).as("day"), wide.as("wh"))
      val perDay = Stats.hllRegisters(base, Seq(col("event_type"), col("day")), col("wh"))
      val merged = Stats.hllEstimate(Stats.hllMerge(perDay, Seq(col("event_type"))),
          Seq(col("event_type"))).withColumnRenamed("est", "est_merged")
      val direct = Stats.hllEstimate(
          Stats.hllRegisters(base, Seq(col("event_type")), col("wh")), Seq(col("event_type")))
        .withColumnRenamed("est", "est_direct")
      val nDays = base.groupBy(col("event_type")).agg(countDistinct(col("day")).as("n_days"))
      merged.join(direct, Seq("event_type")).join(nDays, Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("est_merged"), col("est_direct"),
          (col("est_merged") === col("est_direct")).as("merge_exact"))
        .orderBy(col("event_type"))
    },
    Some {
      def estSql(regCte: String, out: String): String =
        s"""agg_$out AS (SELECT event_type,
           |    CAST(SUM(CAST(1 AS BIGINT) << (33 - reg)) AS BIGINT)
           |      + (64 - COUNT(*)) * ${1L << (Stats.HllW + 1)} AS s,
           |    64 - COUNT(*) AS v
           |  FROM $regCte GROUP BY 1),
           |$out AS (SELECT event_type, CAST(CASE
           |      WHEN v > 0 AND ${Stats.HllRawNum} // (${Stats.HllAlphaDen} * s) <= 160
           |        THEN (${Stats.hllLcSql})[v]
           |      ELSE ${Stats.HllRawNum} // (${Stats.HllAlphaDen} * s) END AS BIGINT) AS est
           |  FROM agg_$out)""".stripMargin
      s"""WITH wh AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |    (${polySql("(CAST(user_id AS VARCHAR) || '/hll')", Dedup.PolyB1, Dedup.PolyP1)} * ${Dedup.PolyP2}
         |     + ${polySql("(CAST(user_id AS VARCHAR) || '/hll')", Dedup.PolyB2, Dedup.PolyP2)}) AS wh
         |  FROM events),
         |rr AS (SELECT event_type, day, wh % 64 AS idx, (wh // 64) % 4294967296 AS r FROM wh),
         |regd AS (SELECT event_type, day, idx,
         |    MAX(CASE WHEN r = 0 THEN 33 ELSE 33 - length(bin(r)) END) AS reg
         |  FROM rr GROUP BY 1, 2, 3),
         |regm AS (SELECT event_type, idx, MAX(reg) AS reg FROM regd GROUP BY 1, 2),
         |regt AS (SELECT event_type, idx,
         |    MAX(CASE WHEN r = 0 THEN 33 ELSE 33 - length(bin(r)) END) AS reg
         |  FROM rr GROUP BY 1, 2),
         |${estSql("regm", "em")},
         |${estSql("regt", "et")},
         |nd AS (SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
         |  FROM wh GROUP BY 1)
         |SELECT m.event_type, nd.n_days, m.est AS est_merged, t.est AS est_direct,
         |  m.est = t.est AS merge_exact
         |FROM em m JOIN et t USING (event_type) JOIN nd USING (event_type)
         |ORDER BY m.event_type""".stripMargin
    })

  // q121_sample_quantiles — mergeable approximate quantiles via the
  // deterministic KMV row-sample (Stats.kmvRowSample): GK/KLL-class
  // quantile sketches are insertion-order-dependent, so they can never
  // pass a cross-engine hash gate — a bounded uniform sample CAN,
  // because KMV-threshold membership is a pure function of the data.
  // Rank error is O(1/√k); nearest-rank selection is integer-only
  // (1 + (p·(n−1)) DIV 100) and every output value is PICKED from the
  // data (zero cross-engine float arithmetic). The exact nearest-rank
  // quantiles ride alongside as the error audit — the full-sort
  // baseline the sample path exists to avoid at 100 TB, where the
  // approx plan is one bounded partial agg + a map-side filter over
  // ≤ k rows per group.

  private[queries] val sampleQuantiles = Q(
    "q121_sample_quantiles",
    (s, dir) => {
      val k = 256
      val e = Tables.events(s, dir)
      def ph(b: Int, p: Long) =
        Dedup.polyHash(e, concat(col("event_id").cast("string"), lit("/qs")), b, p)
      val w = pmod(ph(Dedup.PolyB1, Dedup.PolyP1) * lit(Dedup.PolyP2) +
        ph(Dedup.PolyB2, Dedup.PolyP2), lit(1L << 53))
      val base = e.select(col("event_type"), col("value"), w.as("w"))
      val sam = Stats.kmvRowSample(base, Seq("event_type"), col("w"), k)
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("value"))).as("sv"))
        .select(col("event_type"), size(col("sv")).cast("long").as("n_sample"),
          expr("element_at(sv, CAST(1 + (50*(size(sv)-1)) DIV 100 AS INT))").as("p50_s"),
          expr("element_at(sv, CAST(1 + (90*(size(sv)-1)) DIV 100 AS INT))").as("p90_s"),
          expr("element_at(sv, CAST(1 + (99*(size(sv)-1)) DIV 100 AS INT))").as("p99_s"))
      // Exact nearest-rank WITHOUT a per-group full sort (a
      // row_number window partitioned by event_type is a 5-task sort
      // of the whole fact table — the plan that dies at 100×):
      // histogram-guided rank lookup. One map-side-combinable count
      // per (type, unit-value bucket), a cumulative walk over that
      // DIMENSION-SIZED table to locate each target rank's bucket +
      // in-bucket offset, then a window over ONLY the rows of the ≤ 3
      // target buckets per group. The value at a sorted position is a
      // multiset statistic, so duplicate values across tie-arbitrary
      // row_numbers cannot change the output.
      // the histogram is dimension-sized (types × unit buckets) with
      // three consumers (cum walk, totals, final n_rows) — persist it
      // so the fact scan+agg behind it runs once
      val hist = e.groupBy(col("event_type"), floor(col("value")).cast("long").as("bk"))
        .agg(count(lit(1)).as("bn"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wcum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("bk"))
      val cum = hist.withColumn("cum", sum(col("bn")).over(wcum))
      val n = hist.groupBy(col("event_type")).agg(sum(col("bn")).as("n_rows"))
      val tgt = n.select(col("event_type"), explode(array(Seq(50, 90, 99).map(p =>
          struct(lit(p).as("p"), expr(s"1 + ($p*(n_rows-1)) DIV 100").as("idx"))): _*)).as("t"))
        .select(col("event_type"), col("t.p").as("p"), col("t.idx").as("idx"))
      val tb = tgt.join(cum, Seq("event_type"))
        .filter(col("idx") > col("cum") - col("bn") && col("idx") <= col("cum"))
        .select(col("event_type"), col("p"), col("bk"),
          (col("idx") - (col("cum") - col("bn"))).as("off"))
      val inb = e.select(col("event_type"), floor(col("value")).cast("long").as("bk"), col("value"))
        .join(broadcast(tb), Seq("event_type", "bk"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"), col("p"), col("bk")).orderBy(col("value"))
      val exact = inb.withColumn("rn", row_number().over(wb))
        .filter(col("rn") === col("off"))
        .groupBy(col("event_type"))
        .agg(
          max(when(col("p") === 50, col("value"))).as("p50_x"),
          max(when(col("p") === 90, col("value"))).as("p90_x"),
          max(when(col("p") === 99, col("value"))).as("p99_x"))
      n.join(sam, Seq("event_type")).join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_rows"), col("n_sample"),
          col("p50_s"), col("p90_s"), col("p99_s"),
          col("p50_x"), col("p90_x"), col("p99_x"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH b AS (SELECT event_type, value,
            |    (${polySql("(CAST(event_id AS VARCHAR) || '/qs')", Dedup.PolyB1, Dedup.PolyP1)} * ${Dedup.PolyP2}
            |     + ${polySql("(CAST(event_id AS VARCHAR) || '/qs')", Dedup.PolyB2, Dedup.PolyP2)}) % ${1L << 53} AS w
            |  FROM events),
            |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows FROM b GROUP BY 1),
            |r AS (SELECT event_type, w, row_number() OVER (PARTITION BY event_type ORDER BY w) AS rn FROM b),
            |t AS (SELECT r.event_type, r.w AS tw FROM r JOIN n USING (event_type)
            |  WHERE r.rn = LEAST(n.n_rows, 256)),
            |sam AS (SELECT b.event_type, b.value FROM b JOIN t USING (event_type) WHERE b.w <= t.tw),
            |sr AS (SELECT event_type, value,
            |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
            |    COUNT(*) OVER (PARTITION BY event_type) AS ns FROM sam),
            |sq AS (SELECT event_type, CAST(MAX(ns) AS BIGINT) AS n_sample,
            |    MAX(CASE WHEN rn = 1 + (50*(ns-1))//100 THEN value END) AS p50_s,
            |    MAX(CASE WHEN rn = 1 + (90*(ns-1))//100 THEN value END) AS p90_s,
            |    MAX(CASE WHEN rn = 1 + (99*(ns-1))//100 THEN value END) AS p99_s
            |  FROM sr GROUP BY 1),
            |xr AS (SELECT event_type, value,
            |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn FROM events),
            |xq AS (SELECT x.event_type,
            |    MAX(CASE WHEN rn = 1 + (50*(n_rows-1))//100 THEN value END) AS p50_x,
            |    MAX(CASE WHEN rn = 1 + (90*(n_rows-1))//100 THEN value END) AS p90_x,
            |    MAX(CASE WHEN rn = 1 + (99*(n_rows-1))//100 THEN value END) AS p99_x
            |  FROM xr x JOIN n USING (event_type) GROUP BY 1)
            |SELECT n.event_type, n.n_rows, sq.n_sample,
            |  sq.p50_s, sq.p90_s, sq.p99_s, xq.p50_x, xq.p90_x, xq.p99_x
            |FROM n JOIN sq USING (event_type) JOIN xq USING (event_type)
            |ORDER BY n.event_type""".stripMargin))

  // q122_cms_incr — incremental CMS heavy hitters: the batch×state
  // advance for the FREQUENCY sketch family (q114/q118's shape, for
  // counts instead of cardinality). State = the base corpus's 4×256
  // cell table (Stats.cmsCells — a few KB, history never reread) +
  // its current hitter list; a batch arrives; advance = cell-wise sum
  // of the batch's sketch (Stats.cmsMerge — CMS additivity makes
  // merge-of-sketches ≡ sketch-of-union EXACTLY, which is what the
  // oracle's one-pass union sketch verifies), candidates = previous
  // hitters ∪ the batch's keys (a key absent from both can't newly
  // cross the threshold without appearing — the standard tracked-
  // candidate contract), estimates via the shared Stats.cmsEstimate
  // broadcast probe against the merged cells, thresholded at 2% of
  // total occurrences. Every exchange is bounded: depth·width cells,
  // candidate keys, one 1-row total.

  private[queries] val cmsIncr = Q(
    "q122_cms_incr",
    (s, dir) => {
      val (depth, width) = (4, 256)
      val d = Tables.documents(s, dir)
      def occOf(f: org.apache.spark.sql.DataFrame) =
        f.select(explode(Dedup.hashedNgramSeq(f, col("text"), 1)).as("ng"))
      val occB = occOf(d.filter(col("doc_id") % 2 === 0))
      val occN = occOf(d.filter(col("doc_id") % 2 === 1))
      val state = Stats.cmsCells(occB, col("ng"), depth, width)
      val prevHit = Stats.cmsHeavyHitters(occB, col("ng"), depth, width, 2, 100)
        .select(col("ng"))
      val advanced = Stats.cmsMerge(state, Stats.cmsCells(occN, col("ng"), depth, width))
      val cands = prevHit.unionByName(occN.select(col("ng")).distinct()).distinct()
      val thresh = occB.unionByName(occN).agg(count(lit(1)).as("tot"))
        .select(expr("(tot * 2) DIV 100").as("min_est"))
      Stats.cmsEstimate(advanced, cands, depth, width)
        .crossJoin(broadcast(thresh))
        .filter(col("est") >= col("min_est"))
        .select(col("ng"), col("est"))
        .orderBy(col("ng"))
    },
    Some(s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |occ0 AS (SELECT doc_id, unnest(w) AS t FROM words),
            |occ AS (SELECT doc_id, ${polySql("t", Dedup.PolyB1, Dedup.PolyP1)} AS ng FROM occ0),
            |occb AS (SELECT ng FROM occ WHERE doc_id % 2 = 0),
            |occn AS (SELECT ng FROM occ WHERE doc_id % 2 = 1),
            |seeds AS (SELECT unnest(generate_series(0, 3)) AS s),
            |sb AS (SELECT s, (ng * (2*s+1) + (s*7919+1)) % ${Dedup.PolyP1} % 256 AS bucket,
            |    CAST(COUNT(*) AS BIGINT) AS cell
            |  FROM occb CROSS JOIN seeds GROUP BY 1, 2),
            |sn AS (SELECT s, (ng * (2*s+1) + (s*7919+1)) % ${Dedup.PolyP1} % 256 AS bucket,
            |    CAST(COUNT(*) AS BIGINT) AS cell
            |  FROM occn CROSS JOIN seeds GROUP BY 1, 2),
            |sm AS (SELECT s, bucket, CAST(SUM(cell) AS BIGINT) AS cell
            |  FROM (SELECT * FROM sb UNION ALL SELECT * FROM sn) GROUP BY 1, 2),
            |thb AS (SELECT CAST(COUNT(*) AS BIGINT) * 2 // 100 AS min_est FROM occb),
            |keysb AS (SELECT DISTINCT ng FROM occb),
            |estb AS (SELECT ng, MIN(cell) AS est
            |  FROM (SELECT ng, s, (ng * (2*s+1) + (s*7919+1)) % ${Dedup.PolyP1} % 256 AS bucket
            |        FROM keysb CROSS JOIN seeds) k
            |  JOIN sb USING (s, bucket) GROUP BY ng),
            |hitb AS (SELECT ng FROM estb CROSS JOIN thb WHERE est >= min_est),
            |cand AS (SELECT ng FROM hitb UNION SELECT DISTINCT ng FROM occn),
            |este AS (SELECT ng, CAST(MIN(cell) AS BIGINT) AS est
            |  FROM (SELECT ng, s, (ng * (2*s+1) + (s*7919+1)) % ${Dedup.PolyP1} % 256 AS bucket
            |        FROM cand CROSS JOIN seeds) k
            |  JOIN sm USING (s, bucket) GROUP BY ng),
            |tha AS (SELECT CAST((SELECT COUNT(*) FROM occb) + (SELECT COUNT(*) FROM occn) AS BIGINT)
            |    * 2 // 100 AS min_est)
            |SELECT e.ng, e.est FROM este e CROSS JOIN tha WHERE e.est >= tha.min_est
            |ORDER BY e.ng""".stripMargin))

  // q123_stratified_alloc — exact-budget stratified sample
  // (TA.stratifiedAlloc): exactly 500 docs total, allocated across
  // sources by largest-remainder proportionality (each stratum gets
  // the floor or ceiling of its exact share; seats sum to the budget
  // exactly), selected per stratum by the q121 KMV-threshold rule on
  // a 53-bit rank hash — deterministic and order-free, so the oracle
  // replays the allocation arithmetic AND the selection verbatim.

  private[queries] val stratAlloc = Q(
    "q123_stratified_alloc",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      def ph(b: Int, p: Long) =
        Dedup.polyHash(d, concat(col("doc_id").cast("string"), lit("/sa")), b, p)
      val w = pmod(ph(Dedup.PolyB1, Dedup.PolyP1) * lit(Dedup.PolyP2) +
        ph(Dedup.PolyB2, Dedup.PolyP2), lit(1L << 53))
      TA.stratifiedAlloc(d, col("doc_id"), col("source"), w, 500)
        .select(col("id").as("doc_id"), col("stratum").as("source"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH d AS (SELECT source AS stratum, doc_id,
            |    (${polySql("(CAST(doc_id AS VARCHAR) || '/sa')", Dedup.PolyB1, Dedup.PolyP1)} * ${Dedup.PolyP2}
            |     + ${polySql("(CAST(doc_id AS VARCHAR) || '/sa')", Dedup.PolyB2, Dedup.PolyP2)}) % ${1L << 53} AS w
            |  FROM documents),
            |c AS (SELECT stratum, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1),
            |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
            |a0 AS (SELECT stratum, c, (CAST(500 AS BIGINT) * c) // n.n AS fl,
            |    (CAST(500 AS BIGINT) * c) % n.n AS rem FROM c CROSS JOIN n),
            |sp AS (SELECT CAST(SUM(fl) AS BIGINT) AS sfl FROM a0),
            |a AS (SELECT stratum, c, fl, rem,
            |    row_number() OVER (ORDER BY rem DESC, stratum ASC) AS rk FROM a0),
            |alloc AS (SELECT stratum,
            |    LEAST(c, fl + CASE WHEN rk <= 500 - sp.sfl THEN 1 ELSE 0 END) AS nh
            |  FROM a CROSS JOIN sp),
            |r AS (SELECT stratum, w,
            |    row_number() OVER (PARTITION BY stratum ORDER BY w) AS rn FROM d),
            |t AS (SELECT r.stratum, r.w AS tw FROM r JOIN alloc USING (stratum)
            |  WHERE alloc.nh >= 1 AND r.rn = alloc.nh)
            |SELECT d.doc_id, d.stratum AS source FROM d JOIN t USING (stratum)
            |WHERE d.w <= t.tw ORDER BY d.doc_id""".stripMargin))

  // q124_kmv_intersect — sketch set-INTERSECTION estimate: for every
  // event-type pair, |A∩B| distinct users from the per-type KMV
  // sketches alone (k smallest member hashes). Union sketch = k
  // smallest of the two member lists (k-smallest-of-union-of-
  // k-smallest ≡ k-smallest-overall, the q115 mergeability fact);
  // est_union from its k-th member; overlap_k = union-sketch members
  // present in BOTH sketches; est_intersect = overlap_k · est_union
  // DIV |union sketch| (the standard KMV Jaccard-scaled estimate —
  // integer-exact, so the oracle replays it verbatim). Exact
  // intersections ride alongside as the audit (the q114 pattern).
  // Scale shape: one bounded sketch exchange (TopKAgg ≤ k per type
  // per mapper) + one bounded per-user type-set exchange for the
  // audit; the pair table is |types|² rows of arrays — scan-local
  // higher-order functions, no corpus self-join anywhere.

  private[queries] val kmvIntersect = Q(
    "q124_kmv_intersect",
    (s, dir) => {
      val k = 128
      val e = Tables.events(s, dir)
      val h = Dedup.polyHash(e, concat(col("user_id").cast("string"), lit("/kmv")),
        Dedup.PolyB1, Dedup.PolyP1)
      val dh = e.select(col("event_type"), h.as("h")).distinct()
      val sk = dh.groupBy(col("event_type"))
        .agg(graft.functions.TopKAgg.topk(k)((-col("h")).cast("double"), col("h")).as("tk"))
        .select(col("event_type"), expr("transform(tk, p -> p._2)").as("m"))
      val exact = dh.groupBy(col("h"))
        .agg(sort_array(collect_set(col("event_type"))).as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(explode(expr(
          """flatten(transform(ts, (a, i) -> transform(slice(ts, i + 2, size(ts) - i - 1),
            |  b -> named_struct('ta', a, 'tb', b))))""".stripMargin)).as("p"))
        .groupBy(col("p.ta").as("type_a"), col("p.tb").as("type_b"))
        .agg(count(lit(1)).as("n_exact"))
      val pairs = sk.as("a").join(sk.as("b"), col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          col("a.m").as("ma"), col("b.m").as("mb"))
      pairs
        .withColumn("u", expr(s"slice(array_sort(array_distinct(concat(ma, mb))), 1, $k)"))
        .withColumn("nu", size(col("u")).cast("long"))
        .withColumn("overlap_k", size(expr(
          "filter(u, x -> array_contains(ma, x) AND array_contains(mb, x))")).cast("long"))
        .withColumn("est_union", when(col("nu") < k, col("nu"))
          .otherwise(expr(s"CAST(${k - 1} AS BIGINT) * ${Dedup.PolyP1}L div element_at(u, $k)")))
        .withColumn("est_intersect", expr("overlap_k * est_union DIV nu"))
        .join(exact, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"), col("overlap_k"), col("est_union"),
          col("est_intersect"), coalesce(col("n_exact"), lit(0L)).as("n_exact"))
        .orderBy(col("type_a"), col("type_b"))
    },
    Some(s"""WITH dh AS (SELECT DISTINCT event_type,
            |    ${polySql("(CAST(user_id AS VARCHAR) || '/kmv')", Dedup.PolyB1, Dedup.PolyP1)} AS h
            |  FROM events),
            |r AS (SELECT event_type, h,
            |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM dh),
            |skm AS (SELECT event_type, h FROM r WHERE rn <= 128),
            |ty AS (SELECT DISTINCT event_type FROM dh),
            |pr AS (SELECT a.event_type AS ta, b.event_type AS tb
            |  FROM ty a JOIN ty b ON a.event_type < b.event_type),
            |um AS (SELECT DISTINCT pr.ta, pr.tb, s.h
            |  FROM pr JOIN skm s ON s.event_type IN (pr.ta, pr.tb)),
            |umr AS (SELECT ta, tb, h,
            |    row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn FROM um),
            |u AS (SELECT ta, tb, h, rn FROM umr WHERE rn <= 128),
            |nu AS (SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS nu,
            |    MAX(CASE WHEN rn = 128 THEN h END) AS kth FROM u GROUP BY 1, 2),
            |x AS (SELECT u.ta, u.tb, CAST(COUNT(*) AS BIGINT) AS x FROM u
            |  JOIN skm sa ON sa.event_type = u.ta AND sa.h = u.h
            |  JOIN skm sb ON sb.event_type = u.tb AND sb.h = u.h GROUP BY 1, 2),
            |ex AS (SELECT a.event_type AS ta, b.event_type AS tb,
            |    CAST(COUNT(*) AS BIGINT) AS n_exact
            |  FROM dh a JOIN dh b ON a.h = b.h AND a.event_type < b.event_type
            |  GROUP BY 1, 2),
            |est AS (SELECT n.ta, n.tb, COALESCE(x.x, 0) AS overlap_k,
            |    CASE WHEN n.nu < 128 THEN n.nu
            |         ELSE CAST(127 AS BIGINT) * ${Dedup.PolyP1} // n.kth END AS est_union,
            |    n.nu
            |  FROM nu n LEFT JOIN x ON n.ta = x.ta AND n.tb = x.tb)
            |SELECT e.ta AS type_a, e.tb AS type_b, e.overlap_k, e.est_union,
            |  e.overlap_k * e.est_union // e.nu AS est_intersect,
            |  COALESCE(ex.n_exact, 0) AS n_exact
            |FROM est e LEFT JOIN ex ON e.ta = ex.ta AND e.tb = ex.tb
            |ORDER BY type_a, type_b""".stripMargin))

  // q126_hll_sliding — SLIDING-window distinct via HLL pane-merge:
  // the classic panes optimization made exact-by-mergeability. Every
  // row is register-folded ONCE into its 1-hour pane; each 3-hour
  // sliding window (step 1 h) is then assembled by max-merging its 3
  // panes' register tables (Stats.hllMerge — exact by max
  // associativity, the q120 contract), so overlapping windows never
  // rescan rows: corpus cost is one bounded register exchange
  // (≤ 64 rows per (type, pane) per mapper) + pane-table-sized merge
  // work, instead of the 3× row duplication a naive sliding
  // window() pays before its aggregate. Estimates are identical to
  // folding each window directly (mergeability), which is what the
  // oracle replays.

  private[queries] val hllSliding = Q(
    "q126_hll_sliding",
    (s, dir) => {
      val e = Tables.events(s, dir)
      def ph(b: Int, p: Long) =
        Dedup.polyHash(e, concat(col("user_id").cast("string"), lit("/hll")), b, p)
      val wide = ph(Dedup.PolyB1, Dedup.PolyP1) * lit(Dedup.PolyP2) +
        ph(Dedup.PolyB2, Dedup.PolyP2)
      val base = e.select(col("event_type"),
        expr("(ts_ns div 1000000000) div 3600 * 3600").as("pane_s"), wide.as("wh"))
      val panes = Stats.hllRegisters(base, Seq(col("event_type"), col("pane_s")), col("wh"))
      val exploded = panes.select(col("event_type"),
        explode(array(col("pane_s"), col("pane_s") - 3600, col("pane_s") - 7200)).as("w_start"),
        col("idx"), col("reg"))
      Stats.hllEstimate(
          Stats.hllMerge(exploded, Seq(col("event_type"), col("w_start"))),
          Seq(col("event_type"), col("w_start")))
        .select(col("event_type"), col("w_start"), col("est").as("est_distinct"))
        .orderBy(col("event_type"), col("w_start"))
    },
    Some(s"""WITH wh AS (SELECT event_type,
            |    (epoch_ns(ts) // 1000000000) // 3600 * 3600 AS pane_s,
            |    (${polySql("(CAST(user_id AS VARCHAR) || '/hll')", Dedup.PolyB1, Dedup.PolyP1)} * ${Dedup.PolyP2}
            |     + ${polySql("(CAST(user_id AS VARCHAR) || '/hll')", Dedup.PolyB2, Dedup.PolyP2)}) AS wh
            |  FROM events),
            |rr AS (SELECT event_type, pane_s, wh % 64 AS idx,
            |    (wh // 64) % 4294967296 AS r FROM wh),
            |reg AS (SELECT event_type, pane_s, idx,
            |    MAX(CASE WHEN r = 0 THEN 33 ELSE 33 - length(bin(r)) END) AS reg
            |  FROM rr GROUP BY 1, 2, 3),
            |win AS (SELECT event_type, pane_s - g.i * 3600 AS w_start, idx,
            |    MAX(reg) AS reg
            |  FROM reg CROSS JOIN generate_series(0, 2) g(i) GROUP BY 1, 2, 3),
            |agg AS (SELECT event_type, w_start,
            |    CAST(SUM(CAST(1 AS BIGINT) << (33 - reg)) AS BIGINT)
            |      + (64 - COUNT(*)) * ${1L << (Stats.HllW + 1)} AS s,
            |    64 - COUNT(*) AS v
            |  FROM win GROUP BY 1, 2)
            |SELECT event_type, w_start, CAST(CASE
            |    WHEN v > 0 AND ${Stats.HllRawNum} // (${Stats.HllAlphaDen} * s) <= 160
            |      THEN (${Stats.hllLcSql})[v]
            |    ELSE ${Stats.HllRawNum} // (${Stats.HllAlphaDen} * s) END AS BIGINT) AS est_distinct
            |FROM agg ORDER BY event_type, w_start""".stripMargin))
}
