package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §2C).
  * All pure column expressions (codegen-friendly, no UDFs) so they run
  * inside whole-stage codegen at 100 TB scan scale.
  */
object TextAnalysis {

  /** One-pass native text statistics [n_chars, n_words, n_punct,
    * n_stop] when the TextStats kernel is registered (GraftExtensions
    * sessions); None on a vanilla session — callers fall back to the
    * composed regex/split forms, which the kernel replicates
    * bit-for-bit (parity-spec'd). Duplicate per-feature kernel calls
    * in one projection are deterministic same-arg expressions, so
    * whole-stage codegen's subexpression elimination collapses them;
    * even uncollapsed, a ~1 µs byte walk beats the ~30 µs regex stack
    * it replaces.
    */
  private def statsCol(text: Column): Option[Column] =
    org.apache.spark.sql.SparkSession.getActiveSession
      .filter(_.sessionState.functionRegistry.functionExists(graft.functions.TextStats.identifier))
      .map(_ => call_function("graft_text_stats", text))

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    statsCol(text).map(element_at(_, 2).cast("int"))
      .getOrElse(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: alpha runs, single digits, single punctuation.
    * Same RE2/Java-compatible pattern used by the oracle SQL.
    */
  val bpePattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    // Spark SQL string literals process backslash escapes (DuckDB does
    // not), so the pattern's backslashes are doubled here only.
    size(expr(s"regexp_extract_all(text, '${bpePattern.replace("\\", "\\\\")}', 0)"))

  /** Quality-scoring feature set: returns struct of
    * (n_chars, n_words, punct_ratio, stop_ratio, mean_word_len).
    * Ratios are double divisions of exact integers → deterministic.
    */
  val stopwords: Seq[String] = graft.functions.TextStats.Stopwords
  def stopHits(text: Column): Column =
    statsCol(text).map(element_at(_, 4).cast("int"))
      .getOrElse(size(expr(s"regexp_extract_all(text, '\\\\b(${stopwords.mkString("|")})\\\\b', 0)")))

  def punctCount(text: Column): Column =
    statsCol(text).map(element_at(_, 3).cast("int"))
      .getOrElse(length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))

  /** Composite quality score in [0,1]: length-normalized, penalizes
    * punctuation-heavy and stopword-free (unnatural) text. Weights are
    * arbitrary but fixed; formula shape mirrored in oracle SQL.
    */
  def qualityScore(nChars: Column, nWords: Column, punct: Column, stops: Column): Column = {
    val lenScore = least(nChars.cast("double") / 500.0, lit(1.0))
    val punctPenalty = least(punct.cast("double") * 5.0 / greatest(nChars, lit(1)), lit(1.0))
    val stopScore = least(stops.cast("double") * 4.0 / greatest(nWords, lit(1)), lit(1.0))
    // raw double: all inputs are exact ints, so the expression is
    // bit-deterministic; round() would NOT be (see Exact.davg note)
    lenScore * 0.4 + stopScore * 0.4 + (lit(1.0) - punctPenalty) * 0.2
  }

  /** Stopword-profile language ID. Counts hits of per-language stopword
    * regexes; argmax with fixed priority order (en,de,fr,es,zh).
    */
  val langProfiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|to|and|in|is)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht)\\b",
    "fr" -> "\\b(le|la|et|les|des|est)\\b",
    "es" -> "\\b(el|la|de|que|y|los)\\b",
    "zh" -> "[\\u4e00-\\u9fff]")

  def langHits(text: Column, pattern: String): Column =
    size(expr(s"regexp_extract_all(text, '${pattern.replace("\\", "\\\\")}', 0)"))

  /** Deterministic positional fingerprint: sum(i * codepoint(c_i)) mod
    * 1e9+7 over 1-based character positions. Order-sensitive, exactly
    * expressible in both Spark and DuckDB.
    */
  def fingerprint(text: Column): Column =
    expr("""aggregate(
      zip_with(sequence(1, length(text)), split(text, ''), (i, c) -> CAST(i AS BIGINT) * ascii(c)),
      CAST(0 AS BIGINT), (acc, x) -> (acc + x) % 1000000007)""")

  /** Repetition features (Gopher/FineWeb-style quality gate): total vs
    * distinct word-n-gram counts per document. A high duplicated-ngram
    * fraction (1 - distinct/total) marks boilerplate/looping text.
    * Scan-local, no shuffle: the total is arithmetic on the word count
    * and the distinct count is the LENGTH of the native one-pass
    * ngram-hash kernel's output — NgramHashes dedups ngram STRINGS
    * before hashing, so its size is the exact distinct-string count
    * (hash collisions cannot change it). The composed
    * transform/array_distinct form pays interpreted lambda dispatch
    * per ngram and was the slowest scan in the catalog (5.3 s sf0.1).
    */
  def ngramRepetition(df: org.apache.spark.sql.DataFrame, text: Column, n: Int): (Column, Column) = {
    val total = greatest(size(split(text, " ")) - (n - 1), lit(0))
    (total, size(Dedup.hashedNgrams(df, text, n)))
  }

  /** Deterministic per-stratum sampling bucket in [0, 100): the
    * portable poly-hash of the row id string — NOT rand(), which is
    * neither reproducible across retried tasks nor replayable by the
    * oracle. A row is kept when its bucket < the stratum's percentage
    * quota, which is how a training-data mixing step downsamples
    * over-represented sources/languages with an exactly re-runnable
    * (and resumable) decision per document. Scan-local — no shuffle,
    * no sampleBy() RNG.
    */
  def sampleBucket(df: org.apache.spark.sql.DataFrame, id: Column): Column =
    pmod(graft.operators.Dedup.polyHash(df, id.cast("string"), Dedup.PolyB1, Dedup.PolyP1), lit(100))

  /** Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1 —
    * public): hard boolean rules over scan-local word statistics, the
    * rule-set companion to the soft `qualityScore`. All pure column
    * expressions (array HOFs + regex) — one pass inside whole-stage
    * codegen, no shuffle at any scale. Flags are 0/1 ints (identical
    * physical value in Spark parquet and DuckDB).
    *
    * Rules (bounds scaled to the synthetic corpus' short docs):
    *  - word count within [minWords, maxWords]
    *  - mean word length within [2, 12] (sum of word lengths / words —
    *    double division of exact ints, deterministic)
    *  - ≥ 80% of words contain an alphabetic character
    *  - ≥ 2 stopword hits
    */
  def gopherFlags(df: org.apache.spark.sql.DataFrame, text: Column,
      minWords: Int, maxWords: Int): Seq[Column] = {
    val w = split(trim(text), "\\s+")
    val nWords = size(w)
    val sumWlen = aggregate(transform(w, x => length(x)), lit(0L), (acc, x) => acc + x)
    val meanWlen = sumWlen.cast("double") / greatest(nWords, lit(1))
    val alphaFrac = size(filter(w, x => x.rlike("[a-zA-Z]"))).cast("double") /
      greatest(nWords, lit(1))
    val nStop = stopHits(text)
    val passWc = (nWords >= minWords && nWords <= maxWords).cast("int")
    val passWlen = (meanWlen >= 2.0 && meanWlen <= 12.0).cast("int")
    val passAlpha = (alphaFrac >= 0.8).cast("int")
    val passStop = (nStop >= 2).cast("int")
    Seq(nWords.as("n_words"), meanWlen.as("mean_wlen"), alphaFrac.as("alpha_frac"),
      nStop.as("n_stop"), passWc.as("pass_wc"), passWlen.as("pass_wlen"),
      passAlpha.as("pass_alpha"), passStop.as("pass_stop"),
      (passWc * passWlen * passAlpha * passStop).as("pass"))
  }

  /** Per-domain quota cap — "no domain contributes more than k
    * documents, keep its best": per domain, the k highest-scored docs
    * (score desc, ties toward smaller id) via the bounded TopKAgg
    * aggregate. The anti-over-representation pass a crawl-derived
    * corpus runs before mixing (boilerplate farms and SEO mills are
    * exactly the domains that exceed any cap).
    *
    * Scale shape: NO window sort — the partial aggregation keeps ≤ k
    * (score, id) pairs per domain per mapper, so the exchange carries
    * |domains|·k·mappers rows instead of every document. Ordering is
    * identical to row_number() OVER (PARTITION BY domain ORDER BY
    * score DESC, id ASC). Output: (source, rank, doc_id, score).
    */
  def domainCap(df: org.apache.spark.sql.DataFrame, domain: Column, id: Column,
      score: Column, k: Int): org.apache.spark.sql.DataFrame =
    df.select(domain.as("source"), score.cast("double").as("s"), id.cast("long").as("i"))
      .groupBy(col("source"))
      .agg(graft.functions.TopKAgg.topk(k)(col("s"), col("i")).as("tk"))
      .select(col("source"), posexplode(col("tk")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("doc_id"), col("col._1").as("score"))

  /** Per-source boilerplate detection: documents of the same source
    * sharing an identical leading `prefixWords`-word prefix (62-bit
    * hash of the prefix string) in ≥ `minDocs` docs are boilerplate
    * carriers — the repeated header/banner a template stamps on every
    * page. Output: one row per affected doc (doc_id, source, n_docs
    * sharing the prefix, n_words, kept_words after the strip) — the
    * surgery table a cleaning job applies. Docs shorter than
    * prefixWords can't carry a full prefix and are excluded.
    *
    * Scale shape: the prefix hash is scan-local; ONE partial-agg
    * groupBy on (source, 8-byte hash); the boilerplate table joins
    * back unhinted (small by nature — repeated prefixes — but
    * unbounded, so no broadcast hint; AQE decides).
    */
  def boilerplateStrip(df: org.apache.spark.sql.DataFrame, id: Column, source: Column,
      text: Column, prefixWords: Int, minDocs: Long): org.apache.spark.sql.DataFrame = {
    val w = split(text, " ")
    val keyed0 = df.select(id.as("doc_id"), source.as("source"),
        size(w).cast("long").as("n_words"),
        concat_ws(" ", slice(w, lit(1), lit(prefixWords))).as("prefix"))
      .filter(col("n_words") >= prefixWords)
    val keyed = keyed0.withColumn("ph", graft.operators.Dedup.chunkKey62(keyed0, col("prefix")))
      .drop("prefix")
    val boiler = keyed.groupBy(col("source"), col("ph"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    keyed.join(boiler, Seq("source", "ph"))
      .select(col("doc_id"), col("source"), col("n_docs"), col("n_words"),
        (col("n_words") - prefixWords).as("kept_words"))
  }

  /** DSIR-style target-affinity scoring (ratio form, exact integers):
    * per document, Σ over its DISTINCT word hashes of the TARGET
    * document frequency vs the same sum under the RAW-corpus document
    * frequency, as ppm — documents whose vocabulary is dense in the
    * target distribution (benchmark-like, domain-like) score high,
    * generic documents score ~|target|/|corpus| ppm. The
    * importance-weighting step of data selection via hashed features,
    * with NO logs or doubles: both sums are exact BIGINTs, the ratio
    * is one integer division, and the oracle replays it bit-for-bit.
    *
    * num is pinned through DECIMAL(12,0) (the q77/q72 pattern: Spark
    * raises where DuckDB's cast overflows loudly — same bound, both
    * engines) so num·10^6 stays inside BIGINT. At 10^14-scale sums,
    * normalize the df tables to per-million rates first.
    *
    * Scale shape: target membership is a PREDICATE on the corpus
    * (the production tagging), so ONE vocabulary-sized agg computes
    * both df columns (count, count-if-target) and the staging table
    * pays ONE hash join — the two-frame formulation builds two vocab
    * tables and joins twice (measured 2× slower at sf1). One
    * partial-agg rollup per doc. Output: (doc_id, t_mass, r_mass,
    * affinity_ppm).
    */
  def targetAffinity(corpus: org.apache.spark.sql.DataFrame, isTarget: Column,
      id: Column, text: Column): org.apache.spark.sql.DataFrame = {
    import graft.operators.Dedup
    val ngr = corpus.select(id.as("doc_id"), isTarget.cast("boolean").as("is_t"),
      explode(Dedup.hashedNgrams(corpus, text, 1)).as("ng"))
    val dfs = ngr.groupBy(col("ng")).agg(count(lit(1)).as("df_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("df_t"))
    val pinnedNum = {
      val c = col("t_mass")
      when(c.cast("decimal(12,0)").isNull && c.isNotNull,
        raise_error(concat(lit("targetAffinity: t_mass exceeds pinned decimal(12,0): "),
          c.cast("string"))).cast("long"))
        .otherwise(c)
    }
    ngr
      .join(dfs, Seq("ng"))
      .groupBy(col("doc_id"))
      .agg(sum(col("df_t")).as("t_mass"), sum(col("df_r")).as("r_mass"))
      .withColumn("t_mass", pinnedNum)
      .withColumn("affinity_ppm", expr("t_mass * 1000000 DIV r_mass"))
  }

  /** Stratified corpus mix: keep rows whose sampleBucket falls under
    * the quota (percent) for their stratum value; `default` applies to
    * strata absent from `quotas`.
    */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, id: Column, stratum: Column,
      quotas: Map[String, Int], default: Int): org.apache.spark.sql.DataFrame = {
    val quota = quotas.foldLeft(lit(default)) { case (acc, (k, q)) =>
      when(stratum === k, lit(q)).otherwise(acc)
    }
    df.filter(sampleBucket(df, id) < quota)
  }

  /** EXACT-BUDGET stratified sample: draw exactly `budget` rows total,
    * allocated across strata PROPORTIONALLY by the largest-remainder
    * (Hamilton) method — every stratum gets floor(budget·c_h/N) rows
    * plus one of the leftover seats in remainder order, so each
    * allocation is the floor or ceiling of its exact share (the quota
    * property) and the total is exactly the budget. The complement of
    * [[stratifiedSample]]'s percentage quotas: eval-set construction,
    * distillation budgets, and per-source caps need a FIXED total, not
    * a rate.
    *
    * Selection within a stratum is the q121 KMV-threshold rule on the
    * caller's rank hash `w`: keep rows with w ≤ the stratum's n_h-th
    * smallest (boundary hash ties enlarge identically in both
    * engines — deterministic, order-free, no reservoir RNG).
    *
    * Scale shape: ONE bounded partial-agg exchange over the corpus
    * (per-stratum count + TopKAgg of ≤ `budget` hashes per group per
    * mapper); the allocation arithmetic (integer DIV/mod, remainder
    * ranking) runs on the STRATA-SIZED table (single-partition window
    * by construction — bounded by |strata|, not the data); membership
    * is a broadcast-joined map-side filter. No per-stratum sort of
    * the corpus anywhere. Returns (id, stratum) of the sampled rows.
    */
  def stratifiedAlloc(df: org.apache.spark.sql.DataFrame, id: Column, stratum: Column,
      w: Column, budget: Int): org.apache.spark.sql.DataFrame = {
    require(budget >= 1, "budget must be positive")
    val base = df.select(stratum.as("stratum"), id.as("id"), w.as("__w"))
    val counts = base.groupBy(col("stratum"))
      .agg(count(lit(1)).as("c"),
        graft.functions.TopKAgg.topk(budget)((-col("__w")).cast("double"), col("__w")).as("tk"))
    val tot = counts.agg(sum(col("c")).as("n"))
    val a0 = counts.crossJoin(broadcast(tot))
      .withColumn("fl", expr(s"(CAST($budget AS BIGINT) * c) DIV n"))
      .withColumn("rem", expr(s"(CAST($budget AS BIGINT) * c) % n"))
    val spent = a0.agg(sum(col("fl")).as("sfl"))
    val wRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("stratum").asc)
    val alloc = a0.crossJoin(broadcast(spent))
      .withColumn("rk", row_number().over(wRem))
      .withColumn("n_h", least(col("c"),
        col("fl") + when(col("rk") <= lit(budget.toLong) - col("sfl"), 1L).otherwise(0L)))
    val thr = alloc.select(col("stratum"),
      when(col("n_h") >= 1,
        element_at(col("tk"), col("n_h").cast("int")).getField("_2")).as("__t"))
    base.join(broadcast(thr), Seq("stratum"))
      .filter(col("__t").isNotNull && col("__w") <= col("__t"))
      .select(col("id"), col("stratum"))
  }

  /** Token-budget corpus selection — "keep the HIGHEST-QUALITY docs
    * until the token budget is spent" (the data-constrained-pretraining
    * selection step) WITHOUT a global sort. Scale shape:
    *  1. bucket quality into `buckets` fixed cells (floor(q·buckets) —
    *     IEEE-deterministic, identical in DuckDB);
    *  2. one partial-agg histogram exchange (≤ buckets+1 rows) and a
    *     driver-free window over it (constant-size, single partition BY
    *     CONSTRUCTION — bounded by the buckets knob, not the data)
    *     finds the threshold cell: every cell strictly better is kept
    *     WHOLE, cells strictly worse are dropped whole;
    *  3. only the ONE boundary cell — ~1/buckets of the corpus — pays
    *     a per-doc ordered cumsum (deterministic doc_id order), kept
    *     while the remaining budget lasts.
    * A full quality sort of 100 TB becomes a histogram pass plus a
    * sort of corpus/buckets; raise `buckets` until the boundary cell
    * fits a task's sort budget (two-level refinement is the same trick
    * applied again inside the boundary cell if ever needed).
    *
    * Budget is an exact integer fraction of the corpus token count
    * (budgetNum/budgetDen, integer DIV — the q77 arithmetic). All
    * comparisons are BIGINT; the only double is the quality score,
    * which both engines compute bit-identically from exact ints.
    *
    * Returns kept docs (doc_id, n_tokens, quality) — deterministic
    * across partitionings, retries, and engines.
    */
  def budgetSelect(df: org.apache.spark.sql.DataFrame, id: Column, tokens: Column,
      quality: Column, budgetNum: Int, budgetDen: Int,
      buckets: Int = 1000): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: FOUR consumers read this (budget agg, histogram, full
    // join, boundary join) and the upstream quality features are
    // regex-heavy scans — without it the corpus is re-scanned 4×
    // (measured at sf1: 22.4 s → 0.8 s). At 100 TB this is the staged
    // (id, tokens, quality) table a selection job materializes anyway;
    // MEMORY_AND_DISK spills rather than OOMs.
    val scored = df.select(id.as("doc_id"), tokens.as("n_tokens"), quality.as("quality"))
      .withColumn("b", floor(col("quality") * buckets).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val budget = scored.agg(sum(col("n_tokens")).as("tot"))
      .select(expr(s"(tot * $budgetNum) DIV $budgetDen").as("budget"))
    // histogram: ≤ buckets+1 rows — the window below is single-
    // partition over a CONSTANT-size table (knob-bounded, data-free)
    val hist = scored.groupBy(col("b")).agg(sum(col("n_tokens")).as("tok"))
    val wAbove = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cells = hist
      .withColumn("cum_above", coalesce(sum(col("tok")).over(wAbove), lit(0L)))
      .crossJoin(broadcast(budget))
      .withColumn("cell_keep",
        when(col("cum_above") + col("tok") <= col("budget"), lit("full"))
          .when(col("cum_above") <= col("budget"), lit("boundary"))
          .otherwise(lit("drop")))
    val full = scored.join(broadcast(cells.filter(col("cell_keep") === "full")
      .select(col("b"))), Seq("b"))
    // the boundary cell: per-doc deterministic cumsum, kept while the
    // remaining budget lasts — this sort touches ~corpus/buckets rows
    val wInCell = Window.partitionBy(col("b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val boundary = scored.join(broadcast(cells.filter(col("cell_keep") === "boundary")
        .select(col("b"), col("cum_above"), col("budget"))), Seq("b"))
      .withColumn("cum_in", sum(col("n_tokens")).over(wInCell))
      .filter(col("cum_above") + col("cum_in") <= col("budget"))
    full.select(col("doc_id"), col("n_tokens"), col("quality"))
      .unionByName(boundary.select(col("doc_id"), col("n_tokens"), col("quality")))
  }

  /** Temperature-scaled domain mixing (τ = 0.5): weight stratum s ∝
    * √count_s, so under-represented sources are UP-weighted relative to
    * proportional sampling. Per-stratum keep probability
    * p_s = B·w_s/c_s with w_s = √c_s/Σ√c_s and budget
    * B = count·budgetNum/budgetDen; a row is kept iff its portable-hash
    * bucket (poly-hash of the id, mod 10⁶) falls under p_s —
    * deterministic across retries and exactly replayable by an oracle.
    *
    * The keep decision is EXACT integer cross-multiplication in
    * pinned-width decimals: hm·Σ√·c_s < B·√c_s·10⁶ (widths 31 and 29
    * digits — no 38-precision overflow up to c_s ≤ 10¹⁰). The only
    * float is sqrt (IEEE correctly-rounded, identical in every engine),
    * snapped to an integer (×10⁶, round) before any further arithmetic,
    * and the Σ√ total is an INTEGER sum — no float accumulation order
    * anywhere. Scale shape: one partial-agg count per stratum, a
    * one-row total, two broadcast joins back into the scan — the corpus
    * never shuffles.
    *
    * Returns (stratum, n_docs, n_kept) per stratum.
    */
  def temperatureMix(df: org.apache.spark.sql.DataFrame, stratum: Column, id: Column,
      budgetNum: Int, budgetDen: Int): org.apache.spark.sql.DataFrame = {
    val counts = df.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("n_docs"))
      .select(col("stratum"), col("n_docs"),
        round(sqrt(col("n_docs").cast("double")) * 1e6).cast("long").as("sqrtm"))
    val totals = counts.agg(sum(col("n_docs")).as("n_total"), sum(col("sqrtm")).as("tot_sqrtm"))
    // b via INTEGER division, matching the oracle's `//`: the double
    // route (floor(x * num / den)) agrees only while n_total·num < 2^53
    // — an exabyte-scale corpus count would silently diverge
    val th = counts.crossJoin(broadcast(totals))
      .select(col("stratum"), col("n_docs"), col("sqrtm"), col("tot_sqrtm"),
        expr(s"(n_total * $budgetNum) DIV $budgetDen").as("b"))
    // the id string is SALTED before hashing: a 1–3 char id's poly-hash
    // never wraps the modulus, so its low decimal digits are not
    // uniform — the suffix guarantees ≥6 chars and full mixing
    val hm = df.select(stratum.as("stratum"),
      pmod(Dedup.polyHash(df, concat(id.cast("string"), lit("/tmix")),
        Dedup.PolyB1, Dedup.PolyP1), lit(1000000)).as("hm"))
    // pinned downcasts with a width-violation guard (the q72 pattern):
    // in non-ANSI Spark an overflowing decimal cast is silently NULL —
    // the keep condition would turn false and rows would silently drop
    // at a corpus size the small-SF gate can't see. Raise instead,
    // matching the DuckDB oracle's loud cast overflow at the SAME
    // bounds (n_docs < 1e7 per stratum, tot_sqrtm < 1e12).
    def pinned(c: Column, typ: String, name: String): Column =
      when(c.isNotNull && c.cast(typ).isNull,
        raise_error(concat(lit(s"temperatureMix: $name exceeds pinned $typ: "),
          c.cast("string"))).cast(typ))
        .otherwise(c.cast(typ))
    hm.join(broadcast(th), Seq("stratum"))
      .groupBy(col("stratum"))
      .agg(max(col("n_docs")).as("n_docs"),
        sum(when(
          col("hm").cast("decimal(7,0)") * pinned(col("tot_sqrtm"), "decimal(12,0)", "tot_sqrtm")
            * pinned(col("n_docs"), "decimal(7,0)", "n_docs")
            < pinned(col("b"), "decimal(19,0)", "b") * pinned(col("sqrtm"), "decimal(12,0)", "sqrtm")
            * lit(1000000).cast("decimal(7,0)"),
          1).otherwise(0)).as("n_kept"))
  }

  /** Unigram-LM surprisal scoring — the exact-integer form of
    * perplexity filtering (CCNet-style: cut the high-perplexity
    * gibberish tail and the low-perplexity boilerplate tail): per
    * document, the mean surprisal of its word OCCURRENCES under the
    * corpus unigram distribution, where a word with corpus count c out
    * of N total occurrences costs floor(log2(N div c)) bits — the
    * bit-length of the integer inverse probability, minus one. NO
    * floats and NO log(): bit-length is exact integer arithmetic in
    * both engines (Spark `length(bin(x))`, DuckDB
    * `length(format('{:b}', x))`), so the oracle replays the score
    * bit-for-bit where a float log2 would drift in the last ulp and
    * flip threshold comparisons.
    *
    * Scale shape: occurrences are scan-local positional hashes (8-byte
    * keys before any exchange); ONE vocabulary agg (partial-agg'd), a
    * one-row total broadcast, one ng-keyed join back (unhinted — AQE
    * broadcasts small vocabularies, shuffles real ones), one per-doc
    * partial-agg rollup. Same staging skeleton as [[targetAffinity]].
    * Returns (doc_id, n_tok, bits_sum, mean_bits_ppm).
    */
  def surprisalScore(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column): org.apache.spark.sql.DataFrame = {
    import graft.operators.Dedup
    val tok = df.select(id.as("doc_id"), explode(Dedup.hashedNgramSeq(df, text, 1)).as("ng"))
    val vocab = tok.groupBy(col("ng")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("n_total"))
    tok.join(vocab, Seq("ng")).crossJoin(broadcast(total))
      .withColumn("bits", (length(bin(expr("n_total DIV c"))) - 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tok"), sum(col("bits")).as("bits_sum"))
      .withColumn("mean_bits_ppm", expr("bits_sum * 1000000 DIV n_tok"))
  }

  /** Deterministic fractional-epoch upsampling — the mixing step that
    * REPEATS under-represented strata (epochs > 1, e.g. high-quality
    * or rare-language sources) instead of downsampling the rest: a doc
    * in a stratum with epoch ratio num/den is emitted (num div den)
    * times, plus one more iff its salted portable-hash bucket mod den
    * falls under (num mod den) — exactly num/den epochs in
    * expectation, deterministic per doc (reproducible across retries
    * and replayable by the oracle; `rand()` is neither). Emission is a
    * scan-local sequence explode — the corpus never shuffles.
    * Returns one row per emitted copy: (stratum, doc_id, copy).
    */
  def epochUpsample(df: org.apache.spark.sql.DataFrame, stratum: Column, id: Column,
      epochs: Map[String, (Int, Int)], defaultNum: Int,
      defaultDen: Int): org.apache.spark.sql.DataFrame = {
    // a zero denominator is knob misuse, but it would surface as a
    // mid-job ANSI divide error — reject it at the API instead
    require(defaultDen >= 1 && epochs.values.forall(_._2 >= 1),
      "epoch denominators must be >= 1")
    import graft.operators.Dedup
    val (numC, denC) = epochs.foldLeft((lit(defaultNum), lit(defaultDen))) {
      case ((na, da), (k, (n, d))) =>
        (when(stratum === k, lit(n)).otherwise(na), when(stratum === k, lit(d)).otherwise(da))
    }
    // the id is salted before hashing (the temperatureMix lesson:
    // short ids' poly-hash never wraps the modulus, so low digits are
    // not uniform) and the bucket is taken mod the stratum's OWN den
    val bucket = pmod(Dedup.polyHash(df,
      concat(id.cast("string"), lit("/upsm")), Dedup.PolyB1, Dedup.PolyP1), denC)
    // whole-epoch count via floor division — num/den are knob-sized
    // ints, far inside double exactness
    val base = df.select(stratum.as("stratum"), id.as("doc_id"),
      floor(numC.cast("double") / denC.cast("double")).cast("long").as("whole"),
      (bucket < pmod(numC, denC)).cast("long").as("extra"))
    // sequence(1, 0) would DESCEND in Spark — guard the zero-copy case
    base.withColumn("n_copies", col("whole") + col("extra"))
      .filter(col("n_copies") >= 1)
      .select(col("stratum"), col("doc_id"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  /** Bigram-coverage quality score — an exact-arithmetic LM-coverage
    * proxy: what fraction of a document's bigram OCCURRENCES appear at
    * least `minCount` times in the whole corpus? Low coverage flags
    * gibberish / boilerplate-mangled text the per-doc feature gates
    * (q51/q76) can't see, because the signal is the CORPUS
    * distribution, not the document alone. Score is integer
    * parts-per-million (covered·10⁶ div total) — no doubles, no logs,
    * replayable bit-exact by the oracle.
    *
    * Scale shape: positional bigram hashing is scan-local (native
    * kernel); the staged per-(doc, bigram) count table is a partial
    * agg whose shuffle rows are (id, 8-byte hash, count); the frequent
    * set (global count ≥ minCount) is vocabulary-sized and df-capped by
    * construction, joined WITHOUT a broadcast hint — AQE broadcasts it
    * at test SF, shuffles at real vocabulary scale; the final per-doc
    * rollup is a second partial agg. Documents with fewer than 2 words
    * have no bigrams and are absent — identical in the oracle.
    *
    * Returns (doc_id, total_bg, covered_bg, score_ppm).
    */
  def bigramCoverage(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      minCount: Long): org.apache.spark.sql.DataFrame = {
    val bg = df.select(id.as("doc_id"), explode(Dedup.hashedNgramSeq(df, text, 2)).as("ng"))
      .groupBy(col("doc_id"), col("ng")).agg(count(lit(1)).as("c"))
      // persisted: two consumers (global frequency table + the join
      // back) — the q82 lesson; at 100 TB this is the materialized
      // bigram index an ingest job writes once anyway
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = bg.groupBy(col("ng")).agg(sum(col("c")).as("tot"))
      .filter(col("tot") >= minCount).select(col("ng")).withColumn("f", lit(1))
    bg.join(freq, Seq("ng"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("total_bg"),
        sum(when(col("f") === 1, col("c")).otherwise(lit(0L))).as("covered_bg"))
      .withColumn("score_ppm", expr("covered_bg * 1000000 DIV total_bg"))
      .select(col("doc_id"), col("total_bg"), col("covered_bg"), col("score_ppm"))
  }

  /** Apply a span-surgery table ([[graft.operators.Dedup.selfRepSpans]]
    * / `contaminationSpans` output: 1-based inclusive token ranges) to
    * the documents it cuts: tokens inside any span are dropped, the
    * survivors re-joined with single spaces. Output one row per
    * document — (doc_id, n_tokens_raw, n_tokens_kept, text_clean),
    * `text_clean = ""` when every token is cut (a fully-duplicated doc
    * vanishes to an empty shell the length filter downstream drops).
    *
    * Scale shape: spans collapse to ONE array per doc (merged spans
    * are disjoint and few — repeats, not the corpus), join back
    * doc-keyed, and the cut itself is a scan-local `filter` lambda
    * over the token array (per-token cost O(spans/doc), spans ride the
    * row — no occurrence-sized explode, the document text crosses the
    * wire exactly once).
    */
  def scrubSpans(df: org.apache.spark.sql.DataFrame, spans: org.apache.spark.sql.DataFrame,
      id: Column, text: Column): org.apache.spark.sql.DataFrame = {
    val sp = spans.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("span_start").as("st"), col("span_end").as("en")))).as("sp"))
    df.select(id.as("doc_id"), split(text, " ").as("w"))
      .join(sp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("w"),
        coalesce(col("sp"), array().cast("array<struct<st:bigint,en:bigint>>")).as("sp"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens_raw"),
        filter(col("w"), (_, i) =>
          !exists(col("sp"), s => (i + 1) >= s("st") && (i + 1) <= s("en"))).as("kept"))
      .select(col("doc_id"), col("n_tokens_raw"),
        size(col("kept")).cast("long").as("n_tokens_kept"),
        concat_ws(" ", col("kept")).as("text_clean"))
  }
}
