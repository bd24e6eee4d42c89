package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding merge training over a document corpus — the
  * "train a tokenizer" job of a large-scale training-data pipeline
  * (complements q49's frequency vocab and q69's vocab encoding; the
  * reference's query surface stops at exact-token stats, e.g. the
  * station-token splits in crates/oracle/src/file_access.rs:112-140,
  * so this extends the §2C family per the training-pipeline brief).
  *
  * Scale shape — the classic TWO-PHASE trainer every production BPE
  * implementation uses: ONE corpus-scale groupBy builds the distinct
  * word-frequency table (the only pass that touches the corpus —
  * that's what makes BPE feasible at 100 TB), then the merge rounds
  * run over that vocab-sized table IN MEMORY on a single partition
  * (`mapPartitions` kernel). The vocab is orders of magnitude
  * smaller than the corpus (100 TB of text ⇒ ~10⁷-10⁸ distinct
  * words ⇒ single-digit GB of (word, freq, syms) state — fits one
  * executor comfortably), and classic BPE's per-round global argmax
  * is inherently sequential, so paying one shuffle + one in-memory
  * loop beats paying ~6 vocab-sized shuffles and 2 eager checkpoints
  * PER ROUND (the previous formulation's fixed cost; kept below as
  * [[trainDistributed]], and [[train]] probes the vocab's estimated
  * heap footprint and cuts over to it AUTOMATICALLY when the vocab
  * would exceed a single executor). Encoding a corpus with the result stays fully
  * distributed: a hash join of the trained word→syms table back to
  * the documents (PipelineCatalog q108/q111).
  *
  * Merge application is GREEDY leftmost-first non-overlapping, the
  * textbook BPE apply rule: overlapping candidates only occur in
  * same-symbol runs (a=b), where greedy keeps the 1st, 3rd, … of
  * each maximal run. Tie-break for the per-round winning pair:
  * (weighted count DESC, left ASC, right ASC) in UTF-8 BYTE order —
  * the binary string order both Spark (UTF8String) and DuckDB (BLOB
  * collation) use, so the DuckDB oracle replays the training
  * bit-for-bit. A round with no remaining pair ends training early,
  * returning the merges learned so far (never an annihilated state).
  */
object Bpe {

  /** Per-round state: (w, freq, syms array<string>). Round 0 splits
    * each distinct word into single codepoints (substring is
    * codepoint-indexed in both Spark and DuckDB).
    */
  private def initialState(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, " ")).as("w"))
      .filter(char_length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", expr("transform(sequence(1, char_length(w)), i -> substring(w, i, 1))"))

  /** UTF-8 byte-order comparison — Spark's UTF8String and DuckDB's
    * binary string collation both compare UTF-8 bytes (= code-point
    * order), which differs from Java String.compareTo (UTF-16 code
    * units) for astral-plane characters. The kernel must match the
    * engines, not the JVM.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def applyGreedy(s: Array[String], a: String, b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** In-memory greedy BPE over the vocab-sized word table. Emits a
    * tagged union: kind 0 = final word state rows, kind 1 = merge
    * rows — one kernel run produces both outputs of [[train]].
    */
  private def trainKernel(it: Iterator[(String, Long)], nMerges: Int)
      : Iterator[(Int, String, Long, Seq[String], Int, String, String, Long)] = {
    val words = it.toArray
    val syms: Array[Array[String]] = words.map { case (w, _) =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    }
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= nMerges && !dry) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < words.length) {
        val f = words(i)._2; val s = syms(i)
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) dry = true // no pair left anywhere — stop, keep merges so far
      else {
        var best: (String, String) = null
        var bestN = Long.MinValue
        counts.foreach { case (k, n) =>
          if (best == null || n > bestN ||
              (n == bestN && (utf8Lt(k._1, best._1) ||
                (k._1 == best._1 && utf8Lt(k._2, best._2))))) {
            best = k; bestN = n
          }
        }
        merges += ((r, best._1, best._2, bestN))
        i = 0
        while (i < words.length) {
          syms(i) = applyGreedy(syms(i), best._1, best._2)
          i += 1
        }
        r += 1
      }
    }
    words.iterator.zip(syms.iterator).map { case ((w, f), s) =>
      (0, w, f, s.toSeq, 0, "", "", 0L)
    } ++ merges.iterator.map { case (rk, a, b, n) =>
      (1, "", 0L, Seq.empty[String], rk, a, b, n)
    }
  }

  /** Learn `nMerges` BPE merges; returns (rank, lhs, rhs, pair_n),
    * rank 1 = first (most frequent) merge. Fewer than `nMerges` rows
    * come back iff the vocabulary runs out of pairs first.
    */
  def trainMerges(df: DataFrame, text: Column, nMerges: Int): DataFrame =
    train(df, text, nMerges)._2

  /** Full training result: (finalWordState, merges). finalWordState
    * is (w, freq, syms) with all merges applied — i.e. the corpus
    * vocabulary ENCODED by the learned tokenizer; encoding a corpus
    * is then a hash join of this table back to the documents
    * (see PipelineCatalog q108_bpe_encode). One corpus-scale shuffle
    * (the word count), one single-partition kernel job, one tiny
    * eager checkpoint — constant job count regardless of nMerges.
    */
  def train(df: DataFrame, text: Column, nMerges: Int,
      maxKernelVocabBytes: Long = 4L << 30): (DataFrame, DataFrame) = {
    require(nMerges >= 1 && nMerges <= 64, "nMerges must be in [1, 64]")
    val spark = df.sparkSession
    import spark.implicits._
    // SIZE PROBE before funneling the vocab into one task's heap: the
    // kernel materializes ~per-codepoint String arrays for every
    // distinct word (~100 B/char + ~200 B/word of JVM overhead,
    // conservative), so a 10⁸-word vocab can exceed one executor.
    // One vocab-scale agg over the persisted word count decides the
    // path; above the cutover the same corpus pass feeds
    // [[trainDistributed]]'s per-round loop instead. The probe reuses
    // the persisted initial state — the corpus-scale groupBy still
    // runs exactly once on either path.
    val init = initialState(df, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probe = init.agg(count(lit(1)).as("nw"),
        coalesce(sum(char_length(col("w"))), lit(0L)).as("nc")).head()
      val estBytes = probe.getLong(1) * 100L + probe.getLong(0) * 200L
      if (estBytes > maxKernelVocabBytes) {
        trainDistributedFrom(init, nMerges)
      } else {
        val out = init
          .select(col("w"), col("freq"))
          .as[(String, Long)]
          .repartition(1)
          .mapPartitions(it => trainKernel(it, nMerges))
          .toDF("kind", "w", "freq", "syms", "rank", "lhs", "rhs", "pair_n")
          .localCheckpoint(true) // vocab-sized; one action feeds both outputs
        val state = out.filter(col("kind") === 0).select(col("w"), col("freq"), col("syms"))
        val merges = out.filter(col("kind") === 1)
          .select(col("rank"), col("lhs"), col("rhs"), col("pair_n"))
        (state, merges)
      }
    } finally init.unpersist()
  }

  /** One greedy merge round of the all-DataFrame formulation: returns
    * (newState, winningPair) where winningPair is a 0/1-row DF
    * (a, b, n). The state never leaves the executors — the winner is
    * applied via a broadcast cross join, not a driver collect.
    */
  private def mergeRound(state: DataFrame): (DataFrame, DataFrame) = {
    val byWord = Window.partitionBy(col("w")).orderBy(col("pos"))
    val ex = state.select(col("w"), col("freq"), posexplode(col("syms")).as(Seq("pos", "sym")))
      .withColumn("nxt", lead(col("sym"), 1).over(byWord))

    val top1 = ex.filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("a"), col("nxt").as("b"))
      .agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(1)
      .localCheckpoint(true)

    val cand = ex.crossJoin(broadcast(top1))
      .withColumn("cand", col("sym") === col("a") && col("nxt") === col("b"))

    // greedy keepers: odd ranks within each maximal candidate run
    val candRows = cand.filter(col("cand"))
      .withColumn("rn", row_number().over(byWord))
      .withColumn("island", col("pos") - col("rn"))
    val keep = candRows
      .withColumn("ri", row_number().over(Window.partitionBy(col("w"), col("island")).orderBy(col("pos"))))
      .filter(col("ri") % 2 === 1)
      .select(col("w").as("kw"), col("pos").as("kpos"))

    val merged = cand
      .join(keep, col("w") === col("kw") && col("pos") === col("kpos"), "left")
      .withColumn("keepHere", col("kpos").isNotNull)
      .drop("kw", "kpos")
      .join(keep, col("w") === col("kw") && col("pos") === col("kpos") + 1, "left")
      .withColumn("dropHere", col("kpos").isNotNull)
      .filter(!col("dropHere"))
      .withColumn("sym2", when(col("keepHere"), concat(col("a"), col("b"))).otherwise(col("sym")))

    val next = merged.groupBy(col("w"), col("freq"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, sym2))), x -> x.sym2)").as("syms"))

    (next, top1)
  }

  /** The all-DataFrame training loop — the fallback for a vocabulary
    * that exceeds single-executor memory (every round is ~3
    * vocab-sized shuffles + an eager checkpoint, so [[train]] is the
    * default). Semantics are identical to [[train]], including the
    * dry-vocab early stop: an empty winner would otherwise
    * annihilate the state through the crossJoin (empty × anything =
    * empty), so the loop breaks as soon as a round finds no pair and
    * returns the merges learned so far with the state intact.
    */
  def trainDistributed(df: DataFrame, text: Column, nMerges: Int): (DataFrame, DataFrame) = {
    require(nMerges >= 1 && nMerges <= 64, "nMerges must be in [1, 64]")
    trainDistributedFrom(initialState(df, text), nMerges)
  }

  /** [[trainDistributed]] from a pre-built initial state — the
    * automatic cutover target of [[train]]'s size probe (the probe
    * already paid the corpus pass; don't pay it again).
    */
  private def trainDistributedFrom(init: DataFrame, nMerges: Int): (DataFrame, DataFrame) = {
    var state = init.localCheckpoint(true)
    var merges: Seq[DataFrame] = Nil
    val empty = state.sparkSession.emptyDataFrame
      .select(lit(0).as("rank"), lit("").as("lhs"), lit("").as("rhs"), lit(0L).as("pair_n"))
      .limit(0)
    var r = 1
    var dry = false
    while (r <= nMerges && !dry) {
      val (next, top1) = mergeRound(state)
      if (top1.isEmpty) dry = true // checkpointed 0/1-row probe — cheap
      else {
        state = next.localCheckpoint(true)
        merges = merges :+ top1.select(lit(r).as("rank"), col("a").as("lhs"), col("b").as("rhs"), col("n").as("pair_n"))
        r += 1
      }
    }
    (state, if (merges.isEmpty) empty else merges.reduce(_ union _))
  }
}
