package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a document corpus — the
  * "train a tokenizer" job of a large-scale training-data pipeline
  * (complements q49's frequency vocab and q69's vocab encoding; the
  * reference's query surface stops at exact-token stats, e.g. the
  * station-token splits in crates/oracle/src/file_access.rs:112-140,
  * so this extends the §2C family per the training-pipeline brief).
  *
  * Scale shape: ONE corpus-scale groupBy builds the distinct-word
  * frequency table; every training round after that runs over that
  * vocab-sized table only (classic BPE trains on word frequencies,
  * not the raw token stream — the same trick that makes it feasible
  * at 100 TB: the corpus is touched once, the loop state is bounded
  * by |vocab| × word length). Each round is ~3 vocab-sized shuffles
  * (pair count, keeper windows, array rebuild) and the per-round
  * state is localCheckpoint-ed so the plan stays constant across
  * rounds (the CC-loop lineage lesson, see Dedup.ccPropagate).
  *
  * Merge application is GREEDY leftmost-first non-overlapping, the
  * textbook BPE apply rule, expressed relationally so DuckDB replays
  * it bit-for-bit: candidate positions are pair sites (sym=a,
  * next=b); overlapping candidates only occur in same-symbol runs
  * (a=b), where greedy keeps the 1st, 3rd, … of each maximal run —
  * a gaps-and-islands computation (island = pos − row_number among
  * candidates; keep odd ranks within island).
  *
  * Tie-break for the per-round winning pair: (weighted count DESC,
  * left ASC, right ASC) — binary string order in both engines.
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

  /** One greedy merge round: returns (newState, winningPair) where
    * winningPair is a 1-row DF (a, b, n). The state never leaves the
    * executors — the winner is applied via a broadcast cross join,
    * not a driver collect.
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

  /** Learn `nMerges` BPE merges; returns (rank, lhs, rhs, pair_n),
    * rank 1 = first (most frequent) merge. Also see [[trainState]]
    * for the encoded word table the same loop produces.
    */
  def trainMerges(df: DataFrame, text: Column, nMerges: Int): DataFrame =
    train(df, text, nMerges)._2

  /** Full training result: (finalWordState, merges). finalWordState
    * is (w, freq, syms) with all merges applied — i.e. the corpus
    * vocabulary ENCODED by the learned tokenizer; encoding a corpus
    * is then a broadcast join of this table back to the documents
    * (see PipelineCatalog q108_bpe_encode).
    */
  def train(df: DataFrame, text: Column, nMerges: Int): (DataFrame, DataFrame) = {
    require(nMerges >= 1 && nMerges <= 64, "nMerges must be in [1, 64]")
    var state = initialState(df, text).localCheckpoint(true)
    var merges: Seq[DataFrame] = Nil
    var r = 1
    while (r <= nMerges) {
      val (next, top1) = mergeRound(state)
      state = next.localCheckpoint(true)
      merges = merges :+ top1.select(lit(r).as("rank"), col("a").as("lhs"), col("b").as("rhs"), col("n").as("pair_n"))
      r += 1
    }
    (state, merges.reduce(_ union _))
  }
}
