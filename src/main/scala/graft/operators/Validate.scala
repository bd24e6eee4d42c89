package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality constraint report — the validation pass a
  * pipeline runs on every batch BEFORE it reaches training (the
  * reference validates snapshots field-by-field while parsing,
  * crates/daemon parquet_handler.rs; this is the declarative,
  * set-based form). Three constraint classes, each in its
  * minimal-shuffle shape:
  *
  *  - row rules (null / range / set membership): ONE shared scan —
  *    every rule is a `sum(when(violated, 1))` in the same partial
  *    aggregate, so adding rules adds zero passes;
  *  - key uniqueness: groupBy(key) counting excess rows (partial agg;
  *    violations = Σ max(cnt − 1, 0));
  *  - referential integrity: LEFT ANTI join against the dimension's
  *    distinct keys (broadcast when dimension-sized).
  *
  * Output: one row per constraint (constraint, n_checked,
  * n_violations), total-ordered. All counts exact — the report is a
  * gate, and a gate that samples lies.
  */
object Validate {

  final case class RowRule(name: String, violated: Column)

  def report(df: DataFrame,
      rules: Seq[RowRule],
      uniqueKeys: Seq[(String, Column)] = Nil,
      refs: Seq[(String, Column, DataFrame, Column)] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty || refs.nonEmpty,
      "Validate.report needs at least one constraint (rules, uniqueKeys, or refs)")
    // one shared scan for ALL row rules AND the total — the 1-row
    // result is checkpointed so the referential rows below reuse the
    // count instead of re-scanning the input (each extra consumer of
    // a lazy aggregate re-reads the full corpus at 100 TB)
    val rowAgg = df.agg(count(lit(1)).as("n_checked"),
      rules.map(r => sum(when(r.violated, 1L).otherwise(0L)).as(r.name)): _*)
      .localCheckpoint(true)
    // explode(array()) over zero struct columns cannot resolve, so a
    // rules-free call contributes no row-rule rows (rowAgg still
    // carries n_checked for the referential branch below)
    val rowRows = if (rules.isEmpty) Nil else Seq(
      rowAgg.select(explode(array(rules.map(r =>
          struct(lit(r.name).as("constraint"), col("n_checked"),
            coalesce(col(r.name), lit(0L)).as("n_violations"))): _*)).as("r"))
        .select(col("r.constraint"), col("r.n_checked"), col("r.n_violations")))

    val uniqueRows = uniqueKeys.map { case (name, key) =>
      df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_checked"),
          sum(col("cnt") - 1).as("n_violations"))
        .select(lit(name).as("constraint"),
          coalesce(col("n_checked"), lit(0L)).as("n_checked"),
          coalesce(col("n_violations"), lit(0L)).as("n_violations"))
    }

    val refRows = refs.map { case (name, key, dim, dimKey) =>
      val missing = df.select(key.as("k"))
        .join(dim.select(dimKey.as("k")).distinct(), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      rowAgg.select(col("n_checked")).crossJoin(missing)
        .select(lit(name).as("constraint"), col("n_checked"), col("n_violations"))
    }

    (rowRows ++ uniqueRows ++ refRows).reduce(_ unionByName _)
      .orderBy(col("constraint"))
  }
}
