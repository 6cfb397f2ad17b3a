package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression,
  Length, LessThan, LessThanOrEqual, Levenshtein, Literal, PredicateHelper,
  Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Filters above an [[AsOfJoin]] that reference only left-side columns
  * slide below it (the left side drives the output rows 1:1, so this is
  * semantics-preserving) — from there Catalyst's stock rules carry them
  * into the scan (`PushedFilters`). Catalyst can't do this for an
  * operator it doesn't know; without the rule a merchant-scoped as-of
  * query scans the whole left table. */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(_.references.subsetOf(j.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(leftOnly.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (edit distance is bounded below by the length difference), so the
  * rule adds that conjunct IN FRONT of the distance test: `And`
  * short-circuits left-to-right, and the length probe is O(1) where
  * the DP is O(len²) — length-distant candidate pairs never run the
  * DP at all. A semantic-equality guard keeps the rewrite idempotent
  * across optimizer iterations. */
object PruneLevenshteinByLength extends Rule[LogicalPlan] with PredicateHelper {
  private def bound(e: Expression): Option[Expression] = e match {
    // deterministic only: the bound re-evaluates a and b, which would
    // observe different values from a nondeterministic argument (the
    // same guard stock predicate-pushdown rules apply)
    case LessThanOrEqual(Levenshtein(a, b, None), k: Literal)
        if a.deterministic && b.deterministic =>
      Some(LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k))
    case LessThan(Levenshtein(a, b, None), k: Literal)
        if a.deterministic && b.deterministic =>
      Some(LessThan(Abs(Subtract(Length(a), Length(b))), k))
    case _ => None
  }

  private def strengthen(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val extras = conjuncts.flatMap(bound)
      .filterNot(x => conjuncts.exists(_.semanticEquals(x)))
    if (extras.isEmpty) None else Some((extras ++ conjuncts).reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // both homes of a distance predicate: a Filter, or a Join condition
    // (Catalyst folds a filter over a cross join into the join itself)
    case f @ Filter(cond, child) =>
      strengthen(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      strengthen(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}

/** Formal registration path for the engine's Catalyst extensions —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`: the as-of
  * planner strategy + pushdown rule, and the SQL-callable custom
  * function surface ([[graft.functions.GraftFunctions]]). Existing
  * sessions get the same functions via
  * `GraftFunctions.registerTemp(spark)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfStrategy)
    e.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
    e.injectOptimizerRule(_ => PruneLevenshteinByLength)
    graft.functions.GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        builder))
    }
  }
}
