package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
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
    graft.functions.GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        builder))
    }
  }
}
