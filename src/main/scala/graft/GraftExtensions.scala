package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Library Catalyst extensions — register with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `builder.withExtensions(new GraftExtensions)`); [[Engine.session]]
  * does it by default.
  *
  * Injected as operator-optimization rules, which run BEFORE the stock
  * `RewriteDistinctAggregates` batch — the window where
  * [[graft.plans.SplitMultiDistinctAggregate]] can claim a
  * multi-distinct/percentile Aggregate ahead of the Expand-based plan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => graft.plans.SplitMultiDistinctAggregate)
}
