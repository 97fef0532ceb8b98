package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: split an Aggregate whose shape would force Catalyst's
  * Expand-based multi-distinct plan into a join of per-category
  * sub-aggregates.
  *
  * Stock planning of `GROUP BY k` with ≥2 DISTINCT sets replicates every
  * input row once per distinct set (`RewriteDistinctAggregates` →
  * Expand), and any percentile-family aggregate sharing the operator
  * rides along as a TypedImperativeAggregate whose per-(k, distinct-col)
  * partial buffers ship through the shuffle — measured 8.7 s vs 2.5 s at
  * sf0.1 on the provider_performance view, with row multiplication ∝
  * #distinct-sets that cannot ship at 100 TB. The decomposed form this
  * rule emits is the one a Spark expert writes by hand (and the
  * DataFrame path does, [[graft.operators.GoldViews]]):
  *
  *  - BASE: one codegen'd two-phase hash aggregate for all plain
  *    aggregates;
  *  - one DEDUP-THEN-AGG pair per distinct set (map-side combine at both
  *    levels, shuffle ∝ distinct (key, value) pairs);
  *  - one branch for percentile-family aggregates (still
  *    buffer-collecting, but keyed on the group alone and no longer
  *    dragging the base into ObjectHashAggregate);
  *  - inner joins on null-safe group keys (every branch aggregates the
  *    same child, so group sets are identical; global aggregates join as
  *    1-row × 1-row cross products).
  *
  * Registered through [[graft.GraftExtensions]]
  * (`injectOptimizerRule`, operator-optimization batch — i.e. BEFORE
  * `RewriteDistinctAggregates` can introduce the Expand), so verbatim
  * user SQL like the reference's gold views
  * (sql/gold/create_views.sql:54-72: 2 COUNT(DISTINCT)s +
  * PERCENTILE_DISC in one GROUP BY) gets the scalable plan without
  * rewriting a line. Output attribute ids are preserved, so parent
  * HAVING/ORDER BY/projections are untouched.
  *
  * FILTERed distinct aggregates (`COUNT(DISTINCT x) FILTER (WHERE p)`)
  * are split too — but NOT by pushing `p` below the dedup as a Filter
  * node: that would drop groups where no row passes `p`, and the inner
  * rejoin would silently delete those groups from the whole result (the
  * stock plan keeps them with count 0). Instead `p` joins the dedup
  * GROUPING KEY (so the branch still sees every group) and is re-applied
  * as a plain aggregate FILTER on the deduplicated rows: for a fixed
  * group, the deduped (value, p) rows restricted to p = true carry
  * exactly the distinct values with ≥1 passing row.
  *
  * Bails out (leaves the stock plan) on: a single distinct set with no
  * percentile (planned without Expand already), unsupported distinct
  * functions, non-deterministic or subquery-bearing expressions, and
  * streaming children (the emitted self-join is a batch shape).
  */
object SplitMultiDistinctAggregate extends Rule[LogicalPlan] {

  private def isPercentileLike(f: AggregateFunction): Boolean = f match {
    case _: Percentile | _: PercentileDisc | _: PercentileCont | _: Median |
         _: ApproximatePercentile => true
    case _ => false
  }

  /** Distinct functions whose DISTINCT form equals the plain form over
    * deduplicated (group, data-children) rows — which is the DEFINITION
    * of DISTINCT aggregation, so the list is bounded not by semantics but
    * by mechanics: every DATA child becomes a dedup grouping key and is
    * then substituted with the deduped attribute via `withNewChildren`.
    * For most functions every child is data. Percentile-family functions
    * smuggle the foldable percentage/frequency expressions into
    * `children` — [[dataChildren]] restricts the dedup key and the
    * substitution to the value child (prefix), leaving the foldable tail
    * verbatim so its foldability contract holds; a NON-foldable tail
    * (percentile's per-row frequency argument) bails, since a frequency
    * column would have to join the dedup key and change the semantics.
    * Arbitrary UDAFs/V2 aggregators make no children-layout guarantee —
    * bail to stock planning. Order-sensitive functions
    * (first/last/collect_list) are safe to ride: their DISTINCT form is
    * order-unspecified in stock Spark too, and after dedup they see
    * exactly the distinct tuple set. */
  private def supportedDistinct(f: AggregateFunction): Boolean = f match {
    case _: Count | _: Sum | _: Average | _: Min | _: Max => true
    case _: CollectSet | _: CollectList => true
    case _: First | _: Last => true
    case _: BoolAnd | _: BoolOr => true
    case _: BitAndAgg | _: BitOrAgg | _: BitXorAgg => true
    case _: CentralMomentAgg => true // stddev/variance/skewness/kurtosis
    case _: Corr | _: Covariance => true
    case _: HyperLogLogPlusPlus => true // approx_count_distinct: DISTINCT no-op
    case p if isPercentileLike(p) => p.children.drop(1).forall(_.foldable)
    case _ => false
  }

  /** The children that carry per-row DATA (dedup keys of the distinct
    * branch). Percentile-family: the value child alone — the rest is the
    * foldable percentage/accuracy/frequency tail, checked foldable in
    * [[supportedDistinct]] and carried through substitution verbatim. */
  private def dataChildren(f: AggregateFunction): Seq[Expression] =
    if (isPercentileLike(f)) f.children.take(1) else f.children

  private def aggExprsOf(a: Aggregate): Seq[AggregateExpression] = {
    val seen = collection.mutable.LinkedHashMap.empty[Expression, AggregateExpression]
    a.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression =>
        if (!seen.contains(ae.canonicalized)) seen(ae.canonicalized) = ae
      case _ =>
    })
    seen.values.toSeq
  }

  /** Branch identity of a distinct aggregate: its DATA argument set AND
    * its FILTER (two filters need two dedup branches; two percentiles
    * over one column with different percentages share one). */
  private def distinctKey(ae: AggregateExpression): (Seq[Expression], Option[Expression]) =
    (dataChildren(ae.aggregateFunction).map(_.canonicalized),
      ae.filter.map(_.canonicalized))

  /** The SINGLE-distinct-set + percentile case is a judgment call, so it
    * is measured, not assumed (round-9): stock planning handles one
    * distinct set without Expand (planAggregateWithOneDistinct — a
    * 4-phase aggregate, no join), but any percentile sharing the
    * operator drags the whole thing into ObjectHashAggregate with its
    * row-collecting buffers keyed per (group, distinct-value) through
    * BOTH shuffles. Measured on lineitem sf0.1 (~600k rows,
    * count(DISTINCT l_partkey) + percentile_disc(0.5) + count(*) GROUP
    * BY l_suppkey): stock 2.12–6.67 s across 4 runs (the partial
    * percentile buffers are keyed per (l_suppkey, l_partkey) through
    * the first exchange — width ∝ distinct pairs) vs split
    * 0.67–0.75 s steady (~3×; the split isolates the percentile on a
    * group-keyed branch and the dedup branch stays codegen'd
    * HashAggregate). One fewer join does NOT pay for distinct-keyed
    * percentile buffers. Default ON; the conf is the escape hatch (and
    * the measurement harness toggle). */
  private def splitSinglePercentile: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.getConfString(
      "spark.graft.split.singleDistinctPercentile", "true").toBoolean

  private def shouldRewrite(a: Aggregate): Boolean = {
    val aes = aggExprsOf(a)
    val distincts = aes.filter(_.isDistinct)
    val distinctSets = distincts.map(distinctKey).distinct
    val percs = aes.filter(ae => !ae.isDistinct && isPercentileLike(ae.aggregateFunction))
    val worthIt = distinctSets.size >= 2 ||
      (distinctSets.size == 1 && percs.nonEmpty && splitSinglePercentile)
    def safe =
      distincts.forall(ae => supportedDistinct(ae.aggregateFunction)) &&
        a.aggregateExpressions.forall(_.deterministic) &&
        a.groupingExpressions.forall(_.deterministic) &&
        !a.expressions.exists(_.exists(_.isInstanceOf[PlanExpression[_]])) &&
        !a.child.isStreaming && a.resolved && childReplayable(a.child)
    worthIt && safe
  }

  /** The rewrite evaluates the child once per branch, so the child must
    * produce the same rows on every evaluation: no non-deterministic
    * expressions anywhere below, no TABLESAMPLE, no LIMIT (its row choice
    * is execution-order-dependent without a total order). Stock planning
    * evaluates the child once; duplicating a non-replayable child would
    * let branches aggregate different data. */
  private def childReplayable(p: LogicalPlan): Boolean =
    !p.exists {
      case _: Sample => true
      case _: GlobalLimit | _: LocalLimit => true
      case node => node.expressions.exists(e => !e.deterministic)
    }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case a: Aggregate if shouldRewrite(a) => rewrite(a)
  }

  private def rewrite(a: Aggregate): LogicalPlan = {
    val groupExprs = a.groupingExpressions
    val child = a.child
    val aes = aggExprsOf(a)

    val distincts = aes.filter(_.isDistinct)
    val percs = aes.filter(ae => !ae.isDistinct && isPercentileLike(ae.aggregateFunction))
    val base = aes.filterNot(ae => ae.isDistinct || percs.contains(ae))
    val distinctGroups
        : Seq[(Seq[Expression], Option[Expression], Seq[AggregateExpression])] =
      distincts.groupBy(distinctKey)
        .toSeq.map { case (_, group) =>
          (dataChildren(group.head.aggregateFunction), group.head.filter,
            group) }

    def freshGroupAliases(): Seq[Alias] =
      groupExprs.zipWithIndex.map { case (e, i) => Alias(e, s"_gk$i")() }

    // one branch = (plan, group-key output attrs, ae.canonicalized -> output attr)
    type Branch = (LogicalPlan, Seq[Attribute], Seq[(Expression, Attribute)])

    def plainBranch(fns: Seq[AggregateExpression]): Branch = {
      val gs = freshGroupAliases()
      val outs = fns.map(ae => Alias(ae, ae.aggregateFunction.prettyName)())
      val plan = Aggregate(groupExprs, gs ++ outs, child)
      (plan, gs.map(_.toAttribute),
        fns.zip(outs).map { case (ae, o) => ae.canonicalized -> o.toAttribute })
    }

    def distinctBranch(children: Seq[Expression], filter: Option[Expression],
        fns: Seq[AggregateExpression]): Branch = {
      val gs = freshGroupAliases()
      val ds = children.zipWithIndex.map { case (e, i) => Alias(e, s"_dv$i")() }
      // the FILTER predicate dedups as an extra KEY (never a Filter node
      // below the aggregate — that would drop groups with no passing row
      // and the inner rejoin would lose them); re-applied on the deduped
      // rows as a plain aggregate FILTER
      val fs = filter.map(Alias(_, "_fv")())
      val dedup = Aggregate(groupExprs ++ children ++ filter.toSeq,
        gs ++ ds ++ fs.toSeq, child)
      val dAttrs = ds.map(_.toAttribute)
      val outs = fns.map { ae =>
        // substitute the DATA children (a prefix) with the deduped
        // attributes; a percentile-family foldable tail rides verbatim
        val plainFn = ae.aggregateFunction.withNewChildren(
          dAttrs ++ ae.aggregateFunction.children.drop(dAttrs.size))
          .asInstanceOf[AggregateFunction]
        Alias(ae.copy(aggregateFunction = plainFn, isDistinct = false,
          filter = fs.map(_.toAttribute),
          resultId = NamedExpression.newExprId), plainFn.prettyName)()
      }
      val gAttrs = gs.map(_.toAttribute)
      val plan = Aggregate(gAttrs, (gAttrs: Seq[NamedExpression]) ++ outs, dedup)
      (plan, gAttrs,
        fns.zip(outs).map { case (ae, o) => ae.canonicalized -> o.toAttribute })
    }

    val branches: Seq[Branch] =
      (if (base.nonEmpty || distinctGroups.isEmpty && percs.isEmpty)
        Seq(plainBranch(base)) else Nil) ++
        distinctGroups.map { case (children, filter, fns) =>
          distinctBranch(children, filter, fns) } ++
        (if (percs.nonEmpty) Seq(plainBranch(percs)) else Nil)

    val (anchorPlan, anchorGroupAttrs, anchorMap) = branches.head
    val (joined, aeMap) = branches.tail.foldLeft((anchorPlan, anchorMap.toMap)) {
      case ((acc, m), (p, gAttrs, bMap)) =>
        val cond = anchorGroupAttrs.zip(gAttrs)
          .map { case (l, r) => EqualNullSafe(l, r): Expression }
          .reduceOption(And)
        (Join(acc, p, Inner, cond, JoinHint.NONE), m ++ bMap)
    }

    val groupMap: Map[Expression, Attribute] =
      groupExprs.map(_.canonicalized).zip(anchorGroupAttrs).toMap

    val projectList = a.aggregateExpressions.map { ne =>
      val replaced = ne.transformDown {
        case ae: AggregateExpression if aeMap.contains(ae.canonicalized) =>
          aeMap(ae.canonicalized)
        case e if groupMap.contains(e.canonicalized) => groupMap(e.canonicalized)
      }
      replaced match {
        case al: Alias => al
        case other => Alias(other, ne.name)(exprId = ne.exprId)
      }
    }
    Project(projectList, joined)
  }
}
