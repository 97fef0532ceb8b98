package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe aggregation patterns shared by the gold views and check
  * queries — the hand-written counterparts of
  * [[graft.plans.SplitMultiDistinctAggregate]] for the DataFrame path
  * (the driver's session carries no extensions, so these operators build
  * the decomposed plan directly).
  */
object AggPatterns {

  /** Exact per-group COUNT(DISTINCT expr) as its own two-level hash
    * aggregation: dedup (keys, expr) then count per keys — partial+final
    * HashAggregate with map-side combine at BOTH levels, shuffle bytes ∝
    * distinct pairs. Composing several of these by key-join replaces the
    * single-operator multi-distinct plan, where >1 distinct set makes
    * Catalyst Expand the fact table once per set (row multiplication ∝
    * #sets) — measured 8.7 s → sub-second on provider_performance at
    * sf0.1, and the Expand is exactly what cannot ship at 100 TB. */
  def distinctCount(df: DataFrame, keys: Seq[String], e: Column,
      as: String): DataFrame =
    df.select(keys.map(col) :+ e.as("__d"): _*).distinct()
      // count(__d), not count(*): the dedup keeps one (keys, NULL) row
      // per group, which COUNT(DISTINCT expr) does not count
      .groupBy(keys.map(col): _*).agg(count(col("__d")).as(as))

  /** Global (no-group) exact COUNT(DISTINCT expr): dedup then count —
    * one row out; count(col) skips the null row exactly like
    * countDistinct. Cross-join the 1-row frames to compose. */
  def globalDistinctCount(df: DataFrame, e: Column, as: String): DataFrame =
    df.select(e.as("__d")).distinct().agg(count(col("__d")).as(as))

  /** Inner join on group keys with NULL-SAFE equality, dropping the
    * right side's key copies — the join a decomposed aggregation needs:
    * a group whose key is NULL exists in every branch and must match
    * itself (a plain using-join's EqualTo would silently drop the whole
    * group). Mirrors the EqualNullSafe conditions
    * [[graft.plans.SplitMultiDistinctAggregate]] emits on the SQL path. */
  def nullSafeKeyJoin(l: DataFrame, r: DataFrame, keys: Seq[String],
      joinType: String = "inner"): DataFrame = {
    // rename-then-join: branch frames share lineage (same base plan), so
    // l(k)/r(k) references would hit ambiguous-self-join resolution;
    // renamed right keys are unambiguous by construction
    val rr = keys.foldLeft(r)((df, k) => df.withColumnRenamed(k, s"__r_$k"))
    val cond = keys.map(k => col(k) <=> col(s"__r_$k")).reduce(_ && _)
    keys.foldLeft(l.join(rr, cond, joinType))((df, k) => df.drop(s"__r_$k"))
  }
}
