package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic-arithmetic helpers for the DuckDB differential oracle.
  *
  * Summing IEEE doubles is order-dependent, and Spark's partial/final
  * aggregation order differs run-to-run and engine-to-engine. Routing sums
  * through an exact decimal accumulator and casting the final value back to
  * double yields bit-identical results in any engine and any execution order
  * — at 100 TB this also removes nondeterminism across retries/speculative
  * tasks. Decimal aggregation is codegen'd (HashAggregateExec) and ~free
  * relative to the scan.
  */
object Exact {
  val Money: DecimalType = DecimalType(38, 4)
  val Wide: DecimalType = DecimalType(38, 6)

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact sum of a double product/expression needing more scale. */
  def dsumWide(c: Column): Column = sum(c.cast(Wide)).cast(DoubleType)

  /** Exact mean: exact sum ÷ group count (count(*) semantics — caller must
    * guarantee no nulls in c, true for all cleansed/clamped columns). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** COUNT(CASE WHEN p THEN 1 END) — Trino's conditional count. */
  def countIf(p: Column): Column = count(when(p, 1))

  /** cnt*100.0/total percentage over two count columns.
    *
    * Deliberately NOT rounded: Spark rounds doubles via BigDecimal
    * HALF_UP on the exact binary value while DuckDB rounds the shortest
    * decimal representation (round(2.675d,2) = 2.67 vs 2.68), so any
    * rounded double can hash-mismatch at a boundary. Raw division of
    * exact counts is bit-identical everywhere. */
  def pct(cnt: Column, total: Column): Column =
    cnt.cast(DoubleType) * 100.0 / total.cast(DoubleType)

  /** Exact discrete median (Trino PERCENTILE_DISC(0.5) WITHIN GROUP ...,
    * DuckDB quantile_disc(x, 0.5)): an actual element of the group, so the
    * double compares bit-for-bit across engines — interpolating medians
    * don't.
    *
    * Scale caveat: percentile_disc is a TypedImperativeAggregate that
    * buffers every raw group value and drags the whole operator to
    * ObjectHashAggregate — fine for bounded groups, an OOM for hot ones.
    * The gold views use the sort-based decomposition
    * (GoldViews.medianDiscBy: value at ceil(n/2) via row_number +
    * broadcast totals) instead; this single-expression form remains for
    * callers whose group sizes are known-bounded. */
  def medianDisc(col: String): Column =
    expr(s"percentile_disc(0.5) within group (order by $col)")
}
