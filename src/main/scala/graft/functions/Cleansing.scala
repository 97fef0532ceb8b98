package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar cleansing/enrichment functions of the silver transform, as pure
  * `Column` builders (whole-stage-codegen'd; no UDFs anywhere).
  *
  * Semantics mirror the reference silver job
  * (jobs/silver/claims_to_iceberg.py:50-85); see Scaladoc on each member.
  */
object Cleansing {

  /** Multi-format date parse with first-match-wins fallback
    * (claims_to_iceberg.py:60-63): ISO, then US, then EU. Requires
    * non-ANSI mode so unparseable input yields null (Engine.configure).
    * Day-≤12 EU dates deliberately mis-parse as US — that is the
    * reference's behavior and the oracle reproduces it. */
  def parseServiceDate(c: Column): Column = coalesce(
    to_date(c, "yyyy-MM-dd"),
    to_date(c, "MM/dd/yyyy"),
    to_date(c, "dd/MM/yyyy"))

  /** provider: null/blank → UNKNOWN, else UPPER(TRIM)
    * (claims_to_iceberg.py:54-56). */
  def cleanProvider(c: Column): Column =
    when(c.isNull || trim(c) === "", lit("UNKNOWN")).otherwise(upper(trim(c)))

  /** amount: null/negative → 0.0 (claims_to_iceberg.py:57-59). */
  def clampAmount(c: Column): Column =
    when(c.isNull || c < 0, lit(0.0)).otherwise(c)

  /** Bucketing cascade (claims_to_iceberg.py:70-75); `<=` boundaries are
    * load-bearing (amount exactly 100/1000/10000 take the lower bucket). */
  def amountCategory(c: Column, low: Double = 100.0, medium: Double = 1000.0,
      high: Double = 10000.0): Column =
    when(c === 0.0, "ZERO")
      .when(c <= low, "LOW")
      .when(c <= medium, "MEDIUM")
      .when(c <= high, "HIGH")
      .otherwise("VERY_HIGH")

  /** Order-sensitive quality-score cascade (claims_to_iceberg.py:77-82):
    * null claim_id → 0.0 BEFORE null member_id → 0.3 BEFORE null date →
    * 0.5 BEFORE zero amount → 0.7, else 1.0. `when` short-circuits exactly
    * like the reference's chained F.when. */
  def qualityScore(claimId: Column, memberId: Column, serviceDate: Column,
      amount: Column): Column =
    when(claimId.isNull, 0.0)
      .when(memberId.isNull, 0.3)
      .when(serviceDate.isNull, 0.5)
      .when(amount <= 0.0, 0.7)
      .otherwise(1.0)
}
