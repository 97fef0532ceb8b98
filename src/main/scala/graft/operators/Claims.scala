package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cleansing

/** The silver cleanse pipeline (SURVEY.md §3.2), transplanted onto the
  * driver's star schema per SURVEY.md §7.1: `orders` plays the claims fact.
  *
  * [[RawClaims.fromOrders]] deterministically injects the dirty-value cases
  * the reference's cleanse handles (FIXTURES.md §A): null/padded ids, blank
  * providers, null/negative amounts, three date formats plus garbage. The
  * injection is pure column arithmetic on o_orderkey, so the DuckDB oracle
  * reproduces it exactly (graft.Oracles.ClaimsCte).
  */
object RawClaims {
  def fromOrders(orders: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    orders.select(
      when(k % 97 === 0, lit(null)).otherwise(
        concat(lit("  C"), k.cast("string"), lit(" "))).as("claim_id_raw"),
      when(k % 13 === 0, lit(null)).otherwise(
        concat(lit("M"), col("o_custkey").cast("string"))).as("member_id_raw"),
      when(k % 11 === 0, lit(null))
        .when(k % 11 === 1, lit("  "))
        .otherwise(concat(lit(" prov_"), (k % 7).cast("string"), lit(" ")))
        .as("provider_raw"),
      when(k % 19 === 0, lit(null))
        .when(k % 23 === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("amount_raw"),
      when(k % 4 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .when(k % 4 === 1, date_format(col("o_orderdate"), "MM/dd/yyyy"))
        .when(k % 4 === 2, date_format(col("o_orderdate"), "dd/MM/yyyy"))
        .otherwise(lit("not-a-date")).as("service_date_raw"),
      col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
  }
}

/** Cleanse → enrich → score → quality-gate, mirroring
  * jobs/silver/claims_to_iceberg.py:45-88 stage by stage. One linear
  * Project/Filter chain: Catalyst collapses it into a single whole-stage
  * codegen'd map over the scan — no shuffle until a downstream aggregate,
  * so it scales linearly with input at 100 TB. */
object SilverCleanse {

  /** Dirty claims → silver claims. Output columns: claim_id, member_id,
    * provider_name, claim_amount, service_date, service_year,
    * service_month, service_day, claim_amount_category,
    * data_quality_score, processing_timestamp (+ any `passthrough`
    * columns). The processing stamp is the reference's silver:76; the
    * clock is injectable so tests/oracles stay deterministic. */
  def clean(raw: DataFrame,
      passthrough: Seq[String] = Seq("o_orderpriority"),
      clock: Column = current_timestamp()): DataFrame = {
    val cleansed = raw
      .filter(col("claim_id_raw").isNotNull) // P1, silver:51
      .select(Seq(
        trim(col("claim_id_raw")).as("claim_id"),
        trim(col("member_id_raw")).as("member_id"),
        Cleansing.cleanProvider(col("provider_raw")).as("provider_name"),
        Cleansing.clampAmount(col("amount_raw")).as("claim_amount"),
        Cleansing.parseServiceDate(col("service_date_raw")).as("service_date")
      ) ++ passthrough.map(col): _*)
    val enriched = cleansed
      .withColumn("service_year", year(col("service_date")))
      .withColumn("service_month", month(col("service_date")))
      .withColumn("service_day", dayofmonth(col("service_date")))
      .withColumn("claim_amount_category",
        Cleansing.amountCategory(col("claim_amount")))
      .withColumn("data_quality_score",
        Cleansing.qualityScore(col("claim_id"), col("member_id"),
          col("service_date"), col("claim_amount")))
      .withColumn("processing_timestamp", clock) // silver:76
    // P2, silver:85 — the reference gate is data_quality_score >= 0.5.
    // The cascade gives scores < 0.5 EXACTLY when claim_id or member_id
    // is null (0.0 / 0.3 branches; 0.5, 0.7, 1.0 all pass), so the gate
    // rewrites to this cheap equivalent predicate. Filtering on the
    // score column itself is a perf trap: predicate pushdown substitutes
    // the alias, so the WHOLE score expression — including the 3-format
    // date parse — gets re-evaluated inside a pushed-down Filter below
    // the shuffle, doubling the most expensive per-row work at any
    // scale. PropertySpec proves the equivalence over generated inputs.
    enriched.filter(col("claim_id").isNotNull && col("member_id").isNotNull)
  }

  /** Full pipeline from the star-schema orders table. Engine.spread
    * parallelizes the per-row cleanse (3-format date parse, trims,
    * cascades) past the single-row-group test files; no-op at scale. */
  def fromOrders(orders: DataFrame): DataFrame =
    clean(RawClaims.fromOrders(graft.Engine.spread(orders)))

  /** Batch metadata columns the bronze job stamps
    * (ingest_csv_to_delta.py:60-63), with an injectable clock so tests and
    * oracles stay deterministic. */
  def withBatchMetadata(df: DataFrame, clock: Column = current_timestamp())
      : DataFrame =
    df.withColumn("ingestion_timestamp", clock)
      .withColumn("source_file", lit("csv"))
      .withColumn("batch_id", date_format(clock, "yyyyMMdd_HHmmss"))
}
