package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The six gold views as SPARK SQL over a `silver_claims` temp view —
  * the reference user's own interface (sql/gold/create_views.sql runs
  * as SQL text; a migrating user pastes their views here, s/lake.silver
  * .claims/silver_claims/, and runs). The DataFrame formulations in
  * [[GoldViews]] are the oracle-checked primary path; this SQL path is
  * the dialect-compatibility surface, with the Trino→Spark deltas of
  * SURVEY.md §7.4 applied and marked:
  *   - DATE(y || '-' || LPAD(m) || '-01')  →  make_date(y, m, 1)
  *     (Spark's to_date rejects Trino's unpadded concat — F11)
  *   - DATE_DIFF('day', a, b)              →  datediff(b, a)  (F13)
  *   - date floor 2023-01-01               →  1996-01-01 (fixture dates)
  * PERCENTILE_DISC(0.5) WITHIN GROUP, `!=`, `||`, LPAD, INTERVAL 'n'
  * DAY, COUNT(CASE WHEN …) all parse unchanged.
  */
object GoldSql {

  val ViewNames: Seq[String] = Seq("gold_claims_summary",
    "gold_monthly_claims_trend", "gold_provider_performance",
    "gold_data_quality_dashboard", "gold_member_activity",
    "gold_recent_activity")

  /** create_views.sql:8-159 transplanted; views stay logical (re-planned
    * per query) exactly like Trino views. */
  def createViews(spark: SparkSession): Unit = {
    spark.sql("""CREATE OR REPLACE TEMP VIEW gold_claims_summary AS
SELECT service_year, service_month, provider_name, claim_amount_category,
    COUNT(*) as total_claims,
    COUNT(DISTINCT member_id) as unique_members,
    SUM(claim_amount) as total_amount,
    AVG(claim_amount) as avg_claim_amount,
    MIN(claim_amount) as min_claim_amount,
    MAX(claim_amount) as max_claim_amount,
    AVG(data_quality_score) as avg_quality_score,
    COUNT(CASE WHEN data_quality_score >= 0.8 THEN 1 END) as high_quality_claims,
    MAX(processing_timestamp) as last_processed
FROM silver_claims
WHERE service_date >= DATE '1996-01-01'
GROUP BY service_year, service_month, provider_name, claim_amount_category""")

    spark.sql("""CREATE OR REPLACE TEMP VIEW gold_monthly_claims_trend AS
SELECT service_year, service_month,
    make_date(service_year, service_month, 1) as month_date,
    COUNT(*) as claims_count,
    COUNT(DISTINCT member_id) as unique_members,
    SUM(claim_amount) as total_amount,
    AVG(claim_amount) as avg_amount,
    COUNT(CASE WHEN claim_amount_category = 'HIGH' THEN 1 END) as high_value_claims,
    COUNT(CASE WHEN claim_amount_category = 'VERY_HIGH' THEN 1 END) as very_high_value_claims,
    ROUND(AVG(data_quality_score), 3) as avg_quality_score
FROM silver_claims
WHERE service_date >= DATE '1996-01-01'
GROUP BY service_year, service_month
ORDER BY service_year DESC, service_month DESC""")

    spark.sql("""CREATE OR REPLACE TEMP VIEW gold_provider_performance AS
SELECT provider_name,
    COUNT(*) as total_claims,
    COUNT(DISTINCT member_id) as unique_members,
    SUM(claim_amount) as total_billed,
    AVG(claim_amount) as avg_claim_amount,
    PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY claim_amount) as median_claim_amount,
    COUNT(CASE WHEN claim_amount_category IN ('HIGH', 'VERY_HIGH') THEN 1 END) as high_value_claims,
    ROUND(COUNT(CASE WHEN claim_amount_category IN ('HIGH', 'VERY_HIGH') THEN 1 END) * 100.0 / COUNT(*), 2) as high_value_percentage,
    ROUND(AVG(data_quality_score), 3) as avg_quality_score,
    MIN(service_date) as first_service_date,
    MAX(service_date) as last_service_date,
    COUNT(DISTINCT make_date(service_year, service_month, 1)) as active_months
FROM silver_claims
WHERE provider_name != 'UNKNOWN'
GROUP BY provider_name
HAVING COUNT(*) >= 10
ORDER BY total_billed DESC""")

    spark.sql("""CREATE OR REPLACE TEMP VIEW gold_data_quality_dashboard AS
SELECT service_year, service_month,
    COUNT(*) as total_records,
    COUNT(CASE WHEN data_quality_score >= 0.9 THEN 1 END) as excellent_quality,
    COUNT(CASE WHEN data_quality_score >= 0.7 AND data_quality_score < 0.9 THEN 1 END) as good_quality,
    COUNT(CASE WHEN data_quality_score >= 0.5 AND data_quality_score < 0.7 THEN 1 END) as fair_quality,
    COUNT(CASE WHEN data_quality_score < 0.5 THEN 1 END) as poor_quality,
    ROUND(AVG(data_quality_score), 3) as avg_quality_score,
    ROUND(COUNT(CASE WHEN data_quality_score >= 0.8 THEN 1 END) * 100.0 / COUNT(*), 2) as high_quality_percentage,
    COUNT(CASE WHEN claim_id IS NULL THEN 1 END) as missing_claim_id,
    COUNT(CASE WHEN member_id IS NULL THEN 1 END) as missing_member_id,
    COUNT(CASE WHEN service_date IS NULL THEN 1 END) as missing_service_date,
    COUNT(CASE WHEN claim_amount IS NULL OR claim_amount <= 0 THEN 1 END) as invalid_amount,
    MAX(processing_timestamp) as last_processed
FROM silver_claims
GROUP BY service_year, service_month
ORDER BY service_year DESC, service_month DESC""")

    spark.sql("""CREATE OR REPLACE TEMP VIEW gold_member_activity AS
SELECT member_id,
    COUNT(*) as total_claims,
    SUM(claim_amount) as total_amount,
    AVG(claim_amount) as avg_claim_amount,
    COUNT(DISTINCT provider_name) as providers_used,
    COUNT(CASE WHEN claim_amount_category IN ('HIGH', 'VERY_HIGH') THEN 1 END) as high_value_claims,
    MIN(service_date) as first_service_date,
    MAX(service_date) as last_service_date,
    ROUND(AVG(data_quality_score), 3) as avg_quality_score,
    datediff(MAX(service_date), MIN(service_date)) as activity_span_days,
    COUNT(DISTINCT make_date(service_year, service_month, 1)) as active_months
FROM silver_claims
WHERE member_id IS NOT NULL
GROUP BY member_id
HAVING COUNT(*) >= 2
ORDER BY total_amount DESC""")

    spark.sql("""CREATE OR REPLACE TEMP VIEW gold_recent_activity AS
SELECT 'Last 30 Days' as period,
    COUNT(*) as claims_processed,
    COUNT(DISTINCT member_id) as unique_members,
    COUNT(DISTINCT provider_name) as unique_providers,
    SUM(claim_amount) as total_amount,
    AVG(claim_amount) as avg_amount,
    ROUND(AVG(data_quality_score), 3) as avg_quality,
    MAX(processing_timestamp) as last_update
FROM silver_claims
WHERE processing_timestamp >= CURRENT_TIMESTAMP - INTERVAL '30' DAY
UNION ALL
SELECT 'Last 7 Days', COUNT(*), COUNT(DISTINCT member_id),
    COUNT(DISTINCT provider_name), SUM(claim_amount), AVG(claim_amount),
    ROUND(AVG(data_quality_score), 3), MAX(processing_timestamp)
FROM silver_claims
WHERE processing_timestamp >= CURRENT_TIMESTAMP - INTERVAL '7' DAY
UNION ALL
SELECT 'Last 24 Hours', COUNT(*), COUNT(DISTINCT member_id),
    COUNT(DISTINCT provider_name), SUM(claim_amount), AVG(claim_amount),
    ROUND(AVG(data_quality_score), 3), MAX(processing_timestamp)
FROM silver_claims
WHERE processing_timestamp >= CURRENT_TIMESTAMP - INTERVAL '1' DAY""")
  }

  def view(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
