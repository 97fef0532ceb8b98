package graft

/** DuckDB oracle SQL, one entry per SparkEntry.queries key.
  *
  * Conventions keeping the hash-compare exact across engines:
  *  - every aggregate/computed column aliased identically to the Spark side;
  *  - double sums routed through DECIMAL(38,4|6) then cast back to DOUBLE
  *    (order-independent, bit-identical — see graft.functions.Exact);
  *  - year()/month()/datediff() cast to INT to match Spark's IntegerType;
  *  - explicit CAST(... AS DOUBLE) before any arithmetic that DuckDB would
  *    otherwise do in decimal;
  *  - medians via quantile_disc (an actual element, no interpolation);
  *  - every query totally ordered by its group keys.
  */
object Oracles {

  /** The dirty-claims injection + silver cleanse as DuckDB CTEs, the SQL
    * mirror of RawClaims.fromOrders + SilverCleanse.clean. */
  val ClaimsCte: String = """WITH raw_claims AS (
  SELECT
    CASE WHEN o_orderkey % 97 = 0 THEN NULL
         ELSE '  C' || CAST(o_orderkey AS VARCHAR) || ' ' END AS claim_id_raw,
    CASE WHEN o_orderkey % 13 = 0 THEN NULL
         ELSE 'M' || CAST(o_custkey AS VARCHAR) END AS member_id_raw,
    CASE WHEN o_orderkey % 11 = 0 THEN NULL
         WHEN o_orderkey % 11 = 1 THEN '  '
         ELSE ' prov_' || CAST(o_orderkey % 7 AS VARCHAR) || ' ' END AS provider_raw,
    CASE WHEN o_orderkey % 19 = 0 THEN NULL
         WHEN o_orderkey % 23 = 0 THEN - o_totalprice
         ELSE o_totalprice END AS amount_raw,
    CASE WHEN o_orderkey % 4 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
         WHEN o_orderkey % 4 = 1 THEN strftime(o_orderdate, '%m/%d/%Y')
         WHEN o_orderkey % 4 = 2 THEN strftime(o_orderdate, '%d/%m/%Y')
         ELSE 'not-a-date' END AS service_date_raw,
    o_orderkey, o_custkey, o_orderpriority
  FROM orders
), cleansed AS (
  SELECT
    trim(claim_id_raw) AS claim_id,
    trim(member_id_raw) AS member_id,
    CASE WHEN provider_raw IS NULL OR trim(provider_raw) = '' THEN 'UNKNOWN'
         ELSE upper(trim(provider_raw)) END AS provider_name,
    CAST(CASE WHEN amount_raw IS NULL OR amount_raw < 0 THEN 0.0
         ELSE amount_raw END AS DOUBLE) AS claim_amount,
    COALESCE(CAST(try_strptime(service_date_raw, '%Y-%m-%d') AS DATE),
             CAST(try_strptime(service_date_raw, '%m/%d/%Y') AS DATE),
             CAST(try_strptime(service_date_raw, '%d/%m/%Y') AS DATE)) AS service_date,
    o_orderpriority
  FROM raw_claims WHERE claim_id_raw IS NOT NULL
), enriched AS (
  SELECT *,
    CAST(year(service_date) AS INT) AS service_year,
    CAST(month(service_date) AS INT) AS service_month,
    CAST(day(service_date) AS INT) AS service_day,
    CASE WHEN claim_amount = 0 THEN 'ZERO'
         WHEN claim_amount <= 100 THEN 'LOW'
         WHEN claim_amount <= 1000 THEN 'MEDIUM'
         WHEN claim_amount <= 10000 THEN 'HIGH'
         ELSE 'VERY_HIGH' END AS claim_amount_category,
    CAST(CASE WHEN claim_id IS NULL THEN 0.0
         WHEN member_id IS NULL THEN 0.3
         WHEN service_date IS NULL THEN 0.5
         WHEN claim_amount <= 0 THEN 0.7
         ELSE 1.0 END AS DOUBLE) AS data_quality_score
  FROM cleansed
), silver AS (
  SELECT * FROM enriched WHERE data_quality_score >= 0.5
)"""

  val all: Map[String, String] = Map(
    "q_claims_summary" -> """SELECT
  CAST(year(l_shipdate) AS INT) AS service_year,
  CAST(month(l_shipdate) AS INT) AS service_month,
  l_returnflag,
  CASE WHEN l_extendedprice = 0 THEN 'ZERO'
       WHEN l_extendedprice <= 1000 THEN 'LOW'
       WHEN l_extendedprice <= 10000 THEN 'MEDIUM'
       WHEN l_extendedprice <= 50000 THEN 'HIGH'
       ELSE 'VERY_HIGH' END AS amount_category,
  count(*) AS total_claims,
  count(DISTINCT l_orderkey) AS unique_orders,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS avg_amount,
  min(l_extendedprice) AS min_amount,
  max(l_extendedprice) AS max_amount,
  count(CASE WHEN l_extendedprice > 10000 THEN 1 END) AS high_value_claims,
  min(l_shipdate) AS first_ship,
  max(l_shipdate) AS last_ship
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY 1, 2, 3, 4""",

    "q_monthly_trend" -> """SELECT *,
  make_date(service_year, service_month, 1) AS month_date
FROM (
  SELECT
    CAST(year(l_shipdate) AS INT) AS service_year,
    CAST(month(l_shipdate) AS INT) AS service_month,
    count(*) AS total_claims,
    count(DISTINCT l_orderkey) AS unique_orders,
    count(DISTINCT l_suppkey) AS unique_suppliers,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS avg_amount,
    min(l_extendedprice) AS min_amount,
    max(l_extendedprice) AS max_amount
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY 1, 2
) t ORDER BY service_year DESC, service_month DESC""",

    "q_provider_performance" -> """SELECT
  s_name AS provider_name,
  count(*) AS total_claims,
  count(DISTINCT l_orderkey) AS unique_orders,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS total_billed,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS avg_amount,
  quantile_disc(l_extendedprice, 0.5) AS median_amount,
  min(l_extendedprice) AS min_amount,
  max(l_extendedprice) AS max_amount,
  round(CAST(count(CASE WHEN l_extendedprice > 10000 THEN 1 END) AS DOUBLE) * 100.0
        / CAST(count(*) AS DOUBLE), 2) AS high_value_pct,
  count(DISTINCT make_date(CAST(year(l_shipdate) AS INT),
        CAST(month(l_shipdate) AS INT), 1)) AS active_months,
  min(l_shipdate) AS first_ship,
  max(l_shipdate) AS last_ship,
  CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS avg_quantity
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_name <> 'UNKNOWN'
GROUP BY s_name
HAVING count(*) >= 10
ORDER BY total_billed DESC, provider_name""",

    "q_dq_dashboard" -> (ClaimsCte + """
SELECT service_year, service_month,
  count(*) AS total_claims,
  count(CASE WHEN data_quality_score = 1.0 THEN 1 END) AS perfect_quality,
  count(CASE WHEN data_quality_score = 0.7 THEN 1 END) AS zero_amount_claims,
  count(CASE WHEN data_quality_score = 0.5 THEN 1 END) AS missing_date_claims,
  CAST(sum(CAST(data_quality_score AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS avg_quality_score,
  count(CASE WHEN provider_name = 'UNKNOWN' THEN 1 END) AS unknown_provider_claims,
  count(CASE WHEN member_id IS NULL THEN 1 END) AS null_member_claims
FROM silver
GROUP BY 1, 2
ORDER BY 1 DESC NULLS LAST, 2 DESC NULLS LAST"""),

    "q_member_activity" -> (ClaimsCte + """
SELECT member_id,
  count(*) AS total_claims,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS avg_amount,
  min(service_date) AS first_date,
  max(service_date) AS last_date,
  CAST(datediff('day', min(service_date), max(service_date)) AS INT) AS active_span_days,
  count(DISTINCT claim_amount_category) AS n_categories
FROM silver
WHERE member_id IS NOT NULL
GROUP BY member_id
HAVING count(*) >= 2
ORDER BY total_amount DESC, member_id"""),

    "q_recent_activity" -> """WITH mx AS (SELECT max(ts) AS max_ts FROM events),
ev AS (SELECT e.*, mx.max_ts FROM events e CROSS JOIN mx)
SELECT * FROM (
  SELECT 'Last 24 Hours' AS period, 1 AS period_order,
    count(*) AS n_events, count(DISTINCT user_id) AS n_users,
    count(DISTINCT event_type) AS n_event_types,
    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value,
    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS avg_value
  FROM ev WHERE ts >= max_ts - INTERVAL 24 HOUR
  UNION ALL
  SELECT 'Last 7 Days', 2, count(*), count(DISTINCT user_id),
    count(DISTINCT event_type),
    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE),
    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / count(*)
  FROM ev WHERE ts >= max_ts - INTERVAL 7 DAY
  UNION ALL
  SELECT 'Last 30 Days', 3, count(*), count(DISTINCT user_id),
    count(DISTINCT event_type),
    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE),
    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / count(*)
  FROM ev WHERE ts >= max_ts - INTERVAL 30 DAY
) t ORDER BY period_order""",

    "q_category_histogram" -> (ClaimsCte + """
SELECT claim_amount_category, cnt,
  round(CAST(cnt AS DOUBLE) * 100.0 / CAST(sum(cnt) OVER () AS DOUBLE), 2) AS pct
FROM (SELECT claim_amount_category, count(*) AS cnt FROM silver GROUP BY 1) a
ORDER BY cnt DESC, claim_amount_category"""),

    "q_quality_histogram" -> (ClaimsCte + """
SELECT data_quality_score, cnt,
  round(CAST(cnt AS DOUBLE) * 100.0 / CAST(sum(cnt) OVER () AS DOUBLE), 2) AS pct
FROM (SELECT data_quality_score, count(*) AS cnt FROM silver GROUP BY 1) a
ORDER BY data_quality_score DESC"""),

    "q_top_members" -> (ClaimsCte + """
SELECT member_id, count(*) AS n_claims
FROM silver WHERE member_id IS NOT NULL
GROUP BY member_id
ORDER BY n_claims DESC, member_id
LIMIT 5"""),

    "q_null_audit" -> (ClaimsCte + """
SELECT count(*) AS total_rows,
  count(CASE WHEN claim_id_raw IS NULL THEN 1 END) AS null_claim_id,
  count(CASE WHEN member_id_raw IS NULL THEN 1 END) AS null_member_id,
  count(CASE WHEN provider_raw IS NULL OR trim(provider_raw) = '' THEN 1 END) AS missing_provider,
  count(CASE WHEN amount_raw IS NULL THEN 1 END) AS null_amount,
  count(CASE WHEN amount_raw < 0 THEN 1 END) AS negative_amount,
  count(CASE WHEN COALESCE(CAST(try_strptime(service_date_raw, '%Y-%m-%d') AS DATE),
                           CAST(try_strptime(service_date_raw, '%m/%d/%Y') AS DATE),
                           CAST(try_strptime(service_date_raw, '%d/%m/%Y') AS DATE))
             IS NULL THEN 1 END) AS unparseable_date
FROM raw_claims"""),

    "q_table_stats" -> """SELECT
  count(*) AS total_orders,
  count(DISTINCT o_custkey) AS unique_customers,
  count(DISTINCT o_orderpriority) AS n_priorities,
  min(o_orderdate) AS first_order,
  max(o_orderdate) AS last_order,
  CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total_value,
  min(o_totalprice) AS min_price,
  max(o_totalprice) AS max_price
FROM orders""",

    "q_geo_rollup" -> """SELECT r_name, n_name,
  count(*) AS n_customers,
  CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS total_acctbal,
  CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS avg_acctbal,
  count(DISTINCT c_mktsegment) AS n_segments
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
ORDER BY 1, 2""",

    "q_fact_join" -> """SELECT o_orderpriority,
  count(*) AS n_lines,
  count(DISTINCT l_orderkey) AS n_orders,
  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY 1""",
  )
}
