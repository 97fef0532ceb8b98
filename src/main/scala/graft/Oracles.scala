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

  /** [[ClaimsCte]] parameterized for a SECOND batch through the same
    * cleanse chain: every CTE name suffixed (so it can sit next to the
    * unsuffixed chain in one WITH clause) and the source swapped from
    * `orders` to an arbitrary orders-shaped subquery. Used by the
    * upsert oracle, whose batch-2 claims are restated/shifted orders. */
  def claimsChainCtes(sfx: String, src: String): String =
    ClaimsCte.stripPrefix("WITH ")
      .replace("raw_claims", s"raw_claims$sfx")
      .replace("cleansed", s"cleansed$sfx")
      .replace("enriched", s"enriched$sfx")
      .replace("silver", s"silver$sfx")
      .replace("FROM orders", s"FROM ($src)")

  /** Shared CTE chain computing 48-bit simhash per doc (mirror of
    * TextFunctions nibble arithmetic — see q_dedup_simhash/q_simhash_pairs). */
  val SimhashCte: String = {
    val nibs = (0 until 12)
      .map(j => s"list_transform(h, x -> instr('0123456789abcdef', " +
        s"substr(x, ${j + 1}, 1)) - 1) AS n$j")
      .mkString(",\n    ")
    val bits = (0 until 48)
      .map(b => s"(CASE WHEN list_sum(list_transform(n${b / 4}, " +
        s"v -> ((v >> ${b % 4}) & 1) * 2 - 1)) >= 0 THEN ${1L << b} ELSE 0 END)")
      .mkString("\n    + ")
    s"""WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
shs AS (
  SELECT doc_id, list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
    i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM tok),
hs AS (SELECT doc_id, list_transform(s, x -> md5(x)) AS h FROM shs),
nib AS (
  SELECT doc_id,
    $nibs
  FROM hs),
sig AS (
  SELECT doc_id,
    $bits AS simhash
  FROM nib)"""
  }

  /** IVF probe/re-rank pipeline parameterized by `nprobe` —
    * `q_ann_ivf` IS ivfSql(2); `q_ivf_sweep` composes one per sweep
    * point against [[annBruteForceSql]]'s ground truth. */
  private def ivfSql(nprobe: Int): String = {
    val fp = "1048576.0"
    val cdims = (0 until 64).map { d =>
      s"CAST(sum(CAST(floor(CAST(embedding[${d + 1}] AS DOUBLE) * $fp) " +
        s"AS BIGINT)) AS DOUBLE) / $fp / count(*)"
    }.mkString(",\n    ")
    val probeCos =
      "list_sum(list_transform(list_zip(q.qv, c.centroid), " +
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
        "(sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        "sqrt(list_sum(list_transform(c.centroid, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    s"""WITH cent AS (
  SELECT label, [$cdims] AS centroid
  FROM embeddings GROUP BY label),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
probe AS (
  SELECT query_id, qv, label FROM (
    SELECT q.query_id, q.qv, c.label,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY $probeCos DESC, c.label) AS pr
    FROM q CROSS JOIN cent c) p
  WHERE pr <= $nprobe),
scored AS (
  SELECT p.query_id, e.vec_id, e.label,
    ${graft.functions.VectorFunctions.cosineSql("p.qv", "e.embedding")} AS cos_sim
  FROM probe p JOIN embeddings e
    ON e.label = p.label AND e.vec_id <> p.query_id)
SELECT query_id, vec_id, label, cos_sim, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, vec_id) AS rnk FROM scored) r
WHERE rnk <= 5 ORDER BY query_id, rnk"""
  }

  private val annBruteForceSql: String = """WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, e.vec_id, e.label,
    list_sum(list_transform(list_zip(q.qv, e.embedding),
        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, label, cos_sim, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, vec_id) AS rnk FROM scored) r
WHERE rnk <= 5 ORDER BY query_id, rnk"""

  // lazy: `base` is declared below (initialization order)
  lazy val all: Map[String, String] = base + ("q_pq_recall" -> {
    import graft.functions.VectorFunctions.l2sqSql
    // ADC recall vs the EXACT-L2 brute-force ground truth (ADC
    // approximates squared L2, so L2 is the ranking it is judged on)
    s"""WITH bf AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY ${l2sqSql("q.qv", "e.embedding")} ASC, e.vec_id) AS rnk
    FROM (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 5) q
    CROSS JOIN embeddings e
    WHERE e.vec_id <> q.query_id) x
  WHERE rnk <= 5),
pq AS (SELECT query_id, vec_id FROM (${base("q_ann_pq")}))
SELECT bf.query_id, count(pq.vec_id) AS n_hit,
  CAST(count(pq.vec_id) AS DOUBLE) / 5.0 AS recall
FROM bf LEFT JOIN pq
  ON pq.query_id = bf.query_id AND pq.vec_id = bf.vec_id
GROUP BY bf.query_id ORDER BY bf.query_id"""
  }) + ("q_ann_recall" ->
    // index-quality evaluation: recall@5 of the IVF index against the
    // brute-force ground truth, composed from the two oracle pipelines
    s"""WITH bf AS (${"\n"}SELECT * FROM (${base("q_ann_bruteforce")})),
ivf AS (SELECT * FROM (${base("q_ann_ivf")}))
SELECT bf.query_id, count(ivf.vec_id) AS n_hit,
  CAST(count(ivf.vec_id) AS DOUBLE) / 5.0 AS recall
FROM bf LEFT JOIN ivf
  ON bf.query_id = ivf.query_id AND bf.vec_id = ivf.vec_id
GROUP BY bf.query_id ORDER BY bf.query_id""")

  /** The change-feed oracle (batch AND streaming keys: the two
    * surfaces must agree row-for-row on the same window). */
  private lazy val changeFeedSql: String = {
      val movedSrc = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, CAST(o_orderdate + INTERVAL 40 DAY AS DATE) " +
        "AS o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-07-01' AND o_orderkey % 10 = 0"
      s"""$ClaimsCte,
${claimsChainCtes("_m", movedSrc)},
upd AS (
  SELECT claim_id, '20240102_000000' AS batch_id, claim_amount,
    service_year, service_month FROM silver_m),
merged AS (
  SELECT claim_id, batch_id, claim_amount, service_year, service_month
  FROM (SELECT *, row_number() OVER (PARTITION BY claim_id
          ORDER BY batch_id DESC, src DESC) AS rn
        FROM (
          SELECT claim_id, claim_amount, service_year, service_month,
            '20240101_000000' AS batch_id, 1 AS src FROM silver
          UNION ALL
          SELECT claim_id, claim_amount, service_year, service_month,
            batch_id, 0 AS src FROM upd) allv) z
  WHERE rn = 1)
SELECT claim_id, batch_id, claim_amount, service_year, service_month,
  _change_type FROM (
  SELECT *, 'insert' AS _change_type FROM upd
  WHERE claim_amount <= 300000.0 OR claim_amount IS NULL
  UNION ALL
  SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
    service_year, service_month, 'delete' AS _change_type FROM silver
  WHERE claim_id IN (SELECT claim_id FROM upd)
  UNION ALL
  SELECT *, 'delete' AS _change_type FROM merged
  WHERE claim_amount > 300000.0) f
ORDER BY claim_id, _change_type, batch_id"""
  }

  /** The source table's final content after the mergeMor upsert and
    * the >300k purge — the oracle for BOTH the MoR-composed stream
    * backfill (q_stream_cdc) and the replicated mirror
    * (q_stream_replicate). */
  private lazy val mergedMinusPurgeSql: String = {
    val movedSrc = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
      "o_totalprice, CAST(o_orderdate + INTERVAL 40 DAY AS DATE) " +
      "AS o_orderdate FROM orders " +
      "WHERE o_orderdate >= DATE '1997-07-01' AND o_orderkey % 10 = 0"
    s"""$ClaimsCte,
${claimsChainCtes("_m", movedSrc)},
allv AS (
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240101_000000' AS batch_id, 1 AS src FROM silver
  UNION ALL
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240102_000000' AS batch_id, 0 AS src FROM silver_m)
SELECT claim_id, batch_id, claim_amount, service_year, service_month
FROM (SELECT *, row_number() OVER (PARTITION BY claim_id
        ORDER BY batch_id DESC, src DESC) AS rn FROM allv) z
WHERE rn = 1 AND (claim_amount <= 300000.0 OR claim_amount IS NULL)
ORDER BY claim_id"""
  }

  private val base: Map[String, String] = Map(
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

    // sketch family (round-10): the sketches are engine-exact by
    // construction (md5-derived hashes, fixed-point register sums,
    // power-of-two bucket widths), so these mirrors hash-match
    "q_claims_summary_approx" -> {
      import graft.operators.SketchOps.kmvDistinctSql
      s"""WITH base AS (
  SELECT CAST(year(l_shipdate) AS INT) AS service_year,
    CAST(month(l_shipdate) AS INT) AS service_month,
    l_returnflag,
    CASE WHEN l_extendedprice = 0 THEN 'ZERO'
         WHEN l_extendedprice <= 1000 THEN 'LOW'
         WHEN l_extendedprice <= 10000 THEN 'MEDIUM'
         WHEN l_extendedprice <= 50000 THEN 'HIGH'
         ELSE 'VERY_HIGH' END AS amount_category,
    l_orderkey
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'),
counts AS (
  SELECT service_year, service_month, l_returnflag, amount_category,
    count(*) AS total_claims
  FROM base GROUP BY 1, 2, 3, 4),
kmv AS (${kmvDistinctSql("base",
        Seq("service_year", "service_month", "l_returnflag",
          "amount_category"), "l_orderkey")})
SELECT service_year, service_month, l_returnflag, amount_category,
  total_claims, kmv_est AS unique_orders_kmv
FROM counts JOIN kmv
  USING (service_year, service_month, l_returnflag, amount_category)
ORDER BY 1, 2, 3, 4"""
    },

    "q_approx_error" -> {
      import graft.operators.SketchOps.kmvDistinctSql
      s"""WITH base AS (
  SELECT CAST(year(l_shipdate) AS INT) AS service_year,
    CAST(month(l_shipdate) AS INT) AS service_month,
    l_returnflag,
    CASE WHEN l_extendedprice = 0 THEN 'ZERO'
         WHEN l_extendedprice <= 1000 THEN 'LOW'
         WHEN l_extendedprice <= 10000 THEN 'MEDIUM'
         WHEN l_extendedprice <= 50000 THEN 'HIGH'
         ELSE 'VERY_HIGH' END AS amount_category,
    l_orderkey
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'),
ex AS (
  SELECT service_year, service_month, l_returnflag, amount_category,
    count(DISTINCT l_orderkey) AS unique_orders_exact
  FROM base GROUP BY 1, 2, 3, 4),
kmv AS (${kmvDistinctSql("base",
        Seq("service_year", "service_month", "l_returnflag",
          "amount_category"), "l_orderkey")})
SELECT service_year, service_month, l_returnflag, amount_category,
  unique_orders_exact, kmv_est AS unique_orders_kmv,
  abs(kmv_est - CAST(unique_orders_exact AS DOUBLE)) /
    CAST(unique_orders_exact AS DOUBLE) AS kmv_rel_err
FROM ex JOIN kmv
  USING (service_year, service_month, l_returnflag, amount_category)
ORDER BY 1, 2, 3, 4"""
    },

    // monthly_trend's TWO distincts as independent KMV sketches
    "q_monthly_trend_approx" -> {
      import graft.operators.SketchOps.kmvDistinctSql
      val keys = Seq("service_year", "service_month")
      s"""WITH base AS (
  SELECT CAST(year(l_shipdate) AS INT) AS service_year,
    CAST(month(l_shipdate) AS INT) AS service_month,
    l_orderkey, l_suppkey
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'),
counts AS (
  SELECT service_year, service_month, count(*) AS total_claims
  FROM base GROUP BY 1, 2),
ko AS (${kmvDistinctSql("base", keys, "l_orderkey")}),
ks AS (${kmvDistinctSql("base", keys, "l_suppkey")})
SELECT service_year, service_month, total_claims,
  ko.kmv_est AS unique_orders_kmv, ks.kmv_est AS unique_suppliers_kmv
FROM counts
JOIN ko USING (service_year, service_month)
JOIN ks USING (service_year, service_month)
ORDER BY 1, 2"""
    },

    "q_hll_distinct" -> {
      import graft.operators.SketchOps.hllEstimateSql
      s"""WITH base AS (
  SELECT l_orderkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'),
est AS (${hllEstimateSql("base", Nil, "l_orderkey")}),
ex AS (SELECT count(DISTINCT l_orderkey) AS unique_orders_exact FROM base)
SELECT est.n_registers, est.n_zero_registers, est.hll_est,
  ex.unique_orders_exact,
  abs(est.hll_est - CAST(ex.unique_orders_exact AS DOUBLE)) /
    CAST(ex.unique_orders_exact AS DOUBLE) AS hll_rel_err
FROM est CROSS JOIN ex"""
    },

    "q_approx_quantiles" -> """WITH st AS (
  SELECT o_orderpriority, min(o_totalprice) AS gmin,
    max(o_totalprice) AS gmax, count(*) AS n_rows,
    (max(o_totalprice) - min(o_totalprice)) / 256 AS width
  FROM orders GROUP BY 1),
bkt AS (
  SELECT o.o_orderpriority,
    CASE WHEN s.width = 0 THEN 0
         ELSE CAST(least(255,
           floor((o.o_totalprice - s.gmin) / s.width)) AS INT) END AS __b,
    count(*) AS __bn
  FROM orders o JOIN st s USING (o_orderpriority) GROUP BY 1, 2),
cumb AS (
  SELECT b.o_orderpriority, b.__b, s.n_rows,
    sum(__bn) OVER (PARTITION BY b.o_orderpriority ORDER BY __b
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __cum
  FROM bkt b JOIN st s USING (o_orderpriority)),
hist AS (
  SELECT o_orderpriority,
    min(CASE WHEN __cum >= ceil(0.5 * CAST(n_rows AS DOUBLE))
      THEN __b END) AS b50,
    min(CASE WHEN __cum >= ceil(0.9 * CAST(n_rows AS DOUBLE))
      THEN __b END) AS b90,
    min(CASE WHEN __cum >= ceil(0.99 * CAST(n_rows AS DOUBLE))
      THEN __b END) AS b99
  FROM cumb GROUP BY 1),
cumv AS (
  SELECT v.o_orderpriority, v.o_totalprice, s.n_rows,
    sum(__vn) OVER (PARTITION BY v.o_orderpriority ORDER BY o_totalprice
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __cum
  FROM (SELECT o_orderpriority, o_totalprice, count(*) AS __vn
        FROM orders GROUP BY 1, 2) v
  JOIN st s USING (o_orderpriority)),
ex AS (
  SELECT o_orderpriority,
    min(CASE WHEN __cum >= ceil(0.5 * CAST(n_rows AS DOUBLE))
      THEN o_totalprice END) AS p50_exact,
    min(CASE WHEN __cum >= ceil(0.9 * CAST(n_rows AS DOUBLE))
      THEN o_totalprice END) AS p90_exact,
    min(CASE WHEN __cum >= ceil(0.99 * CAST(n_rows AS DOUBLE))
      THEN o_totalprice END) AS p99_exact
  FROM cumv GROUP BY 1)
SELECT s.o_orderpriority, s.n_rows, s.width AS max_abs_err,
  s.gmin + CAST(b50 AS DOUBLE) * s.width AS p50_est, p50_exact,
  s.gmin + CAST(b90 AS DOUBLE) * s.width AS p90_est, p90_exact,
  s.gmin + CAST(b99 AS DOUBLE) * s.width AS p99_est, p99_exact
FROM st s JOIN hist USING (o_orderpriority) JOIN ex USING (o_orderpriority)
ORDER BY 1""",

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
  CAST(count(CASE WHEN l_extendedprice > 10000 THEN 1 END) AS DOUBLE) * 100.0
        / CAST(count(*) AS DOUBLE) AS high_value_pct,
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

    // the e2e chain's gold rollup: the engine pays real CSV + bronze +
    // silver sinks and scans; the oracle replays the same lineage as
    // CTEs — value-equality proves every round-trip is exact
    "q_pipeline_e2e" -> (ClaimsCte + """
SELECT service_year, service_month, claim_amount_category,
  count(*) AS total_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  count(CASE WHEN data_quality_score < 1.0 THEN 1 END) AS n_flagged
FROM silver
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""),

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

    // CAST(ts AS TIMESTAMP) makes the oracle encoding-agnostic: it
    // floor-truncates a TIMESTAMP_NS fixture to microseconds (matching
    // Tables.events' ns-long branch) and is the identity on the current
    // TIMESTAMP_MICROS fixture — comparison stays exact either way.
    "q_recent_activity" -> """WITH ev0 AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events),
mx AS (SELECT max(ts) AS max_ts FROM ev0),
ev AS (SELECT e.*, mx.max_ts FROM ev0 e CROSS JOIN mx)
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

    // Spark's window(ts, '1 hour').start is epoch-aligned → equals
    // date_trunc('hour'); ts truncated to µs on both sides as usual.
    "q_event_windows" -> """SELECT
  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
  event_type,
  count(*) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2""",

    // as-of join mirrored as the same union-marker + running
    // last_value window (DuckDB's ASOF JOIN keyword leaves same-ts
    // reference ties unspecified; this form pins the max-event_id
    // tie-break the operator defines). The payload travels as ONE
    // struct so all ref_ columns come from the same reference row.
    // ts is cast to µs inside the CTE so window ORDER matches Spark's
    // µs-truncated timestamps even if two events share a microsecond.
    "q_asof_join" -> """WITH u AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 0 AS is_probe,
         struct_pack(r_ts := CAST(ts AS TIMESTAMP), r_id := event_id,
                     r_value := value) AS ref
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 1, NULL
  FROM events WHERE event_type = 'click'
), w AS (
  SELECT user_id, ts, event_id, is_probe,
    last_value(ref IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, is_probe, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM u)
SELECT event_id, user_id, ts,
  m.r_id AS ref_event_id, m.r_ts AS ref_ts, m.r_value AS ref_value
FROM w WHERE is_probe = 1 ORDER BY event_id""",

    // asofJoin with a 6-hour max-staleness tolerance: the window match
    // nulls out when older than the bound (post-window CASE)
    "q_asof_tolerance" -> """WITH u AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 0 AS is_probe,
         struct_pack(r_ts := CAST(ts AS TIMESTAMP), r_id := event_id,
                     r_value := value) AS ref
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 1, NULL
  FROM events WHERE event_type = 'click'
), w AS (
  SELECT user_id, ts, event_id, is_probe,
    last_value(ref IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, is_probe, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m0
  FROM u), t AS (
  SELECT *, CASE WHEN date_diff('microsecond', m0.r_ts, ts)
    <= 21600000000 THEN m0 END AS m
  FROM w WHERE is_probe = 1)
SELECT event_id, user_id, ts,
  m.r_id AS ref_event_id, m.r_ts AS ref_ts, m.r_value AS ref_value
FROM t ORDER BY event_id""",

    // exact per-lang token-count deciles by rank selection:
    // value at rank ceil(n·q/10) under the (n_tokens, doc_id) order
    "q_token_deciles" -> """WITH tk AS (
  SELECT lang, doc_id,
    len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents),
rn AS (
  SELECT lang, n_tokens,
    row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
    count(*) OVER (PARTITION BY lang) AS n
  FROM tk),
q(decile) AS (SELECT unnest(range(1, 10)))
SELECT r.lang, CAST(q.decile AS INT) AS decile, CAST(r.n_tokens AS INT) AS n_tokens
FROM rn r JOIN q ON r.rn = (r.n * q.decile + 9) // 10
ORDER BY r.lang, q.decile""",

    // PII-pattern audit; patterns restricted to the Java∩RE2 subset so
    // both engines count identical non-overlapping matches; fixture
    // scope carries known counts, corpus scope audits clean
    "q_pii_audit" -> """WITH fixture(doc_id, text) AS (VALUES
  (1000001, 'contact me at alice@example.com or bob.smith+tag@mail.example.org today'),
  (1000002, 'see https://example.com/a?b=1 and http://test.org/page plus 10.0.0.1'),
  (1000003, 'server 192.168.1.100 and 8.8.8.8 email root@localhost.localdomain')),
scoped AS (
  SELECT text, 'corpus' AS scope FROM documents
  UNION ALL
  SELECT text, 'fixture' FROM fixture),
counted AS (
  SELECT scope,
    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
    len(regexp_extract_all(text, 'https?://[^ ]+')) AS u,
    len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS i
  FROM scoped)
SELECT scope, count(*) AS n_docs,
  CAST(sum(e) AS BIGINT) AS emails,
  CAST(sum(u) AS BIGINT) AS urls,
  CAST(sum(i) AS BIGINT) AS ips,
  count(*) FILTER (WHERE e + u + i > 0) AS docs_flagged
FROM counted GROUP BY scope ORDER BY scope""",

    // strictly-ordered funnel: stage k's earliest event must follow
    // stage k-1's earliest qualifying event
    "q_event_funnel" -> """WITH s1 AS (
  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t
  FROM events e JOIN s1 ON s1.user_id = e.user_id
   AND CAST(e.ts AS TIMESTAMP) > s1.t
  WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t
  FROM events e JOIN s2 ON s2.user_id = e.user_id
   AND CAST(e.ts AS TIMESTAMP) > s2.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT CAST(1 AS INT) AS stage, 'view' AS event_type,
  (SELECT count(*) FROM s1) AS n_users
UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
ORDER BY stage""",

    // day-cohort weekly retention: integer day arithmetic only (no
    // engine week-start convention)
    "q_retention" -> """WITH act AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
  FROM events),
f AS (SELECT user_id, min(d) AS cohort_day FROM act GROUP BY user_id)
SELECT f.cohort_day,
  CAST(date_diff('day', f.cohort_day, a.d) // 7 AS INT) AS week_offset,
  count(DISTINCT a.user_id) AS n_users
FROM act a JOIN f ON f.user_id = a.user_id
GROUP BY f.cohort_day, week_offset
ORDER BY f.cohort_day, week_offset""",

    // chunk-level exact dedup: q_doc_chunks geometry, dedupExact rollup
    "q_chunk_dedup" -> """WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
nch AS (
  SELECT doc_id, t, greatest((len(t) - 10 + 39) // 40, 1) AS nc FROM tok),
ch AS (
  SELECT doc_id, t, unnest(range(0, nc)) AS chunk_idx FROM nch),
g AS (
  SELECT md5(array_to_string(t[chunk_idx*40+1 : chunk_idx*40+50], ' ')) AS h,
    count(*) AS copies
  FROM ch GROUP BY h)
SELECT count(*) AS distinct_chunks,
  CAST(sum(copies) AS BIGINT) AS total_chunks,
  count(*) FILTER (WHERE copies > 1) AS dup_groups,
  CAST(sum(copies) - count(*) AS BIGINT) AS redundant_chunks
FROM g""",

    // increment-vs-base dedup funnel: base = doc_id < 400, batch = the
    // rest plus a deterministic fixture (10 exact re-submissions, one
    // identical twin pair, 5 appended-token near-dups) so every counter
    // has nonzero ground truth; exact hashes anti-joined, then
    // base×new-only pairs through the capped inverted index
    "q_incremental_dedup" -> """WITH base AS (
  SELECT * FROM documents WHERE doc_id < 400),
fresh AS (
  SELECT doc_id, lang, source, text FROM documents WHERE doc_id >= 400
  UNION ALL
  SELECT doc_id + 1000000, lang, source, text
  FROM documents WHERE doc_id < 10
  UNION ALL
  SELECT CAST(1000100 AS BIGINT), 'en', 'fx',
    'incremental twin fixture document payload'
  UNION ALL
  SELECT CAST(1000101 AS BIGINT), 'en', 'fx',
    'incremental twin fixture document payload'
  UNION ALL
  SELECT doc_id + 2000000, lang, source, text || ' fxnd'
  FROM documents WHERE doc_id >= 20 AND doc_id < 25),
bh AS (
  SELECT DISTINCT md5(regexp_replace(lower(trim(nfc_normalize(text))), '\s+', ' ', 'g')) AS h
  FROM base),
fh AS (
  SELECT doc_id, lang, source, text,
    md5(regexp_replace(lower(trim(nfc_normalize(text))), '\s+', ' ', 'g')) AS h
  FROM fresh),
s1 AS (
  SELECT * FROM fh f
  WHERE NOT EXISTS (SELECT 1 FROM bh WHERE bh.h = f.h)),
reps AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY h),
s2 AS (SELECT f.* FROM s1 f JOIN reps r ON f.doc_id = r.doc_id),
tok AS (
  SELECT doc_id, lang, source,
    string_split_regex(trim(text), '\s+') AS t, FALSE AS is_new FROM base
  UNION ALL
  SELECT doc_id, lang, source,
    string_split_regex(trim(text), '\s+') AS t, TRUE FROM s2),
sh AS (
  SELECT doc_id, lang, source, is_new,
    list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM tok),
inv AS (
  SELECT doc_id, lang, source, is_new, len(s) AS n, unnest(s) AS g FROM sh),
kept AS (
  SELECT lang, source, g FROM inv GROUP BY lang, source, g
  HAVING count(*) > 1 AND count(*) <= 1000),
pr AS (
  SELECT b.doc_id AS base_id, f.doc_id AS new_id,
    b.n AS n_b, f.n AS n_f, count(*) AS inter
  FROM inv b
  JOIN kept k ON k.lang = b.lang AND k.source = b.source AND k.g = b.g
  JOIN inv f ON f.lang = b.lang AND f.source = b.source AND f.g = b.g
   AND NOT b.is_new AND f.is_new
  GROUP BY 1, 2, 3, 4),
nd AS (
  SELECT DISTINCT new_id FROM pr
  WHERE CAST(inter AS DOUBLE) / CAST(n_b + n_f - inter AS DOUBLE) >= 0.08)
SELECT
  (SELECT count(*) FROM fresh) AS n_new,
  (SELECT count(*) FROM fh f WHERE EXISTS (SELECT 1 FROM bh WHERE bh.h = f.h))
    AS exact_dup_vs_base,
  (SELECT count(*) FROM s1) - (SELECT count(*) FROM reps)
    AS exact_dup_within_new,
  (SELECT count(*) FROM nd) AS neardup_vs_base,
  (SELECT count(*) FROM reps) - (SELECT count(*) FROM nd) AS n_kept""",

    // intra-doc n-gram repetition: positional 2-/3-gram streams (NOT
    // the distinct shingle set), dup fraction per doc, fixed-point
    // exact means per lang (see q_text_quality)
    "q_repetition_audit" -> """WITH tok AS (
  SELECT lang, string_split_regex(trim(text), '\s+') AS t FROM documents),
g AS (
  SELECT lang,
    list_transform(range(0, greatest(len(t) - 2, 0) + 1),
      i -> array_to_string(t[i+1:i+2], ' ')) AS g2,
    list_transform(range(0, greatest(len(t) - 3, 0) + 1),
      i -> array_to_string(t[i+1:i+3], ' ')) AS g3
  FROM tok),
d AS (
  SELECT lang,
    CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
      / CAST(len(g2) AS DOUBLE) AS d2,
    CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
      / CAST(len(g3) AS DOUBLE) AS d3
  FROM g)
SELECT lang, count(*) AS n_docs,
  CAST(sum(CAST(floor(d2 * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
    / CAST(count(*) AS DOUBLE) AS avg_dup2gram,
  CAST(sum(CAST(floor(d3 * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
    / CAST(count(*) AS DOUBLE) AS avg_dup3gram,
  count(CASE WHEN d2 > 0.2 THEN 1 END) AS n_repetitive,
  max(d2) AS max_dup2gram
FROM d GROUP BY lang ORDER BY lang""",

    // deterministic train/val/test holdout: mod-100 md5 bucket of the
    // CANONICAL CONTENT HASH (train < 80, val < 90, test otherwise) —
    // identical content always co-splits regardless of doc_id
    "q_split_manifest" -> {
      import graft.functions.TextFunctions.hashBucket100Sql
      val hb = hashBucket100Sql(
        "md5(regexp_replace(lower(trim(nfc_normalize(text))), '\\s+', ' ', 'g'))")
      s"""SELECT split, lang, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM (
  SELECT lang, doc_id,
    CASE WHEN $hb < 80 THEN 'train'
         WHEN $hb < 90 THEN 'val' ELSE 'test' END AS split,
    len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents) x
GROUP BY split, lang ORDER BY split, lang"""
    },

    // gap sessionization: same lag + running-sum windows; sums cast
    // from DuckDB's HUGEINT back to BIGINT to match Spark's long
    "q_sessionize" -> """WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value
  FROM events
), b AS (
  SELECT *, CASE WHEN prev IS NULL
      OR date_diff('microsecond', prev, ts) > 1800000000 THEN 1 ELSE 0 END
      AS new_s
  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev FROM e)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM b)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
  count(*) AS n_events,
  min(ts) AS session_start, max(ts) AS session_end,
  date_diff('microsecond', min(ts), max(ts)) AS duration_us,
  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value,
  count(DISTINCT event_type) AS n_event_types
FROM s GROUP BY user_id, session_idx
ORDER BY user_id, session_idx""",

    // engagement rollup OVER the sessionization output (same CTEs as
    // q_sessionize, then one global aggregate)
    "q_session_stats" -> """WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value
  FROM events
), b AS (
  SELECT *, CASE WHEN prev IS NULL
      OR date_diff('microsecond', prev, ts) > 1800000000 THEN 1 ELSE 0 END
      AS new_s
  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev FROM e)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM b
), sess AS (
  SELECT user_id, session_idx, count(*) AS n_events,
    date_diff('microsecond', min(ts), max(ts)) AS duration_us
  FROM s GROUP BY user_id, session_idx)
SELECT count(*) AS n_sessions,
  count(DISTINCT user_id) AS n_users,
  CAST(sum(n_events) AS BIGINT) AS total_events,
  CAST(sum(n_events) AS DOUBLE) / CAST(count(*) AS DOUBLE)
    AS avg_events_per_session,
  CAST(sum(duration_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
    AS avg_duration_us,
  max(duration_us) AS max_duration_us,
  count(CASE WHEN n_events = 1 THEN 1 END) AS n_single_event,
  count(CASE WHEN duration_us >= 3600000000 THEN 1 END) AS n_over_hour
FROM sess""",

    // exact rank-selected deciles of per-user inter-arrival gaps per
    // event type (same rank equation as q_token_deciles)
    "q_interarrival_deciles" -> """WITH e AS (
  SELECT event_type, user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events),
g AS (
  SELECT event_type, user_id, event_id,
    date_diff('microsecond',
      lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id),
      ts) AS gap_us
  FROM e),
gg AS (SELECT event_type, gap_us, user_id, event_id
  FROM g WHERE gap_us IS NOT NULL),
r AS (
  SELECT event_type, gap_us,
    row_number() OVER (PARTITION BY event_type
      ORDER BY gap_us, user_id, event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM gg),
q(decile) AS (SELECT unnest(range(1, 10)))
SELECT r.event_type, CAST(q.decile AS INT) AS decile, r.gap_us
FROM r JOIN q ON r.rn = (r.n * q.decile + 9) // 10
ORDER BY r.event_type, q.decile""",

    "q_multimodal_meta" -> """SELECT source,
  count(*) AS n_docs,
  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
  count(DISTINCT md5(text)) AS distinct_payloads
FROM documents
GROUP BY source
ORDER BY source""",

    // generated from the SAME suite definition as the Spark plan
    // (graft.operators.DqEngine.silverSuite) — they cannot drift apart
    "q_dq_expectations" -> (ClaimsCte + """,
base AS (
  SELECT *, TIMESTAMP '2024-01-01 00:00:00' AS processing_timestamp
  FROM silver),
""" + graft.operators.DqEngine.oracleSelectSql()),

    "q_category_histogram" -> (ClaimsCte + """
SELECT claim_amount_category, cnt,
  CAST(cnt AS DOUBLE) * 100.0 / CAST(sum(cnt) OVER () AS DOUBLE) AS pct
FROM (SELECT claim_amount_category, count(*) AS cnt FROM silver GROUP BY 1) a
ORDER BY cnt DESC, claim_amount_category"""),

    "q_quality_histogram" -> (ClaimsCte + """
SELECT data_quality_score, cnt,
  CAST(cnt AS DOUBLE) * 100.0 / CAST(sum(cnt) OVER () AS DOUBLE) AS pct
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

    // IVF-PQ residual codes: coarse chain -> residual frame -> per-sub
    // residual PQ chains -> per-vector cell + codes + exact recon error
    "q_ivfpq_codes" ->
      s"""WITH $ivfPqCoarseCtes,
${(0 until 4).map(pqResidSubCtes).mkString(",\n")}
SELECT e0.vec_id, a.cell,
  e0.code AS code_0, e1.code AS code_1, e2.code AS code_2, e3.code AS code_3,
  e0.dist + e1.dist + e2.dist + e3.dist AS recon_l2sq
FROM r0enc e0
JOIN r1enc e1 ON e1.vec_id = e0.vec_id
JOIN r2enc e2 ON e2.vec_id = e0.vec_id
JOIN r3enc e3 ON e3.vec_id = e0.vec_id
JOIN cassign a ON a.vec_id = e0.vec_id
ORDER BY e0.vec_id""",

    // fused IVF-PQ ADC search: probe nprobe=2 coarse cells per query,
    // residual distance tables per (query, cell, sub) against the
    // residual codebooks, score only vectors assigned to probed cells
    "q_ivfpq_search" -> ivfPqSearchSql,

    // the split lifecycle's QUERY half searches the persisted parquet
    // model; doubles/ints round-trip parquet bit-exactly, so it is
    // row-identical to the self-contained search — same oracle
    "q_ivfpq_query" -> ivfPqSearchSql,

    // the split lifecycle's BUILD half returns the persisted-artifact
    // manifest; the oracle recomputes each component's cardinality
    // from the same training chains
    "q_ivfpq_build" ->
      s"""WITH $ivfPqCoarseCtes,
${(0 until 4).map(pqResidSubCtes).mkString(",\n")}
SELECT component, n_rows FROM (
  SELECT 'centroids' AS component, count(*) AS n_rows FROM cc2
  UNION ALL SELECT 'book_0', count(*) FROM r0c2
  UNION ALL SELECT 'book_1', count(*) FROM r1c2
  UNION ALL SELECT 'book_2', count(*) FROM r2c2
  UNION ALL SELECT 'book_3', count(*) FROM r3c2
  UNION ALL SELECT 'codes', count(*) FROM cassign) t
ORDER BY component""",

    // pivot = conditional aggregation written longhand (engine-neutral;
    // DuckDB's PIVOT syntax would also work but this form is exact)
    "q_segment_pivot" -> """SELECT r_name,
  count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
  count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS "BUILDING",
  count(*) FILTER (WHERE c_mktsegment = 'FURNITURE') AS "FURNITURE",
  count(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS "HOUSEHOLD",
  count(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS "MACHINERY"
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name""",

    // the unpivoted long form comes straight from GROUP BY over the
    // full (region x segment) domain — zero cells kept via the
    // region x segment cross join
    "q_region_unpivot" -> """WITH segs AS (
  SELECT unnest(['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD',
    'MACHINERY']) AS segment),
counts AS (
  SELECT r_name, c_mktsegment AS segment, count(*) AS n
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, c_mktsegment)
SELECT r.r_name, s.segment,
  COALESCE(c.n, 0) AS n_customers
FROM region r CROSS JOIN segs s
LEFT JOIN counts c ON c.r_name = r.r_name AND c.segment = s.segment
ORDER BY r.r_name, s.segment""",

    // ROLLUP subtotals over the geo hierarchy; grouping id
    // disambiguates subtotal NULLs; ordering coalesces names because
    // Spark sorts NULLS FIRST and DuckDB NULLS LAST
    "q_geo_cube" -> """SELECT r_name, n_name,
  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
  count(*) AS n_customers,
  CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY gid, COALESCE(r_name, ''), COALESCE(n_name, '')""",

    "q_fact_join" -> """SELECT o_orderpriority,
  count(*) AS n_lines,
  count(DISTINCT l_orderkey) AS n_orders,
  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY 1""",

    // TPC-H Q3 shape: segment-filtered customers x date-filtered
    // orders x shipdate-filtered lineitem, exact-decimal revenue,
    // deterministic top-10 (revenue DESC, order key)
    "q_shipping_priority" -> """SELECT l.l_orderkey, o.o_orderdate,
  o.o_orderpriority,
  CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
    AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10""",

    "q_token_stats" -> """SELECT lang,
  count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
  CAST(sum(n_nonspace) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE) AS avg_word_len,
  min(n_chars) AS min_chars,
  max(n_chars) AS max_chars
FROM (
  SELECT lang, n_chars,
    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
    length(regexp_replace(trim(text), '\s+', '', 'g')) AS n_nonspace
  FROM documents) t
GROUP BY lang ORDER BY lang""",

    "q_token_bpe" -> ("""SELECT lang,
  count(*) AS n_docs,
  CAST(sum(ws) AS BIGINT) AS total_ws_tokens,
  CAST(sum(bpe) AS BIGINT) AS total_bpe_tokens,
  CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE) AS fertility,
  max(bpe) AS max_bpe_tokens
FROM (
  SELECT lang,
    len(string_split_regex(trim(text), '\s+')) AS ws,
    len(regexp_extract_all(text, '""" +
      graft.functions.TextFunctions.BpePattern + """')) AS bpe
  FROM documents) t
GROUP BY lang ORDER BY lang"""),

    "q_lang_confusion" -> """SELECT lang, detected_lang, count(*) AS n_docs
FROM (
  SELECT lang,
    CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unknown'
         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         WHEN s_fr >= s_es THEN 'fr'
         ELSE 'es' END AS detected_lang
  FROM (
    SELECT lang,
      len(list_filter(t, x -> x IN ('the','a','of','and','is'))) AS s_en,
      len(list_filter(t, x -> x IN ('der','die','das','und','ist'))) AS s_de,
      len(list_filter(t, x -> x IN ('le','la','les','et','est'))) AS s_fr,
      len(list_filter(t, x -> x IN ('el','los','y','que','es'))) AS s_es
    FROM (SELECT lang, string_split_regex(trim(text), '\s+') AS t FROM documents) a
  ) b
) c GROUP BY 1, 2 ORDER BY 1, 2""",

    // mean via fixed-point floor(q·1e6) longs: q·1e6 and floor are single
    // IEEE ops (engine-exact) and the integer sum is order-independent —
    // avoids the double→DECIMAL rounding-rule divergence ADVICE.md r1
    // flagged for computed scores.
    "q_text_quality" -> """SELECT source,
  count(*) AS n_docs,
  CAST(sum(CAST(floor(q * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
    / CAST(count(*) AS DOUBLE) AS avg_quality,
  min(q) AS min_quality,
  max(q) AS max_quality,
  count(CASE WHEN q >= 0.8 THEN 1 END) AS high_quality_docs
FROM (
  SELECT source,
    least(CAST(n_tokens AS DOUBLE) / 100.0, CAST(1.0 AS DOUBLE)) * 0.4
        + (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
        + least(CAST(s_en AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, CAST(1.0 AS DOUBLE)) * 0.3 AS q
  FROM (
    SELECT source, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
      len(list_filter(t, x -> x IN ('the','a','of','and','is'))) AS s_en
    FROM (SELECT source, string_split_regex(trim(text), '\s+') AS t FROM documents) a
  ) b
) c GROUP BY source ORDER BY source""",

    "q_dedup_exact" -> """SELECT
  CAST(count(*) AS BIGINT) AS distinct_texts,
  CAST(sum(copies) AS BIGINT) AS total_docs,
  count(CASE WHEN copies > 1 THEN 1 END) AS dup_groups,
  CAST(sum(copies) - count(*) AS BIGINT) AS redundant_docs
FROM (
  SELECT md5(regexp_replace(lower(trim(nfc_normalize(text))), '\s+', ' ', 'g')) AS h,
    count(*) AS copies, min(doc_id) AS keep_id
  FROM documents GROUP BY 1) g""",

    // NFC-canonicalization probe: precomposed U+00E9 vs e + combining
    // U+0301 variants appended to real corpus text must collapse to ONE
    // content hash each (they differ as bytes, agree under NFC). A
    // missing nfc step would report dup_groups = 0.
    "q_dedup_unicode" -> {
      // suffixes built from explicit code points so no editor/tool can
      // silently re-normalize this source file
      val pre = "caf\u00e9"           // precomposed e-acute
      val comb = "cafe\u0301"         // e + combining acute
      s"""WITH v AS (
  SELECT doc_id, text || ' $pre' AS text FROM documents WHERE doc_id < 50
  UNION ALL
  SELECT doc_id + 1000000, text || ' $comb' FROM documents WHERE doc_id < 50),
g AS (
  SELECT md5(regexp_replace(lower(trim(nfc_normalize(text))), '\\s+', ' ', 'g')) AS h,
    count(*) AS copies, min(doc_id) AS keep_id
  FROM v GROUP BY 1)
SELECT
  CAST(count(*) AS BIGINT) AS distinct_texts,
  CAST(sum(copies) AS BIGINT) AS total_docs,
  count(CASE WHEN copies > 1 THEN 1 END) AS dup_groups,
  CAST(sum(copies) - count(*) AS BIGINT) AS redundant_docs
FROM g"""
    },

    // Gopher/C4-style quality-rule audit per source; every rule is a
    // per-row boolean, rollup is exact integer counting
    "q_quality_rules" -> """WITH staged AS (
  SELECT source,
    string_split_regex(trim(text), '\s+') AS t,
    length(regexp_replace(text, '\s+', '', 'g')) AS n_alpha,
    length(regexp_replace(text, '[A-Za-z0-9\s]+', '', 'g')) AS n_sym,
    list_transform(range(0, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
      i -> array_to_string((string_split_regex(trim(text), '\s+'))[i+1:i+2], ' ')) AS g2
  FROM documents),
flags AS (
  SELECT source,
    (len(t) < 10) AS r1,
    (CAST(n_alpha AS DOUBLE) / CAST(len(t) AS DOUBLE) < 3.0
      OR CAST(n_alpha AS DOUBLE) / CAST(len(t) AS DOUBLE) > 10.0) AS r2,
    (1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
      / CAST(greatest(len(t) - 1, 1) AS DOUBLE) > 0.2) AS r3,
    (len(list_filter(t, x -> list_contains(['the','a','of','and','is'], x))) = 0) AS r4,
    (CASE WHEN n_alpha = 0 THEN 0.0
          ELSE CAST(n_sym AS DOUBLE) / CAST(n_alpha AS DOUBLE) END > 0.1) AS r5
  FROM staged)
SELECT source, count(*) AS n_docs,
  count(CASE WHEN r1 THEN 1 END) AS r_too_short,
  count(CASE WHEN r2 THEN 1 END) AS r_word_len,
  count(CASE WHEN r3 THEN 1 END) AS r_repetition,
  count(CASE WHEN r4 THEN 1 END) AS r_no_stopword,
  count(CASE WHEN r5 THEN 1 END) AS r_symbol_heavy,
  count(CASE WHEN NOT (r1 OR r2 OR r3 OR r4 OR r5) THEN 1 END) AS n_pass
FROM flags GROUP BY source ORDER BY source""",

    // data-mix plan: scarcest target language saturates; realized kept
    // counts via the shared hash-bucket sampling key
    "q_data_mix" -> {
      import graft.functions.TextFunctions.hashBucket100Sql
      s"""WITH w(lang, weight) AS (VALUES
  ('en', CAST(0.4 AS DOUBLE)), ('de', CAST(0.25 AS DOUBLE)),
  ('fr', CAST(0.2 AS DOUBLE)), ('es', CAST(0.15 AS DOUBLE))),
cnt AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
counts AS (
  SELECT c.lang, c.n_docs, w.weight FROM cnt c JOIN w ON w.lang = c.lang),
sc AS (SELECT min(CAST(n_docs AS DOUBLE) / weight) AS s FROM counts),
plan AS (
  SELECT lang, n_docs, weight,
    CAST(least(floor(100.0 * s * weight / CAST(n_docs AS DOUBLE)), 100.0) AS INT)
      AS keep_pct
  FROM counts CROSS JOIN sc),
kept AS (
  SELECT d.lang, count(*) AS n_kept
  FROM documents d JOIN plan p ON p.lang = d.lang
  WHERE ${hashBucket100Sql("d.doc_id")} < p.keep_pct
  GROUP BY d.lang)
SELECT p.lang, p.n_docs, p.weight, p.keep_pct,
  coalesce(k.n_kept, 0) AS n_kept
FROM plan p LEFT JOIN kept k ON k.lang = p.lang
ORDER BY p.lang"""
    },

    // quota-driven mix execution: exactly floor(scale·weight) docs per
    // language by md5 hash-rank (dataMix's pct plan, made exact-count)
    "q_mix_sample" -> """WITH w(lang, weight) AS (VALUES
  ('en', CAST(0.4 AS DOUBLE)), ('de', CAST(0.25 AS DOUBLE)),
  ('fr', CAST(0.2 AS DOUBLE)), ('es', CAST(0.15 AS DOUBLE))),
cnt AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
counts AS (
  SELECT c.lang, c.n_docs, w.weight FROM cnt c JOIN w ON w.lang = c.lang),
sc AS (SELECT min(CAST(n_docs AS DOUBLE) / weight) AS s FROM counts),
q AS (
  SELECT lang,
    CAST(least(floor(s * weight), CAST(n_docs AS DOUBLE)) AS BIGINT) AS quota
  FROM counts CROSS JOIN sc),
rk AS (
  SELECT lang, doc_id,
    row_number() OVER (PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
  FROM documents)
SELECT r.lang, CAST(r.rank AS INT) AS rank, r.doc_id, q.quota
FROM rk r JOIN q ON q.lang = r.lang
WHERE r.rank <= q.quota
ORDER BY r.lang, r.rank""",

    // per-language top-20 token vocabulary, deterministic tie-break on
    // the token string
    // KMV set algebra: per event-type pair, union/intersection distinct-
    // user estimates from the k-min sketches next to the exact counts
    "q_user_overlap_kmv" -> {
      import graft.operators.SketchOps.hash60Sql
      val k = graft.operators.SketchOps.KmvK
      val two60 = "1.152921504606846976e18"
      val est = (held: String, kth: String) =>
        s"CASE WHEN $held < $k THEN CAST($held AS DOUBLE) ELSE " +
          s"${(k - 1).toDouble} / ((CAST($kth AS DOUBLE) + 1.0) / $two60) END"
      val pairs = Seq("click", "purchase", "view").combinations(2).toSeq
      val arms = pairs.zipWithIndex.map { case (Seq(a, b), i) =>
        (s"""u$i AS (
  SELECT __h,
    CASE WHEN sa.__ina IS NOT NULL THEN 1 ELSE 0 END AS ina,
    CASE WHEN sb.__inb IS NOT NULL THEN 1 ELSE 0 END AS inb
  FROM (SELECT __h, 1 AS __ina FROM sk WHERE event_type = '$a') sa
  FULL OUTER JOIN (SELECT __h, 1 AS __inb FROM sk
    WHERE event_type = '$b') sb USING (__h)),
k$i AS (SELECT * FROM (
  SELECT *, row_number() OVER (ORDER BY __h) AS rk FROM u$i) z
  WHERE rk <= $k),
g$i AS (SELECT count(*) AS held, max(__h) AS kth,
  sum(ina * inb) AS nboth FROM k$i),
ex$i AS (
  SELECT count(*) AS exact_union,
    count(CASE WHEN a.user_id IS NOT NULL AND b.user_id IS NOT NULL
      THEN 1 END) AS exact_inter
  FROM (SELECT DISTINCT user_id FROM events WHERE event_type = '$a') a
  FULL OUTER JOIN (SELECT DISTINCT user_id FROM events
    WHERE event_type = '$b') b ON a.user_id = b.user_id)""",
          s"""SELECT '$a' AS type_a, '$b' AS type_b, ex.exact_union,
  ${est("g.held", "g.kth")} AS union_kmv,
  ex.exact_inter,
  CASE WHEN g.held < $k THEN CAST(g.nboth AS DOUBLE)
       ELSE CAST(g.nboth AS DOUBLE) / ${k.toDouble} *
         (${(k - 1).toDouble} / ((CAST(g.kth AS DOUBLE) + 1.0) / $two60))
  END AS inter_kmv
FROM g$i g CROSS JOIN ex$i ex""")
      }
      s"""WITH dh AS (
  SELECT DISTINCT event_type, ${hash60Sql("user_id")} AS __h
  FROM events WHERE event_type IN ('click', 'purchase', 'view')),
sk AS (SELECT event_type, __h FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY __h)
    AS rk FROM dh) z WHERE rk <= $k),
${arms.map(_._1).mkString(",\n")}
SELECT * FROM (
${arms.map(_._2).mkString("\nUNION ALL\n")}
) out ORDER BY type_a, type_b"""
    },

    // Count-Min heavy hitters: d x w counter table from row-salted md5
    // hashes; per-language top-10 exact tokens with their min-of-d
    // estimates (cm_est >= exact always)
    "q_cm_heavy_hitters" -> {
      import graft.operators.SketchOps.{cmColSql, CmD}
      val sketchArms = (0 until CmD).map(j =>
        s"  SELECT lang, $j AS cm_row, ${cmColSql(j, "token")} AS cm_col" +
          " FROM tok").mkString("\n  UNION ALL\n")
      val coordArms = (0 until CmD).map(j =>
        s"  SELECT lang, token, exact_n, $j AS cm_row, " +
          s"${cmColSql(j, "token")} AS cm_col FROM top")
        .mkString("\n  UNION ALL\n")
      s"""WITH tok AS (
  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents),
sketch AS (
  SELECT lang, cm_row, cm_col, count(*) AS cm_count FROM (
$sketchArms
  ) a GROUP BY lang, cm_row, cm_col),
exact AS (
  SELECT lang, token, count(*) AS exact_n FROM tok GROUP BY lang, token),
top AS (
  SELECT lang, token, exact_n FROM (
    SELECT *, row_number() OVER (PARTITION BY lang
      ORDER BY exact_n DESC, token) AS rnk FROM exact) r
  WHERE rnk <= 10),
coords AS (
$coordArms
)
SELECT c.lang, c.token, c.exact_n, min(s.cm_count) AS cm_est,
  min(s.cm_count) - c.exact_n AS overestimate
FROM coords c
JOIN sketch s ON s.lang = c.lang AND s.cm_row = c.cm_row
  AND s.cm_col = c.cm_col
GROUP BY c.lang, c.token, c.exact_n
ORDER BY c.lang, c.exact_n DESC, c.token"""
    },

    "q_vocab_topk" -> """WITH tok AS (
  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM documents),
c AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token)
SELECT lang, token, cnt, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
    ORDER BY cnt DESC, token) AS rnk FROM c) r
WHERE rnk <= 20 ORDER BY lang, rnk""",

    // benchmark decontamination: corpus docs whose distinct word 5-grams
    // overlap the doc_id<20 "eval set" by >= 0.5
    "q_decontaminate" -> """WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(range(0, greatest(len(t) - 5, 0) + 1),
    i -> array_to_string(t[i+1:i+5], ' '))) AS s
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents) a),
bench AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id < 20),
corpus AS (SELECT doc_id, len(s) AS n_grams, s FROM sh WHERE doc_id >= 20),
hits AS (
  SELECT c.doc_id, count(*) AS n_hit
  FROM (SELECT doc_id, unnest(s) AS gram FROM corpus) c
  JOIN bench USING (gram)
  GROUP BY c.doc_id)
SELECT corpus.doc_id, CAST(corpus.n_grams AS INT) AS n_grams, h.n_hit,
  CAST(h.n_hit AS DOUBLE) / CAST(corpus.n_grams AS DOUBLE) AS overlap
FROM corpus JOIN hits h ON corpus.doc_id = h.doc_id
WHERE CAST(h.n_hit AS DOUBLE) / CAST(corpus.n_grams AS DOUBLE) >= 0.5
ORDER BY corpus.doc_id""",

    // inverted-index form with the maxDf=1000 posting cap mirrored:
    // shingles shared by more than 1000 docs in a block drop from
    // candidate generation; jaccard = kept-inter / (n_a + n_b - inter)
    "q_neardup_pairs" -> """WITH sh AS (
  SELECT doc_id, lang, source,
    list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM (SELECT doc_id, lang, source,
          string_split_regex(trim(text), '\s+') AS t FROM documents) a),
inv AS (
  SELECT doc_id, lang, source, len(s) AS n, unnest(s) AS g FROM sh),
kept AS (
  SELECT lang, source, g FROM inv GROUP BY lang, source, g
  HAVING count(*) > 1 AND count(*) <= 1000),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang, a.source,
    a.n AS n_a, b.n AS n_b, count(*) AS inter
  FROM inv a
  JOIN kept k ON k.lang = a.lang AND k.source = a.source AND k.g = a.g
  JOIN inv b ON b.lang = a.lang AND b.source = a.source AND b.g = a.g
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.lang, a.source, a.n, b.n)
SELECT doc_a, doc_b, lang, source,
  CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) AS jaccard
FROM pr
WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.08
ORDER BY doc_a, doc_b""",

    // Composed pipeline: exact dedup (keep min doc_id per normalized-text
    // hash) → near-dup removal on survivors (inverted-index-equivalent
    // blocked Jaccard; doc_b of every pair drops) → quality gate ≥ 0.5 →
    // per-(lang, source) stats. Mean quality via the fixed-point
    // floor(q·1e6) exact-long path (see q_text_quality).
    "q_corpus_clean" -> """WITH keep AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(regexp_replace(lower(trim(nfc_normalize(text))), '\s+', ' ', 'g'))),
base AS (
  SELECT d.doc_id, d.lang, d.source,
    string_split_regex(trim(d.text), '\s+') AS t
  FROM documents d JOIN keep k ON d.doc_id = k.doc_id),
sh AS (
  SELECT doc_id, lang, source, t,
    list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM base),
inv AS (
  SELECT doc_id, lang, source, len(s) AS n, unnest(s) AS g FROM sh),
kept AS (
  SELECT lang, source, g FROM inv GROUP BY lang, source, g
  HAVING count(*) > 1 AND count(*) <= 1000),
pairs AS (
  SELECT doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      a.n AS n_a, b.n AS n_b, count(*) AS inter
    FROM inv a
    JOIN kept k ON k.lang = a.lang AND k.source = a.source AND k.g = a.g
    JOIN inv b ON b.lang = a.lang AND b.source = a.source AND b.g = a.g
     AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.n, b.n) x
  WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.08),
clean AS (
  SELECT doc_id, lang, source, t,
    least(CAST(len(t) AS DOUBLE) / 100.0, CAST(1.0 AS DOUBLE)) * 0.4
      + (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.3
      + least(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','is'))) AS DOUBLE)
          / CAST(len(t) AS DOUBLE) * 5.0, CAST(1.0 AS DOUBLE)) * 0.3 AS q
  FROM sh
  WHERE doc_id NOT IN (SELECT doc_b FROM pairs))
SELECT lang, source,
  count(*) AS n_docs,
  CAST(sum(len(t)) AS BIGINT) AS total_tokens,
  CAST(sum(CAST(floor(q * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
    / CAST(count(*) AS DOUBLE) AS avg_quality,
  min(doc_id) AS min_doc_id,
  max(doc_id) AS max_doc_id
FROM clean WHERE q >= 0.5
GROUP BY lang, source ORDER BY lang, source""",

    // corpusClean + its drop/recall accounting from one pass: funnel
    // counters per (lang, source) (in → exact → neardup → quality →
    // kept), kept-corpus stats (same fixed-point mean as
    // q_corpus_clean), and the maxDf posting-cap audit per block.
    "q_corpus_audit" -> """WITH keep AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(regexp_replace(lower(trim(nfc_normalize(text))), '\s+', ' ', 'g'))),
base AS (
  SELECT d.doc_id, d.lang, d.source,
    string_split_regex(trim(d.text), '\s+') AS t
  FROM documents d JOIN keep k ON d.doc_id = k.doc_id),
sh AS (
  SELECT doc_id, lang, source, t,
    list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM base),
inv AS (
  SELECT doc_id, lang, source, len(s) AS n, unnest(s) AS g FROM sh),
posting AS (
  SELECT lang, source, g, count(*) AS df FROM inv GROUP BY lang, source, g),
audit AS (
  SELECT lang, source,
    count(*) AS posting_groups,
    count(*) FILTER (WHERE df > 1000) AS posting_groups_capped,
    CAST(coalesce(sum(df) FILTER (WHERE df > 1000), 0) AS BIGINT)
      AS posting_members_capped
  FROM posting GROUP BY lang, source),
kept AS (
  SELECT lang, source, g FROM posting WHERE df > 1 AND df <= 1000),
pairs AS (
  SELECT DISTINCT doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      a.n AS n_a, b.n AS n_b, count(*) AS inter
    FROM inv a
    JOIN kept k ON k.lang = a.lang AND k.source = a.source AND k.g = a.g
    JOIN inv b ON b.lang = a.lang AND b.source = a.source AND b.g = a.g
     AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.n, b.n) x
  WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.08),
scored AS (
  SELECT doc_id, lang, source, len(t) AS n_tokens,
    least(CAST(len(t) AS DOUBLE) / 100.0, CAST(1.0 AS DOUBLE)) * 0.4
      + (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.3
      + least(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','is'))) AS DOUBLE)
          / CAST(len(t) AS DOUBLE) * 5.0, CAST(1.0 AS DOUBLE)) * 0.3 AS q,
    doc_id IN (SELECT doc_b FROM pairs) AS is_nd
  FROM sh),
per_block AS (
  SELECT lang, source,
    count(*) AS n_survivors,
    count(*) FILTER (WHERE is_nd) AS n_neardup_dropped,
    count(*) FILTER (WHERE NOT is_nd AND q < 0.5) AS n_quality_dropped,
    count(*) FILTER (WHERE NOT is_nd AND q >= 0.5) AS n_kept,
    CAST(coalesce(sum(n_tokens) FILTER (WHERE NOT is_nd AND q >= 0.5), 0)
      AS BIGINT) AS kept_tokens,
    sum(CAST(floor(q * 1000000.0) AS BIGINT))
      FILTER (WHERE NOT is_nd AND q >= 0.5) AS qsum,
    min(doc_id) FILTER (WHERE NOT is_nd AND q >= 0.5) AS kept_min_doc_id,
    max(doc_id) FILTER (WHERE NOT is_nd AND q >= 0.5) AS kept_max_doc_id
  FROM scored GROUP BY lang, source),
in_counts AS (
  SELECT lang, source, count(*) AS n_docs_in FROM documents
  GROUP BY lang, source)
SELECT i.lang, i.source, i.n_docs_in,
  i.n_docs_in - coalesce(p.n_survivors, 0) AS n_exact_dropped,
  coalesce(p.n_neardup_dropped, 0) AS n_neardup_dropped,
  coalesce(p.n_quality_dropped, 0) AS n_quality_dropped,
  coalesce(p.n_kept, 0) AS n_kept,
  coalesce(p.kept_tokens, 0) AS kept_tokens,
  CASE WHEN p.n_kept > 0
    THEN CAST(p.qsum AS DOUBLE) / 1000000.0 / CAST(p.n_kept AS DOUBLE)
  END AS avg_quality,
  coalesce(a.posting_groups, 0) AS posting_groups,
  coalesce(a.posting_groups_capped, 0) AS posting_groups_capped,
  coalesce(a.posting_members_capped, 0) AS posting_members_capped,
  p.kept_min_doc_id, p.kept_max_doc_id
FROM in_counts i
LEFT JOIN per_block p ON p.lang = i.lang AND p.source = i.source
LEFT JOIN audit a ON a.lang = i.lang AND a.source = i.source
ORDER BY i.lang, i.source""",

    // end-to-end shard manifest: corpus_clean's cleaned docs →
    // doc_chunks' geometry → 32-bit md5 shard assignment mod 8
    "q_training_shards" -> {
      import graft.functions.TextFunctions.hashShardSql
      val shardExpr = hashShardSql(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)", 8)
      s"""WITH keep AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(regexp_replace(lower(trim(nfc_normalize(text))), '\\s+', ' ', 'g'))),
base AS (
  SELECT d.doc_id, d.lang, d.source,
    string_split_regex(trim(d.text), '\\s+') AS t
  FROM documents d JOIN keep k ON d.doc_id = k.doc_id),
sh AS (
  SELECT doc_id, lang, source, t,
    list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM base),
inv AS (
  SELECT doc_id, lang, source, len(s) AS n, unnest(s) AS g FROM sh),
kept AS (
  SELECT lang, source, g FROM inv GROUP BY lang, source, g
  HAVING count(*) > 1 AND count(*) <= 1000),
pairs AS (
  SELECT doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      a.n AS n_a, b.n AS n_b, count(*) AS inter
    FROM inv a
    JOIN kept k ON k.lang = a.lang AND k.source = a.source AND k.g = a.g
    JOIN inv b ON b.lang = a.lang AND b.source = a.source AND b.g = a.g
     AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.n, b.n) x
  WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.08),
clean AS (
  SELECT doc_id, t,
    least(CAST(len(t) AS DOUBLE) / 100.0, CAST(1.0 AS DOUBLE)) * 0.4
      + (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.3
      + least(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','is'))) AS DOUBLE)
          / CAST(len(t) AS DOUBLE) * 5.0, CAST(1.0 AS DOUBLE)) * 0.3 AS q
  FROM sh
  WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),
nch AS (
  SELECT doc_id, t, greatest((len(t) - 10 + 39) // 40, 1) AS nc
  FROM clean WHERE q >= 0.5),
ch AS (
  SELECT doc_id, t, unnest(range(0, nc)) AS chunk_idx FROM nch),
cc AS (
  SELECT doc_id, chunk_idx,
    len(t[chunk_idx*40+1 : chunk_idx*40+50]) AS n_chunk_tokens
  FROM ch),
sharded AS (
  SELECT doc_id, n_chunk_tokens,
    $shardExpr AS shard
  FROM cc)
SELECT shard, count(*) AS n_chunks,
  count(DISTINCT doc_id) AS n_docs,
  CAST(sum(n_chunk_tokens) AS BIGINT) AS total_tokens
FROM sharded GROUP BY shard ORDER BY shard"""
    },

    // Chunk count ⌈(n−overlap)/stride⌉ (min 1) in exact integer
    // arithmetic; slice clamps the tail on both engines.
    "q_doc_chunks" -> """WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
nch AS (
  SELECT doc_id, t,
    greatest((len(t) - 10 + 39) // 40, 1) AS nc
  FROM tok),
ch AS (
  SELECT doc_id, t, unnest(range(0, nc)) AS chunk_idx FROM nch)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
  CAST(len(t[chunk_idx*40+1 : chunk_idx*40+50]) AS INT) AS n_chunk_tokens,
  md5(array_to_string(t[chunk_idx*40+1 : chunk_idx*40+50], ' ')) AS chunk_hash
FROM ch ORDER BY doc_id, chunk_idx""",

    // The same instr-nibble construction as SimhashCte: first 4 hex
    // nibbles of md5(doc_id) → 16-bit value, mod 100, keep < pct.
    "q_doc_sample" -> s"""SELECT doc_id, lang, source FROM documents
WHERE ${graft.functions.TextFunctions.hashBucket100Sql("doc_id")} < 20 ORDER BY doc_id""",

    // containment = inter / min(n_a, n_b) over the same co-shingled
    // pair statistics as q_neardup_pairs — catches subset duplicates
    // whose Jaccard is diluted by the larger doc's union
    "q_containment" -> """WITH sh AS (
  SELECT doc_id, lang, source,
    list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM (SELECT doc_id, lang, source,
          string_split_regex(trim(text), '\s+') AS t FROM documents) a),
inv AS (
  SELECT doc_id, lang, source, len(s) AS n, unnest(s) AS g FROM sh),
kept AS (
  SELECT lang, source, g FROM inv GROUP BY lang, source, g
  HAVING count(*) > 1 AND count(*) <= 1000),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang, a.source,
    a.n AS n_a, b.n AS n_b, count(*) AS inter
  FROM inv a
  JOIN kept k ON k.lang = a.lang AND k.source = a.source AND k.g = a.g
  JOIN inv b ON b.lang = a.lang AND b.source = a.source AND b.g = a.g
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.lang, a.source, a.n, b.n)
SELECT doc_a, doc_b, lang, source,
  CAST(inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE) AS containment
FROM pr
WHERE CAST(inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE) >= 0.05
ORDER BY doc_a, doc_b""",

    // hash-rank stratified sample: md5 hex order is engine-identical
    "q_stratified_sample" -> """SELECT lang, source, CAST(rk AS INT) AS rank, doc_id FROM (
  SELECT lang, source, doc_id,
    row_number() OVER (PARTITION BY lang, source
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents) s
WHERE rk <= 3 ORDER BY lang, source, rank""",

    // tf·N/df with the log dropped: exact integer product + one IEEE
    // division — engine-exact where ln() is not; ranking unchanged
    "q_tfidf_terms" -> """WITH tok AS (
  SELECT doc_id, lang, source,
    unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM documents),
dt AS (
  SELECT lang, source, token, doc_id, count(*) AS c
  FROM tok GROUP BY lang, source, token, doc_id),
st AS (
  SELECT lang, source, token, CAST(sum(c) AS BIGINT) AS tf, count(*) AS df
  FROM dt GROUP BY lang, source, token),
nd AS (SELECT lang, source, count(*) AS n_docs FROM documents
  GROUP BY lang, source),
sc AS (
  SELECT st.lang, st.source, token, tf, df, n_docs,
    CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score
  FROM st JOIN nd ON nd.lang = st.lang AND nd.source = st.source),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY lang, source
    ORDER BY score DESC, token) AS rank FROM sc)
SELECT lang, source, CAST(rank AS INT) AS rank, token, tf, df, n_docs, score
FROM rk WHERE rank <= 3 ORDER BY lang, source, rank""",

    "q_embedding_norms" -> """SELECT vec_id, label,
  sqrt(list_sum(list_transform(embedding,
    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm
FROM embeddings ORDER BY vec_id""",

    // Same literal plane numerators (VectorFunctions.planeNumerator) and
    // same single IEEE division as the Spark plan → bit-identical buckets;
    // cosine matches via strict left-to-right list_sum accumulation.
    "q_ann_lsh" -> s"""WITH sig AS (
  SELECT vec_id, embedding,
    ${graft.functions.VectorFunctions.lshSignatureSql("embedding", 12, 64)} AS bucket
  FROM embeddings),
okb AS (
  SELECT bucket FROM sig GROUP BY bucket HAVING count(*) <= 10000)
SELECT id_a, id_b, cos_sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ${graft.functions.VectorFunctions.cosineSql("a.embedding", "b.embedding")} AS cos_sim
  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  JOIN okb ON okb.bucket = a.bucket) p
WHERE cos_sim >= 0.2 ORDER BY id_a, id_b""",

    // Centroid dims are fixed-point means (floor(x·2^20) exact long sums)
    // so the IVF index is bit-identical across engines; probe and rerank
    // cosines follow the usual left-to-right list_sum contract.
    // per-label squared-L2 spread around the same fixed-point centroid
    // as q_ann_ivf; mean via floor(d²·1e6) exact-long sum
    "q_cluster_tightness" -> {
      val fp = "1048576.0"
      val cdims = (0 until 64).map { d =>
        s"CAST(sum(CAST(floor(CAST(embedding[${d + 1}] AS DOUBLE) * $fp) " +
          s"AS BIGINT)) AS DOUBLE) / $fp / count(*)"
      }.mkString(",\n    ")
      s"""WITH cent AS (
  SELECT label, [$cdims] AS centroid
  FROM embeddings GROUP BY label),
d AS (
  SELECT e.label,
    ${graft.functions.VectorFunctions.l2sqSql("e.embedding", "c.centroid")} AS d2
  FROM embeddings e JOIN cent c ON c.label = e.label)
SELECT label, count(*) AS n_vecs,
  CAST(sum(CAST(floor(d2 * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
    / CAST(count(*) AS DOUBLE) AS avg_l2sq,
  min(d2) AS min_l2sq, max(d2) AS max_l2sq
FROM d GROUP BY label ORDER BY label"""
    },

    "q_ann_ivf" -> ivfSql(2),

    // IVF recall-vs-nprobe sweep: each sweep point joins its probe/
    // re-rank pipeline (ivfSql(np)) against the brute-force ground
    // truth and aggregates one recall row
    "q_ivf_sweep" -> Seq(1, 2, 3).map { np =>
      s"""SELECT CAST($np AS INT) AS nprobe,
  count(ivf.vec_id) AS n_hits,
  count(*) AS n_candidates,
  CAST(count(ivf.vec_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
FROM (${annBruteForceSql}) bf
LEFT JOIN (${ivfSql(np)}) ivf
  ON bf.query_id = ivf.query_id AND bf.vec_id = ivf.vec_id"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) s ORDER BY nprobe"),

    // Deterministic 2-iteration Lloyd's k-means (init = vec_id < 8 cast
    // to double, bit-exact l2² argmin with cell-id tiebreak, fixed-point
    // centroid means) unrolled as a CTE chain, then the IVF probe/rerank
    // of q_ann_ivf over the TRAINED cells. Training assigns only the
    // deterministic 25% hash-sample (mirrors kmeansCentroids trainPct);
    // the final `assign` covers the full corpus.
    "q_ann_ivf_trained" -> {
      import graft.functions.VectorFunctions.{cosineSql, l2sqSql}
      import graft.functions.TextFunctions.hashBucket100Sql
      val fp = "1048576.0"
      // the FROM relation is supplied by the enclosing CTE
      val cdims = (0 until 64).map { d =>
        s"CAST(sum(CAST(floor(CAST(embedding[${d + 1}] AS DOUBLE) * $fp) " +
          s"AS BIGINT)) AS DOUBLE) / $fp / count(*)"
      }.mkString(",\n    ")
      def asg(cent: String, src: String) =
        s"""SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY ${l2sqSql("e.embedding", "c.centroid")} ASC, c.cell) AS rn
    FROM $src e CROSS JOIN $cent c) a WHERE rn = 1"""
      s"""WITH samp AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE ${hashBucket100Sql("vec_id")} < 25),
cent0 AS (
  SELECT CAST(vec_id AS INT) AS cell,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM embeddings WHERE vec_id < 8),
asg1 AS (${asg("cent0", "samp")}),
cent1 AS (SELECT cell, [$cdims] AS centroid FROM asg1 GROUP BY cell),
asg2 AS (${asg("cent1", "samp")}),
cent2 AS (SELECT cell, [$cdims] AS centroid FROM asg2 GROUP BY cell),
assign AS (${asg("cent2", "embeddings")}),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
probe AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY ${l2sqSql("q.qv", "c.centroid")} ASC, c.cell) AS pr
    FROM q CROSS JOIN cent2 c) p
  WHERE pr <= 2),
scored AS (
  SELECT p.query_id, a.vec_id, a.cell,
    ${cosineSql("p.qv", "a.embedding")} AS cos_sim
  FROM probe p JOIN assign a
    ON a.cell = p.cell AND a.vec_id <> p.query_id)
SELECT query_id, vec_id, cell, cos_sim, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, vec_id) AS rnk FROM scored) r
WHERE rnk <= 5 ORDER BY query_id, rnk"""
    },

    // symmetric int8 quantization report; floor(x+0.5) instead of
    // round() (engine tie-handling differs), reconstruction error via
    // the shared bit-exact l2sq formulation
    "q_embed_quantize" -> {
      import graft.functions.VectorFunctions.l2sqSql
      s"""WITH s AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS maxabs
  FROM embeddings),
sc AS (
  SELECT vec_id, embedding,
    CASE WHEN maxabs = 0 THEN 1.0 ELSE 127.0 / maxabs END AS scale
  FROM s),
q AS (
  SELECT vec_id, embedding, scale,
    list_transform(embedding, v -> CAST(greatest(-127.0, least(127.0,
      floor(CAST(v AS DOUBLE) * scale + 0.5))) AS INT)) AS qv
  FROM sc)
SELECT vec_id, scale,
  CAST(list_min(qv) AS INT) AS q_min, CAST(list_max(qv) AS INT) AS q_max,
  ${l2sqSql("embedding", "list_transform(qv, v -> CAST(v AS DOUBLE) / scale)")} AS l2_err
FROM q ORDER BY vec_id"""
    },

    // per-label rollup of the int8 quantization report (same CTEs as
    // q_embed_quantize; fixed-point exact mean error)
    "q_quantize_error" -> {
      import graft.functions.VectorFunctions.l2sqSql
      s"""WITH s AS (
  SELECT label, embedding,
    list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS maxabs
  FROM embeddings),
sc AS (
  SELECT label, embedding,
    CASE WHEN maxabs = 0 THEN 1.0 ELSE 127.0 / maxabs END AS scale
  FROM s),
q AS (
  SELECT label, scale,
    ${l2sqSql("embedding",
        "list_transform(list_transform(embedding, v -> CAST(greatest(-127.0, least(127.0, floor(CAST(v AS DOUBLE) * scale + 0.5))) AS INT)), v -> CAST(v AS DOUBLE) / scale)")} AS l2_err
  FROM sc)
SELECT label, count(*) AS n_vecs,
  CAST(sum(CAST(floor(l2_err * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
    / CAST(count(*) AS DOUBLE) AS avg_l2_err,
  max(l2_err) AS max_l2_err,
  min(scale) AS min_scale, max(scale) AS max_scale,
  count(CASE WHEN l2_err > 0.01 THEN 1 END) AS n_coarse
FROM q GROUP BY label ORDER BY label"""
    },

    // cross-modal cluster composition: doc text signals joined onto
    // embedding cluster labels through the shared id space
    "q_cluster_profile" -> """WITH d AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t FROM documents),
qq AS (
  SELECT doc_id, lang, len(t) AS n_tokens,
    least(CAST(len(t) AS DOUBLE) / 100.0, CAST(1.0 AS DOUBLE)) * 0.4
      + (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.3
      + least(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','is'))) AS DOUBLE)
          / CAST(len(t) AS DOUBLE) * 5.0, CAST(1.0 AS DOUBLE)) * 0.3 AS q
  FROM d)
SELECT e.label, qq.lang, count(*) AS n_docs,
  CAST(sum(qq.n_tokens) AS BIGINT) AS total_tokens,
  CAST(sum(CAST(floor(qq.q * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
    / CAST(count(*) AS DOUBLE) AS avg_quality
FROM qq JOIN embeddings e ON e.vec_id = qq.doc_id
GROUP BY e.label, qq.lang
ORDER BY e.label, qq.lang""",

    // modality-overlap rollup: the q_neardup_pairs pair set full-outer
    // joined with the q_neardup_embedding pair set over the shared ids
    "q_modality_overlap" -> {
      import graft.functions.VectorFunctions.cosineSql
      s"""WITH sh AS (
  SELECT doc_id, lang, source,
    list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM (SELECT doc_id, lang, source,
          string_split_regex(trim(text), '\\s+') AS t FROM documents) a),
inv AS (
  SELECT doc_id, lang, source, len(s) AS n, unnest(s) AS g FROM sh),
kept AS (
  SELECT lang, source, g FROM inv GROUP BY lang, source, g
  HAVING count(*) > 1 AND count(*) <= 1000),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.n AS n_a, b.n AS n_b, count(*) AS inter
  FROM inv a
  JOIN kept k ON k.lang = a.lang AND k.source = a.source AND k.g = a.g
  JOIN inv b ON b.lang = a.lang AND b.source = a.source AND b.g = a.g
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.n, b.n),
tp AS (
  SELECT doc_a, doc_b FROM pr
  WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.08),
okl AS (SELECT label FROM embeddings GROUP BY label HAVING count(*) <= 10000),
ep AS (
  SELECT id_a AS doc_a, id_b AS doc_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      ${cosineSql("a.embedding", "b.embedding")} AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    JOIN okl ON okl.label = a.label) p
  WHERE cos_sim >= 0.3),
m AS (
  SELECT CASE WHEN t.doc_a IS NOT NULL AND e.doc_a IS NOT NULL THEN 'both'
              WHEN t.doc_a IS NOT NULL THEN 'text_only'
              ELSE 'embedding_only' END AS modality
  FROM tp t FULL OUTER JOIN ep e
    ON t.doc_a = e.doc_a AND t.doc_b = e.doc_b)
SELECT modality, count(*) AS n_pairs FROM m
GROUP BY modality ORDER BY modality"""
    },

    // threshold-sweep calibration over both modalities' scored
    // candidate pairs (loose-threshold variants of the q_modality_overlap
    // CTEs; 9-cell grid via conditional counts over one joined frame)
    "q_modality_sweep" -> {
      import graft.functions.VectorFunctions.cosineSql
      s"""WITH sh AS (
  SELECT doc_id, lang, source,
    list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM (SELECT doc_id, lang, source,
          string_split_regex(trim(text), '\\s+') AS t FROM documents) a),
inv AS (
  SELECT doc_id, lang, source, len(s) AS n, unnest(s) AS g FROM sh),
kept AS (
  SELECT lang, source, g FROM inv GROUP BY lang, source, g
  HAVING count(*) > 1 AND count(*) <= 1000),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.n AS n_a, b.n AS n_b, count(*) AS inter
  FROM inv a
  JOIN kept k ON k.lang = a.lang AND k.source = a.source AND k.g = a.g
  JOIN inv b ON b.lang = a.lang AND b.source = a.source AND b.g = a.g
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.n, b.n),
tp AS (
  SELECT doc_a, doc_b,
    CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) AS j
  FROM pr
  WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.02),
okl AS (SELECT label FROM embeddings GROUP BY label HAVING count(*) <= 10000),
ep AS (
  SELECT id_a AS doc_a, id_b AS doc_b, cos_sim AS c FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      ${cosineSql("a.embedding", "b.embedding")} AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    JOIN okl ON okl.label = a.label) p
  WHERE cos_sim >= 0.1),
pj AS (
  SELECT coalesce(t.j, 0.0) AS j, coalesce(e.c, 0.0) AS c
  FROM tp t FULL OUTER JOIN ep e
    ON t.doc_a = e.doc_a AND t.doc_b = e.doc_b),
grid(jt, ct) AS (VALUES (0.05, 0.3), (0.05, 0.5), (0.05, 0.7),
  (0.1, 0.3), (0.1, 0.5), (0.1, 0.7),
  (0.2, 0.3), (0.2, 0.5), (0.2, 0.7))
SELECT CAST(g.jt AS DOUBLE) AS j_threshold,
  CAST(g.ct AS DOUBLE) AS c_threshold,
  count(CASE WHEN p.j >= CAST(g.jt AS DOUBLE)
    AND p.c >= CAST(g.ct AS DOUBLE) THEN 1 END) AS n_both,
  count(CASE WHEN p.j >= CAST(g.jt AS DOUBLE)
    AND p.c < CAST(g.ct AS DOUBLE) THEN 1 END) AS n_text_only,
  count(CASE WHEN p.j < CAST(g.jt AS DOUBLE)
    AND p.c >= CAST(g.ct AS DOUBLE) THEN 1 END) AS n_embedding_only
FROM grid g CROSS JOIN pj p
GROUP BY g.jt, g.ct
ORDER BY j_threshold, c_threshold"""
    },

    // maxBlock=10000 mirror: labels with more members are excluded
    "q_neardup_embedding" -> s"""WITH okl AS (
  SELECT label FROM embeddings GROUP BY label HAVING count(*) <= 10000)
SELECT label, id_a, id_b, cos_sim FROM (
  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
    ${graft.functions.VectorFunctions.cosineSql("a.embedding", "b.embedding")} AS cos_sim
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  JOIN okl ON okl.label = a.label) p
WHERE cos_sim >= 0.3 ORDER BY id_a, id_b""",

    // cap-overflow audit: group sizes by the operators' exact capping
    // keys (posting lists, minhash/simhash band buckets over collapse
    // reps, embedding label blocks), summarized as drop counts at the
    // caps, over the clean corpus and the mass-near-dup fixture
    "q_dedup_overflow" -> {
      val comps = (0 until 12)
        .map(i => s"list_min(list_transform(s, x -> md5('$i:' || x)))")
        .mkString(",\n    ")
      val nibs = (0 until 12)
        .map(j => s"list_transform(h, x -> instr('0123456789abcdef', " +
          s"substr(x, ${j + 1}, 1)) - 1) AS n$j")
        .mkString(",\n      ")
      val bits = (0 until 48)
        .map(b => s"(CASE WHEN list_sum(list_transform(n${b / 4}, " +
          s"v -> ((v >> ${b % 4}) & 1) * 2 - 1)) >= 0 THEN ${1L << b} ELSE 0 END)")
        .mkString("\n      + ")
      def mbands(p: String) = (0 until 4).map { j =>
        s"SELECT $j AS band_idx, md5(ms[${3 * j + 1}] || '|' || " +
          s"ms[${3 * j + 2}] || '|' || ms[${3 * j + 3}]) AS band_val FROM ${p}msig"
      }.mkString("\n  UNION ALL\n  ")
      def scopeCtes(p: String) =
        s"""${p}tok AS (SELECT doc_id, lang, source, string_split_regex(trim(text), '\\s+') AS t FROM ${p}corpus),
${p}sh AS (SELECT doc_id, lang, source,
  list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
    i -> array_to_string(t[i+1:i+3], ' '))) AS s,
  md5(array_to_string(t, ' ')) AS tk FROM ${p}tok),
${p}reps AS (SELECT min(doc_id) AS doc_id FROM ${p}sh GROUP BY tk),
${p}msig AS (SELECT [$comps] AS ms FROM ${p}sh JOIN ${p}reps ON ${p}sh.doc_id = ${p}reps.doc_id),
${p}mbucket AS (SELECT band_idx, band_val, count(*) AS n FROM (
  ${mbands(p)}) b GROUP BY 1, 2),
${p}post AS (SELECT lang, source, shingle, count(*) AS n FROM (
  SELECT lang, source, unnest(s) AS shingle FROM ${p}sh) u GROUP BY 1, 2, 3),
${p}srep AS (SELECT DISTINCT simhash FROM (
  SELECT $bits AS simhash FROM (
    SELECT $nibs FROM (
      SELECT list_transform(s, x -> md5(x)) AS h FROM ${p}sh) hh) nn) ss),
${p}sbucket AS (SELECT band_idx, band_val, count(*) AS n FROM (
  SELECT 0 AS band_idx, (simhash >> 0) & 4095 AS band_val FROM ${p}srep
  UNION ALL SELECT 1, (simhash >> 12) & 4095 FROM ${p}srep
  UNION ALL SELECT 2, (simhash >> 24) & 4095 FROM ${p}srep
  UNION ALL SELECT 3, (simhash >> 36) & 4095 FROM ${p}srep) b GROUP BY 1, 2),
${p}block AS (SELECT label, count(*) AS n FROM ${p}emb GROUP BY 1)"""
      def summary(scope: String, p: String) = Seq(
        ("posting_df", 50, s"${p}post"),
        ("minhash_bucket", 20, s"${p}mbucket"),
        ("simhash_bucket", 20, s"${p}sbucket"),
        ("embedding_block", 80, s"${p}block")).map { case (m, cap, t) =>
        s"""SELECT '$m' AS mechanism, '$scope' AS scope, CAST($cap AS INT) AS cap,
  count(*) AS groups_total,
  count(*) FILTER (WHERE n > $cap) AS groups_dropped,
  CAST(COALESCE(SUM(n) FILTER (WHERE n > $cap), 0) AS BIGINT) AS members_dropped
FROM $t"""
      }.mkString("\nUNION ALL\n")
      s"""WITH ccorpus AS (
  SELECT doc_id, lang, source, text FROM documents),
mcorpus AS (
  SELECT doc_id, lang, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, 'xx', 'fx',
    'the quick brown fox jumps over the lazy dog variant ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id < 150),
cemb AS (SELECT vec_id, label FROM embeddings),
memb AS (
  SELECT vec_id, label FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, 'zz' FROM embeddings WHERE vec_id < 90),
${scopeCtes("c")},
${scopeCtes("m")}
SELECT * FROM (
${summary("clean", "c")}
UNION ALL
${summary("massdup", "m")}) z
ORDER BY mechanism, scope"""
    },

    "q_dedup_minhash" -> {
      val comps = (0 until 12)
        .map(i => s"list_min(list_transform(s, x -> md5('$i:' || x)))")
        .mkString(",\n    ")
      val bands = (0 until 4).map { j =>
        s"SELECT doc_id, $j AS band_idx, md5(ms[${3 * j + 1}] || '|' || " +
          s"ms[${3 * j + 2}] || '|' || ms[${3 * j + 3}]) AS band_val FROM sig"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
    i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM tok),
sig AS (
  SELECT doc_id, s, [$comps] AS ms FROM sh),
bands AS (
  $bands),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
   AND x.doc_id < y.doc_id)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b,
    CAST(len(list_filter(sa.s, x -> list_contains(sb.s, x))) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) AS jaccard
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.doc_a
  JOIN sh sb ON sb.doc_id = cand.doc_b) v
WHERE jaccard >= 0.05 ORDER BY doc_a, doc_b"""
    },

    // banding calibration: bands-matched count per candidate pair vs
    // exact Jaccard, rolled up per count (fixed-point exact mean)
    "q_lsh_calibration" -> {
      val comps = (0 until 12)
        .map(i => s"list_min(list_transform(s, x -> md5('$i:' || x)))")
        .mkString(",\n    ")
      val bands = (0 until 4).map { j =>
        s"SELECT doc_id, $j AS band_idx, md5(ms[${3 * j + 1}] || '|' || " +
          s"ms[${3 * j + 2}] || '|' || ms[${3 * j + 3}]) AS band_val FROM sig"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
    i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM tok),
sig AS (
  SELECT doc_id, s, [$comps] AS ms FROM sh),
bands AS (
  $bands),
cand AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS bands_matched
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
   AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
jc AS (
  SELECT bands_matched,
    CAST(len(list_filter(sa.s, e -> list_contains(sb.s, e))) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) AS j
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.doc_a
  JOIN sh sb ON sb.doc_id = cand.doc_b)
SELECT bands_matched, count(*) AS n_pairs,
  CAST(sum(CAST(floor(j * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
    / CAST(count(*) AS DOUBLE) AS avg_jaccard,
  min(j) AS min_jaccard, max(j) AS max_jaccard,
  count(CASE WHEN j >= 0.05 THEN 1 END) AS n_above_threshold
FROM jc GROUP BY bands_matched ORDER BY bands_matched"""
    },

    "q_dedup_simhash" -> (SimhashCte + """
SELECT doc_id, simhash FROM sig ORDER BY doc_id"""),

    "q_simhash_pairs" -> (SimhashCte + """,
band AS (
  SELECT doc_id, simhash, 0 AS band_idx, (simhash >> 0) & 4095 AS band_val FROM sig
  UNION ALL
  SELECT doc_id, simhash, 1, (simhash >> 12) & 4095 FROM sig
  UNION ALL
  SELECT doc_id, simhash, 2, (simhash >> 24) & 4095 FROM sig
  UNION ALL
  SELECT doc_id, simhash, 3, (simhash >> 36) & 4095 FROM sig),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
    CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
  FROM band x JOIN band y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
   AND x.doc_id < y.doc_id)
SELECT doc_a, doc_b, hamming FROM cand
WHERE hamming <= 12 ORDER BY doc_a, doc_b"""),

    // distance spectrum of the banded candidate pairs: q_simhash_pairs'
    // pair set rolled up per hamming value (each pair contributes its
    // two docs to the distinct-doc count)
    "q_hamming_histogram" -> (SimhashCte + """,
band AS (
  SELECT doc_id, simhash, 0 AS band_idx, (simhash >> 0) & 4095 AS band_val FROM sig
  UNION ALL
  SELECT doc_id, simhash, 1, (simhash >> 12) & 4095 FROM sig
  UNION ALL
  SELECT doc_id, simhash, 2, (simhash >> 24) & 4095 FROM sig
  UNION ALL
  SELECT doc_id, simhash, 3, (simhash >> 36) & 4095 FROM sig),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
    CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
  FROM band x JOIN band y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
   AND x.doc_id < y.doc_id),
p AS (SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 12),
d AS (
  SELECT hamming, doc_a AS doc FROM p
  UNION ALL
  SELECT hamming, doc_b FROM p)
SELECT hamming, CAST(count(*) // 2 AS BIGINT) AS n_pairs,
  count(DISTINCT doc) AS n_docs
FROM d GROUP BY hamming ORDER BY hamming"""),

    // connected components of the near-dup pair graph: the same pair
    // CTE as q_simhash_pairs, then min-reachable-id via a recursive
    // CTE (UNION dedup terminates it) — the declarative mirror of the
    // Spark side's min-label propagation loop
    "q_dup_components" -> (SimhashCte.replaceFirst("WITH tok",
      "WITH RECURSIVE tok") + """,
band AS (
  SELECT doc_id, simhash, 0 AS band_idx, (simhash >> 0) & 4095 AS band_val FROM sig
  UNION ALL
  SELECT doc_id, simhash, 1, (simhash >> 12) & 4095 FROM sig
  UNION ALL
  SELECT doc_id, simhash, 2, (simhash >> 24) & 4095 FROM sig
  UNION ALL
  SELECT doc_id, simhash, 3, (simhash >> 36) & 4095 FROM sig),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
    CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
  FROM band x JOIN band y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
   AND x.doc_id < y.doc_id),
pairs AS (SELECT doc_a, doc_b FROM cand WHERE hamming <= 12),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
reach(node, comp) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node),
cc AS (SELECT node, min(comp) AS component FROM reach GROUP BY node)
SELECT node AS doc_id, component,
  CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_n
FROM cc ORDER BY doc_id"""),

    "q_fingerprint" -> """WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
SELECT doc_id, list_min(list_transform(
  list_transform(range(0, greatest(len(t) - 5, 0) + 1),
    i -> array_to_string(t[i+1:i+5], ' ')),
  s -> md5(s))) AS fingerprint
FROM tok ORDER BY doc_id""",

    "q_ann_bruteforce" -> annBruteForceSql,

    // concatenate-and-chunk packing: per-shard token tape in doc_id
    // order, cut every 256 tokens; a doc belongs to the bin holding its
    // first token — the same window cumsum the Spark operator runs
    "q_pack_sequences" -> (s"""WITH toks AS (
  SELECT doc_id,
    ${graft.functions.TextFunctions.hashShardSql("doc_id", 8)} AS shard,
    CAST(len(string_split_regex(trim(text), '""" + """\s+""" + s"""')) AS BIGINT) AS n_tokens
  FROM documents),
cum AS (
  SELECT shard, doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM toks)
SELECT shard, CAST(start_tok // 256 AS BIGINT) AS bin,
  count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
  min(doc_id) AS first_doc,
  max(doc_id) AS last_doc
FROM cum GROUP BY shard, bin ORDER BY shard, bin"""),

    // cut manifest: one row per 256-token tape boundary falling strictly
    // inside a document — (which doc, token offset of the cut); DuckDB
    // range() is end-exclusive, hence the +1
    "q_pack_cuts" -> (s"""WITH toks AS (
  SELECT doc_id,
    ${graft.functions.TextFunctions.hashShardSql("doc_id", 8)} AS shard,
    CAST(len(string_split_regex(trim(text), '""" + """\s+""" + s"""')) AS BIGINT) AS n_tokens
  FROM documents),
cum AS (
  SELECT shard, doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM toks),
cuts AS (
  SELECT shard, doc_id, start_tok,
    unnest(range(CAST(start_tok // 256 + 1 AS BIGINT),
                 CAST((start_tok + n_tokens - 1) // 256 + 1 AS BIGINT))) AS boundary
  FROM cum)
SELECT shard, CAST(boundary AS BIGINT) AS bin, doc_id,
  CAST(boundary * 256 - start_tok AS BIGINT) AS cut_offset
FROM cuts ORDER BY shard, bin, doc_id"""),

    // purchases range-joined (BETWEEN) to click-derived sessions: the
    // session CTEs mirror q_sessionize restricted to clicks; DuckDB
    // plans the inequality join directly (IEJoin), the engine bucketizes
    "q_range_join" -> """WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events WHERE event_type = 'click'
), b AS (
  SELECT *, CASE WHEN prev IS NULL
      OR date_diff('microsecond', prev, ts) > 1800000000 THEN 1 ELSE 0 END
      AS new_s
  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev FROM e)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM b
), sess AS (
  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
    min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY user_id, session_idx
), p AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
  FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts, sess.session_idx,
  sess.session_start, sess.session_end, p.value
FROM p LEFT JOIN sess ON p.user_id = sess.user_id
  AND p.ts BETWEEN sess.session_start AND sess.session_end
ORDER BY p.event_id""",

    // click sessions × error sessions per user, overlap predicate
    // max(start) <= min(end); DuckDB plans the inequality pair directly,
    // the engine uses the exactly-once bucketized shape
    "q_session_overlap" -> """WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
  FROM events WHERE event_type IN ('click', 'error')
), b AS (
  SELECT *, CASE WHEN prev IS NULL
      OR date_diff('microsecond', prev, ts) > 1800000000 THEN 1 ELSE 0 END
      AS new_s
  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id, event_type
          ORDER BY ts, event_id) AS prev FROM e)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id, event_type
      ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM b
), sess AS (
  SELECT user_id, event_type, CAST(session_idx AS BIGINT) AS session_idx,
    min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY user_id, event_type, session_idx)
SELECT c.user_id,
  c.session_idx AS click_idx, x.session_idx AS err_idx,
  c.session_start AS click_start, c.session_end AS click_end,
  x.session_start AS err_start, x.session_end AS err_end,
  CASE WHEN x.session_idx IS NULL THEN NULL
       ELSE date_diff('microsecond',
         greatest(c.session_start, x.session_start),
         least(c.session_end, x.session_end)) END AS overlap_us
FROM (SELECT * FROM sess WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM sess WHERE event_type = 'error') x
  ON c.user_id = x.user_id
 AND greatest(c.session_start, x.session_start)
     <= least(c.session_end, x.session_end)
ORDER BY c.user_id, click_idx, err_idx""",

    // clean -> pack composition: the q_training_shards clean CTE chain
    // (exact dedup, near-dup removal, quality gate) feeding the
    // q_pack_sequences window cumsum
    "q_pack_clean" -> (s"""WITH keep AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(regexp_replace(lower(trim(nfc_normalize(text))), '""" + """\s+""" + s"""', ' ', 'g'))),
base AS (
  SELECT d.doc_id, d.lang, d.source,
    string_split_regex(trim(d.text), '""" + """\s+""" + s"""') AS t
  FROM documents d JOIN keep k ON d.doc_id = k.doc_id),
sh AS (
  SELECT doc_id, lang, source, t,
    list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM base),
inv AS (
  SELECT doc_id, lang, source, len(s) AS n, unnest(s) AS g FROM sh),
kept AS (
  SELECT lang, source, g FROM inv GROUP BY lang, source, g
  HAVING count(*) > 1 AND count(*) <= 1000),
pairs AS (
  SELECT doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      a.n AS n_a, b.n AS n_b, count(*) AS inter
    FROM inv a
    JOIN kept k ON k.lang = a.lang AND k.source = a.source AND k.g = a.g
    JOIN inv b ON b.lang = a.lang AND b.source = a.source AND b.g = a.g
     AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.n, b.n) x
  WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) >= 0.08),
clean AS (
  SELECT doc_id, t,
    least(CAST(len(t) AS DOUBLE) / 100.0, CAST(1.0 AS DOUBLE)) * 0.4
      + (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.3
      + least(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','is'))) AS DOUBLE)
          / CAST(len(t) AS DOUBLE) * 5.0, CAST(1.0 AS DOUBLE)) * 0.3 AS q
  FROM sh
  WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),
toks AS (
  SELECT doc_id,
    ${graft.functions.TextFunctions.hashShardSql("doc_id", 8)} AS shard,
    CAST(len(t) AS BIGINT) AS n_tokens
  FROM clean WHERE q >= 0.5),
cum AS (
  SELECT shard, doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM toks)
SELECT shard, CAST(start_tok // 256 AS BIGINT) AS bin,
  count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
  min(doc_id) AS first_doc,
  max(doc_id) AS last_doc
FROM cum GROUP BY shard, bin ORDER BY shard, bin"""),

    // per-user union length of all per-(user, type) gap sessions: the
    // same window sweep the engine runs (running max end, new-segment
    // flag, segment cumsum, per-segment span, per-user rollup)
    "q_active_time" -> """WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events
), b AS (
  SELECT *, CASE WHEN prev IS NULL
      OR date_diff('microsecond', prev, ts) > 1800000000 THEN 1 ELSE 0 END
      AS new_s
  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id, event_type
          ORDER BY ts, event_id) AS prev FROM e)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id, event_type
      ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM b
), iv AS (
  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY user_id, event_type, session_idx
), m AS (
  SELECT user_id, session_start, session_end,
    max(epoch_us(session_end)) OVER (PARTITION BY user_id
      ORDER BY session_start, session_end
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
), mk AS (
  SELECT *, CASE WHEN prev_max IS NULL
      OR epoch_us(session_start) > prev_max THEN 1 ELSE 0 END AS new_seg
  FROM m
), sg AS (
  SELECT *, sum(new_seg) OVER (PARTITION BY user_id
      ORDER BY session_start, session_end
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM mk
), per AS (
  SELECT user_id, seg, count(*) AS n_iv,
    min(epoch_us(session_start)) AS s, max(epoch_us(session_end)) AS e
  FROM sg GROUP BY user_id, seg)
SELECT user_id, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
  count(*) AS n_segments, CAST(sum(e - s) AS BIGINT) AS covered_us
FROM per GROUP BY user_id ORDER BY user_id""",

    // replication audit for the bucketized temporal joins: per click
    // session, buckets = end//bUs - start//bUs + 1 at bucketSec=600;
    // counters split at maxBuckets=2 (the deliberately tight audit
    // operating point — both sides nonzero at fixture scale)
    "q_bucket_audit" -> """WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events WHERE event_type = 'click'
), b AS (
  SELECT *, CASE WHEN prev IS NULL
      OR date_diff('microsecond', prev, ts) > 1800000000 THEN 1 ELSE 0 END
      AS new_s
  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev FROM e)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM b
), sess AS (
  SELECT user_id, session_idx, min(ts) AS st, max(ts) AS en
  FROM s GROUP BY user_id, session_idx
), nb AS (
  SELECT epoch_us(en) // 600000000 - epoch_us(st) // 600000000 + 1 AS n
  FROM sess)
SELECT count(*) AS n_intervals,
  count(*) FILTER (WHERE n > 2) AS n_over_cap,
  CAST(max(n) AS BIGINT) AS max_buckets,
  CAST(sum(CASE WHEN n <= 2 THEN n ELSE 0 END) AS BIGINT) AS replicated_rows,
  CAST(sum(CASE WHEN n > 2 THEN n ELSE 0 END) AS BIGINT) AS over_cap_buckets
FROM nb""",

    // cohort triangle: q_retention's cells + per-cohort size + rate
    // (one double division of two exact longs, order-independent)
    "q_retention_matrix" -> """WITH act AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
  FROM events),
f AS (SELECT user_id, min(d) AS cohort_day FROM act GROUP BY user_id),
sz AS (SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY cohort_day),
cells AS (
  SELECT f.cohort_day,
    CAST(date_diff('day', f.cohort_day, a.d) // 7 AS INT) AS week_offset,
    count(DISTINCT a.user_id) AS n_users
  FROM act a JOIN f ON f.user_id = a.user_id
  GROUP BY f.cohort_day, week_offset)
SELECT c.cohort_day, c.week_offset, c.n_users, s.cohort_size,
  CAST(c.n_users AS DOUBLE) * 100.0 / CAST(s.cohort_size AS DOUBLE)
    AS retention_pct
FROM cells c JOIN sz s ON s.cohort_day = c.cohort_day
ORDER BY c.cohort_day, c.week_offset""",

    // forward as-of: the q_asof_join window mirrored (ts DESC, ties to
    // the SMALLEST ref id — event_id DESC makes it the last encountered)
    "q_asof_forward" -> """WITH u AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 0 AS is_probe,
         struct_pack(r_ts := CAST(ts AS TIMESTAMP), r_id := event_id,
                     r_value := value) AS ref
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 1, NULL
  FROM events WHERE event_type = 'click'
), w AS (
  SELECT user_id, ts, event_id, is_probe,
    last_value(ref IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts DESC, is_probe, event_id DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM u)
SELECT event_id, user_id, ts,
  m.r_id AS ref_event_id, m.r_ts AS ref_ts, m.r_value AS ref_value
FROM w WHERE is_probe = 1 ORDER BY event_id""",

    // nearest as-of: both windows over one pass; smaller absolute gap
    // wins, equal gaps resolve backward
    "q_asof_nearest" -> """WITH u AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 0 AS is_probe,
         struct_pack(r_ts := CAST(ts AS TIMESTAMP), r_id := event_id,
                     r_value := value) AS ref
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 1, NULL
  FROM events WHERE event_type = 'click'
), w AS (
  SELECT user_id, ts, event_id, is_probe,
    last_value(ref IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, is_probe, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mb,
    last_value(ref IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts DESC, is_probe, event_id DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mf
  FROM u
), sel AS (
  SELECT *, CASE
    WHEN mb IS NULL THEN mf
    WHEN mf IS NULL THEN mb
    WHEN epoch_us(mf.r_ts) - epoch_us(ts) < epoch_us(ts) - epoch_us(mb.r_ts)
      THEN mf
    ELSE mb END AS m
  FROM w)
SELECT event_id, user_id, ts,
  m.r_id AS ref_event_id, m.r_ts AS ref_ts, m.r_value AS ref_value
FROM sel WHERE is_probe = 1 ORDER BY event_id""",

    // idle-gap complement of q_active_time: same sweep to the per-
    // segment rows, then lag gaps per user (span = covered + idle)
    "q_idle_gaps" -> """WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events
), b AS (
  SELECT *, CASE WHEN prev IS NULL
      OR date_diff('microsecond', prev, ts) > 1800000000 THEN 1 ELSE 0 END
      AS new_s
  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id, event_type
          ORDER BY ts, event_id) AS prev FROM e)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id, event_type
      ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM b
), iv AS (
  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY user_id, event_type, session_idx
), m AS (
  SELECT user_id, session_start, session_end,
    max(epoch_us(session_end)) OVER (PARTITION BY user_id
      ORDER BY session_start, session_end
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
), mk AS (
  SELECT *, CASE WHEN prev_max IS NULL
      OR epoch_us(session_start) > prev_max THEN 1 ELSE 0 END AS new_seg
  FROM m
), sg AS (
  SELECT *, sum(new_seg) OVER (PARTITION BY user_id
      ORDER BY session_start, session_end
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM mk
), per AS (
  SELECT user_id, seg,
    min(epoch_us(session_start)) AS s, max(epoch_us(session_end)) AS e
  FROM sg GROUP BY user_id, seg
), g AS (
  SELECT user_id, s, e,
    s - lag(e) OVER (PARTITION BY user_id ORDER BY s, e) AS gap
  FROM per)
SELECT user_id,
  count(*) FILTER (WHERE gap IS NOT NULL) AS n_gaps,
  CAST(COALESCE(sum(gap), 0) AS BIGINT) AS idle_us,
  CAST(COALESCE(max(gap), 0) AS BIGINT) AS max_gap_us,
  CAST(max(e) - min(s) AS BIGINT) AS span_us
FROM g GROUP BY user_id ORDER BY user_id""",

    // product quantization: per 16-dim subspace, the SAME deterministic
    // 2-iteration fixed-point Lloyd's as q_ann_ivf_trained (init =
    // subvectors of vec_id < 8, 25% hash sample, argmin tie to lowest
    // code), then every vector encoded and the per-sub distances summed
    // left-to-right
    "q_pq_codes" ->
      s"""WITH ${(0 until 4).map(pqSubCtes).mkString(",\n")}
SELECT e0.vec_id,
  e0.code AS code_0, e1.code AS code_1, e2.code AS code_2, e3.code AS code_3,
  e0.dist + e1.dist + e2.dist + e3.dist AS recon_l2sq
FROM s0enc e0
JOIN s1enc e1 ON e1.vec_id = e0.vec_id
JOIN s2enc e2 ON e2.vec_id = e0.vec_id
JOIN s3enc e3 ON e3.vec_id = e0.vec_id
ORDER BY e0.vec_id""",

    // ADC search over the PQ codes: per (query, sub) a distance table
    // against the trained centroids; each corpus vector scores as the
    // left-to-right sum of its codes' table entries
    "q_ann_pq" -> {
      import graft.functions.VectorFunctions.l2sqSql
      val dts = (0 until 4).map { s =>
        val o = s * 16
        val qsv = s"list_transform(embedding[${o + 1}:${o + 16}], " +
          "x -> CAST(x AS DOUBLE))"
        s"""q$s AS (
  SELECT vec_id AS query_id, $qsv AS qsv FROM embeddings WHERE vec_id < 5),
dt$s AS (
  SELECT q.query_id, c.code, ${l2sqSql("q.qsv", "c.centroid")} AS d
  FROM q$s q CROSS JOIN s${s}c2 c)"""
      }.mkString(",\n")
      s"""WITH ${(0 until 4).map(pqSubCtes).mkString(",\n")},
$dts,
scored AS (
  SELECT d0.query_id, e0.vec_id,
    d0.d + d1.d + d2.d + d3.d AS adc_dist
  FROM s0enc e0
  JOIN s1enc e1 ON e1.vec_id = e0.vec_id
  JOIN s2enc e2 ON e2.vec_id = e0.vec_id
  JOIN s3enc e3 ON e3.vec_id = e0.vec_id
  JOIN dt0 d0 ON d0.code = e0.code
  JOIN dt1 d1 ON d1.code = e1.code AND d1.query_id = d0.query_id
  JOIN dt2 d2 ON d2.code = e2.code AND d2.query_id = d0.query_id
  JOIN dt3 d3 ON d3.code = e3.code AND d3.query_id = d0.query_id
  WHERE e0.vec_id <> d0.query_id)
SELECT query_id, vec_id, adc_dist, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY adc_dist ASC, vec_id) AS rnk FROM scored) r
WHERE rnk <= 5 ORDER BY query_id, rnk"""
    },

    // persisted sketch lifecycle, build side: manifest row counts of
    // the written register/counter tables, recomputed from raw by the
    // oracle (distinct occupied (year,month,bucket) / (lang,row,col))
    "q_sketch_build" -> {
      import graft.operators.SketchOps.{cmColSql, hash60Sql, hllRankSql, CmD, HllM}
      val sketchArms = (0 until CmD).map(j =>
        s"  SELECT lang, $j AS cm_row, ${cmColSql(j, "token")} AS cm_col" +
          " FROM tok").mkString("\n  UNION ALL\n")
      s"""WITH base AS (
  SELECT CAST(year(l_shipdate) AS INT) AS service_year,
    CAST(month(l_shipdate) AS INT) AS service_month, l_orderkey
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'),
regs AS (
  SELECT service_year, service_month, __bucket, max(__rank) AS __m FROM (
    SELECT service_year, service_month,
      CAST(__h % $HllM AS INT) AS __bucket,
      ${hllRankSql("(__h >> 9)")} AS __rank
    FROM (SELECT service_year, service_month,
            ${hash60Sql("l_orderkey")} AS __h FROM base
          WHERE l_orderkey IS NOT NULL) h0
  ) h1 GROUP BY service_year, service_month, __bucket),
tok AS (
  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents),
sketch AS (
  SELECT lang, cm_row, cm_col, count(*) AS cm_count FROM (
$sketchArms
  ) a GROUP BY lang, cm_row, cm_col)
SELECT component, n_rows FROM (
  SELECT 'cm_tokens_lang' AS component, CAST(count(*) AS BIGINT) AS n_rows
  FROM sketch
  UNION ALL
  SELECT 'hll_orders_monthly', CAST(count(*) AS BIGINT) FROM regs
) m ORDER BY component"""
    },

    // persisted sketch lifecycle, query side: per-year estimates served
    // from the persisted MONTHLY registers merged by max; the oracle
    // computes the same estimates from raw — equality proves merge +
    // parquet round-trip are lossless
    "q_sketch_query" -> {
      import graft.operators.SketchOps.hllEstimateSql
      s"""WITH base AS (
  SELECT CAST(year(l_shipdate) AS INT) AS service_year, l_orderkey
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00')
${hllEstimateSql("base", Seq("service_year"), "l_orderkey")}
ORDER BY service_year"""
    },

    // persisted sketch lifecycle, probe side: fixed-token Count-Min
    // lookups against every language, from the persisted counters only;
    // oracle recomputes the counters from the raw corpus
    "q_sketch_probe" -> {
      import graft.operators.SketchOps.{cmColSql, CmD}
      val probeTokens = Seq("data", "de", "the")
      val sketchArms = (0 until CmD).map(j =>
        s"  SELECT lang, $j AS cm_row, ${cmColSql(j, "token")} AS cm_col" +
          " FROM tok").mkString("\n  UNION ALL\n")
      val coordArms = (0 until CmD).map(j =>
        s"  SELECT lang, token, $j AS cm_row, " +
          s"${cmColSql(j, "token")} AS cm_col FROM langs CROSS JOIN probes")
        .mkString("\n  UNION ALL\n")
      s"""WITH tok AS (
  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents),
sketch AS (
  SELECT lang, cm_row, cm_col, count(*) AS cm_count FROM (
$sketchArms
  ) a GROUP BY lang, cm_row, cm_col),
langs AS (SELECT DISTINCT lang FROM tok),
probes AS (SELECT unnest([${probeTokens.map("'" + _ + "'").mkString(", ")}]) AS token),
coords AS (
$coordArms
)
SELECT c.lang, c.token, min(COALESCE(s.cm_count, 0)) AS cm_est
FROM coords c LEFT JOIN sketch s
  ON c.lang = s.lang AND c.cm_row = s.cm_row AND c.cm_col = s.cm_col
GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    // per-query runtime metrics: the engine executes a fixed
    // partition-pruned probe under a QueryExecutionListener and reports
    // what its plan metrics SAY it did; the oracle recomputes each value
    // from the claims data itself, so a pruning regression (scan reads
    // all partitions) or a metric-reporting regression both mismatch
    "q_exec_metrics" -> (ClaimsCte + """,
tot AS (SELECT count(*) AS n FROM
  (SELECT DISTINCT service_year, service_month FROM silver) p),
yr AS (SELECT CAST(count(*) AS BIGINT) AS rows_read,
  CAST(count(DISTINCT service_month) AS BIGINT) AS months
  FROM silver WHERE service_year = 1998)
SELECT metric, value FROM (
  SELECT 'groups_out' AS metric, months AS value FROM yr
  UNION ALL
  SELECT 'partitions_pruned', CAST(tot.n AS BIGINT) - yr.months
    FROM tot, yr
  UNION ALL
  SELECT 'partitions_scanned', months FROM yr
  UNION ALL
  SELECT 'partitions_total', CAST(n AS BIGINT) FROM tot
  UNION ALL
  SELECT 'rows_read', rows_read FROM yr
) m ORDER BY metric"""),

    // incremental publish, monthly_trend view: full recompute oracle —
    // equality proves the incremental pass kept EVERY view consistent
    "q_incremental_trend" -> (ClaimsCte + """
SELECT service_year, service_month,
  count(*) AS total_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) / count(*)
    AS avg_amount,
  min(claim_amount) AS min_amount,
  max(claim_amount) AS max_amount
FROM silver GROUP BY 1, 2 ORDER BY 1, 2"""),

    // incremental publish, dq_dashboard view: full recompute oracle
    "q_incremental_dq" -> (ClaimsCte + """
SELECT service_year, service_month,
  count(*) AS total_claims,
  count(CASE WHEN data_quality_score = 1.0 THEN 1 END) AS perfect_quality,
  count(CASE WHEN data_quality_score = 0.7 THEN 1 END) AS zero_amount_claims,
  count(CASE WHEN data_quality_score = 0.5 THEN 1 END) AS missing_date_claims,
  CAST(sum(CAST(data_quality_score AS DECIMAL(38,4))) AS DOUBLE) / count(*)
    AS avg_quality_score,
  count(CASE WHEN provider_name = 'UNKNOWN' THEN 1 END)
    AS unknown_provider_claims
FROM silver GROUP BY 1, 2 ORDER BY 1, 2"""),

    // SCD1 upsert: base claims (batch 1) merged with restated amounts +
    // new claims (batch 2, 1998+ periods only), latest batch wins per
    // claim_id, ties to base (idempotent replay); the oracle replays
    // both batches through the SAME cleanse chain and windows per key —
    // row-level value equality over the final table
    "q_upsert_claims" -> {
      val corrSrc = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice + 500 AS o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1998-01-01' AND o_orderkey % 10 = 0"
      val insSrc = "SELECT o_orderkey + 100000000 AS o_orderkey, " +
        "o_custkey, o_orderpriority, o_totalprice, o_orderdate " +
        "FROM orders " +
        "WHERE o_orderdate >= DATE '1998-01-01' AND o_orderkey % 17 = 0"
      s"""$ClaimsCte,
${claimsChainCtes("_u", s"$corrSrc UNION ALL $insSrc")},
allv AS (
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240101_000000' AS batch_id, 1 AS src FROM silver
  UNION ALL
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240102_000000' AS batch_id, 0 AS src FROM silver_u)
SELECT claim_id, batch_id, claim_amount, service_year, service_month
FROM (SELECT *, row_number() OVER (PARTITION BY claim_id
        ORDER BY batch_id DESC, src DESC) AS rn FROM allv) z
WHERE rn = 1 ORDER BY claim_id"""
    },

    // incremental partition-aware gold publish: the engine ingests two
    // batches (pre-1997 / 1997+) and publishes gold incrementally —
    // second pass recomputes ONLY changed partitions via a pruned scan
    // + dynamic partition overwrite; the oracle is the FULL recompute
    // over all claims, so value-equality IS the bit-identity contract
    // that makes incremental publish trustworthy
    "q_incremental_gold" -> (ClaimsCte + """
SELECT service_year, service_month, claim_amount_category,
  count(*) AS total_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  count(CASE WHEN data_quality_score < 1.0 THEN 1 END) AS n_flagged
FROM silver
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""),

    // snapshot CDC: the v1->v2 manifest-diff feed must be exactly
    // batch 2's ingested silver — complete (no appended row missed)
    // and minimal (no pre-existing row re-delivered)
    "q_snapshot_cdc" -> {
      val b2Src = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b2", b2Src)}
SELECT claim_id, '20240102_000000' AS batch_id, claim_amount,
  service_year, service_month
FROM silver_b2 ORDER BY claim_id"""
    },

    // multi-writer CAS: four concurrent appenders each committed a
    // disjoint quarter of the silver; the final table must be the
    // COMPLETE silver (no lost commit, no duplicated row), whatever
    // order the writers won their manifest versions in
    "q_concurrent_commits" -> (ClaimsCte + """
SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
  service_year, service_month
FROM silver ORDER BY claim_id"""),

    // typed (DATE) zone maps: the engine aggregates 1996 having pruned
    // files by ISO date zones; the oracle scans the FULL silver —
    // equality proves date skipping lost nothing
    "q_date_skipping" -> (ClaimsCte + """
SELECT service_month, count(*) AS n_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount
FROM silver
WHERE service_date BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
GROUP BY 1 ORDER BY 1"""),

    // snapshot history (DESCRIBE HISTORY analog): one row per (version,
    // changed partition), computed from manifest diffs alone; the
    // oracle recomputes each batch's partition set from the replayed
    // chain — metadata history must match data history
    "q_snapshot_history" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)}
SELECT * FROM (
  SELECT 1 AS version, 'append' AS op, service_year, service_month
  FROM silver_b1
  WHERE service_year IS NOT NULL AND service_month IS NOT NULL
  GROUP BY service_year, service_month
  UNION ALL
  SELECT 2 AS version, 'append' AS op, service_year, service_month
  FROM silver_b2
  WHERE service_year IS NOT NULL AND service_month IS NOT NULL
  GROUP BY service_year, service_month) h
ORDER BY version, service_year, service_month"""
    },

    // snapshot-native row-level DELETE: every 10th order's claim erased
    // via the zone-pruned copy-on-write rewrite; the oracle recomputes
    // silver minus the doomed keys over the full chain — equality
    // proves every doomed row left and nothing else did
    "q_snapshot_delete" -> (ClaimsCte + """
SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
  service_year, service_month
FROM silver
WHERE claim_id NOT IN (
  SELECT 'C' || CAST(o_orderkey AS VARCHAR) FROM orders
  WHERE o_orderkey % 10 = 0)
ORDER BY claim_id"""),

    // snapshot-native MERGE: the moving-correction batch merged on the
    // snapshot layer (key-zone candidate files, verified semi-join, one
    // copy-on-write commit) — oracle identical to q_upsert_moving's
    // replayed chain, so equality proves the snapshot MERGE and the
    // directory-swap MERGE produce the same table
    "q_snapshot_merge" -> {
      val movedSrc = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, CAST(o_orderdate + INTERVAL 40 DAY AS DATE) " +
        "AS o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-07-01' AND o_orderkey % 10 = 0"
      s"""$ClaimsCte,
${claimsChainCtes("_m", movedSrc)},
allv AS (
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240101_000000' AS batch_id, 1 AS src FROM silver
  UNION ALL
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240102_000000' AS batch_id, 0 AS src FROM silver_m)
SELECT claim_id, batch_id, claim_amount, service_year, service_month
FROM (SELECT *, row_number() OVER (PARTITION BY claim_id
        ORDER BY batch_id DESC, src DESC) AS rn FROM allv) z
WHERE rn = 1 ORDER BY claim_id"""
    },

    // streaming upsert: the moving-correction batch delivered through
    // the file-stream checkpoint into the same index-probed merge —
    // oracle identical to q_upsert_moving, so equality proves the
    // continuous MERGE and the batch MERGE produce the same table
    "q_stream_upsert" -> {
      val movedSrc = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, CAST(o_orderdate + INTERVAL 40 DAY AS DATE) " +
        "AS o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-07-01' AND o_orderkey % 10 = 0"
      s"""$ClaimsCte,
${claimsChainCtes("_m", movedSrc)},
allv AS (
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240101_000000' AS batch_id, 1 AS src FROM silver
  UNION ALL
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240102_000000' AS batch_id, 0 AS src FROM silver_m)
SELECT claim_id, batch_id, claim_amount, service_year, service_month
FROM (SELECT *, row_number() OVER (PARTITION BY claim_id
        ORDER BY batch_id DESC, src DESC) AS rn FROM allv) z
WHERE rn = 1 ORDER BY claim_id"""
    },

    // zone-map data skipping: amount-clustered snapshot commit with
    // per-file min/max stats; the engine's range aggregate reads only
    // zone-intersecting files, the oracle scans the full table —
    // equality proves skipping never dropped a qualifying row
    // predicate-pruned READ (round-15): readWhere derives the
    // file-skipping bounds from the caller's own filter conjuncts; the
    // oracle computes the banded rollup over the FULL table, proving
    // the derivation never skipped a qualifying file
    "q_read_where" -> (ClaimsCte + """
SELECT claim_amount_category,
  count(*) AS n_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount
FROM silver
WHERE claim_amount >= 50000.0 AND claim_amount <= 120000.0
GROUP BY claim_amount_category
ORDER BY claim_amount_category"""),

    // Bloom-index point lookup: the engine opens only the files whose
    // per-file Bloom can hold one of the member's claim ids; the
    // oracle scans the full silver — equality proves a Bloom (no false
    // negatives) never skipped a matching file
    "q_bloom_lookup" -> (ClaimsCte + """
SELECT claim_id, member_id, claim_amount, service_year, service_month
FROM silver
WHERE member_id = (SELECT max(member_id) FROM silver)
ORDER BY claim_id"""),

    "q_data_skipping" -> (ClaimsCte + """
SELECT count(*) AS n_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount
FROM silver
WHERE claim_amount >= 1000.0 AND claim_amount <= 20000.0"""),

    // snapshot-native incremental publish: ingest = snapshot appends,
    // change detection = manifest diff alone (no listing, no data
    // read), recompute = pruned slice of the current snapshot; the
    // oracle is the full gold recompute, same contract as
    // q_incremental_gold/q_stream_publish
    "q_snapshot_publish" -> (ClaimsCte + """
SELECT service_year, service_month, claim_amount_category,
  count(*) AS total_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  count(CASE WHEN data_quality_score < 1.0 THEN 1 END) AS n_flagged
FROM silver
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""),

    // snapshot-native pipeline: CSV -> bronze -> snapshot silver ->
    // manifest-diff incremental gold, two batches; oracle = full
    // recompute claims summary, same contract as q_snapshot_publish
    // but with the REAL CSV/bronze hops feeding the snapshot layer
    "q_pipeline_snapshot" -> (ClaimsCte + """
SELECT service_year, service_month, claim_amount_category,
  count(*) AS total_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  count(CASE WHEN data_quality_score < 1.0 THEN 1 END) AS n_flagged
FROM silver
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""),

    // snapshot time travel: v1 = base silver appended to a manifest-
    // tracked snapshot table, v2 = the correction batch committed as a
    // COPY-ON-WRITE partition overwrite; the engine reads both versions
    // from their manifests, the oracle recomputes v1 from the batch-1
    // chain and v2 from the windowed merge — equality proves v1 stayed
    // byte-faithful across v2's overwrite (snapshot isolation) and v2
    // sees the merge
    "q_time_travel" -> {
      val corrSrc = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice + 500 AS o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1998-01-01' AND o_orderkey % 10 = 0"
      val insSrc = "SELECT o_orderkey + 100000000 AS o_orderkey, " +
        "o_custkey, o_orderpriority, o_totalprice, o_orderdate " +
        "FROM orders " +
        "WHERE o_orderdate >= DATE '1998-01-01' AND o_orderkey % 17 = 0"
      s"""$ClaimsCte,
${claimsChainCtes("_u", s"$corrSrc UNION ALL $insSrc")},
allv AS (
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240101_000000' AS batch_id, 1 AS src FROM silver
  UNION ALL
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240102_000000' AS batch_id, 0 AS src FROM silver_u),
merged AS (
  SELECT claim_id, batch_id, claim_amount, service_year, service_month
  FROM (SELECT *, row_number() OVER (PARTITION BY claim_id
          ORDER BY batch_id DESC, src DESC) AS rn FROM allv) z
  WHERE rn = 1)
SELECT version, claim_id, batch_id, claim_amount,
  service_year, service_month FROM (
  SELECT 1 AS version, claim_id, '20240101_000000' AS batch_id,
    claim_amount, service_year, service_month FROM silver
  UNION ALL
  SELECT 2 AS version, claim_id, batch_id, claim_amount,
    service_year, service_month FROM merged) u
ORDER BY version, claim_id"""
    },

    // metrics history log: three probe captures appended to the
    // date-partitioned parquet log, summary series served from the log
    // alone — the oracle recomputes each deterministic metric from the
    // claims data, requires exactly 3 captures and min == max (the
    // probe's metrics cannot drift), proving append AND read paths
    "q_metrics_history" -> (ClaimsCte + """,
tot AS (SELECT count(*) AS n FROM
  (SELECT DISTINCT service_year, service_month FROM silver) p),
yr AS (SELECT CAST(count(*) AS BIGINT) AS rows_read,
  CAST(count(DISTINCT service_month) AS BIGINT) AS months
  FROM silver WHERE service_year = 1998)
SELECT metric, n_captures, min_value, max_value FROM (
  SELECT 'groups_out' AS metric, CAST(3 AS BIGINT) AS n_captures,
    months AS min_value, months AS max_value FROM yr
  UNION ALL
  SELECT 'partitions_pruned', CAST(3 AS BIGINT),
    tot.n - yr.months, tot.n - yr.months FROM tot, yr
  UNION ALL
  SELECT 'partitions_scanned', CAST(3 AS BIGINT), months, months FROM yr
  UNION ALL
  SELECT 'partitions_total', CAST(3 AS BIGINT),
    CAST(n AS BIGINT), CAST(n AS BIGINT) FROM tot
  UNION ALL
  SELECT 'rows_read', CAST(3 AS BIGINT), rows_read, rows_read FROM yr
) m ORDER BY metric"""),

    // SCD1 upsert with PARTITION-MOVING corrections: batch 2 restates
    // the service date +40 days for every 10th order of the 1997-07+
    // window (the claim changes its (service_year, service_month)
    // home); the engine locates moved-from partitions via the Bloom
    // key->partition sidecar and deletes the old versions, the oracle
    // replays both batches through the cleanse chain and windows per
    // key — equality proves no key survives in its old partition and
    // none was lost
    "q_upsert_moving" -> {
      val movedSrc = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, CAST(o_orderdate + INTERVAL 40 DAY AS DATE) " +
        "AS o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-07-01' AND o_orderkey % 10 = 0"
      s"""$ClaimsCte,
${claimsChainCtes("_m", movedSrc)},
allv AS (
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240101_000000' AS batch_id, 1 AS src FROM silver
  UNION ALL
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240102_000000' AS batch_id, 0 AS src FROM silver_m)
SELECT claim_id, batch_id, claim_amount, service_year, service_month
FROM (SELECT *, row_number() OVER (PARTITION BY claim_id
        ORDER BY batch_id DESC, src DESC) AS rn FROM allv) z
WHERE rn = 1 ORDER BY claim_id"""
    },

    // streaming incremental publish: same full-recompute contract as
    // q_incremental_gold — the engine drives every publish through the
    // file-stream change feed (foreachBatch), the oracle recomputes
    // gold in full, so equality proves the continuous pipeline and the
    // batch cadence publish identical bytes
    "q_stream_publish" -> (ClaimsCte + """
SELECT service_year, service_month, claim_amount_category,
  count(*) AS total_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  count(CASE WHEN data_quality_score < 1.0 THEN 1 END) AS n_flagged
FROM silver
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""),

    // -------------------------------------------------------------
    // round-12: scan planner, WAP, schema evolution, rollback,
    // manifest compaction
    // -------------------------------------------------------------

    // unified scan planner: ONE planScan call composes partition
    // pruning (1996 Q2) with DATE zone pruning; the oracle aggregates
    // the FULL silver under the same row predicate — equality proves
    // the composed plan reads every qualifying row
    "q_scan_planner" -> (ClaimsCte + """
SELECT service_month, count(*) AS n_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount
FROM silver
WHERE service_date BETWEEN DATE '1996-04-01' AND DATE '1996-06-30'
GROUP BY 1 ORDER BY 1"""),

    // write-audit-publish: a corrupted 1997+ batch (nulled claim_ids)
    // is staged, FAILS the 23-expectation DQ audit, and is rolled
    // back; the clean batch passes and main fast-forwards. The oracle
    // is the two-batch silver — main must hold the failing batch ZERO
    // times and the passing one exactly once
    "q_snapshot_wap" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)}
SELECT * FROM (
  SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
    service_year, service_month
  FROM silver_b1
  UNION ALL
  SELECT claim_id, '20240102_000000' AS batch_id, claim_amount,
    service_year, service_month
  FROM silver_b2) u
ORDER BY claim_id"""
    },

    // schema evolution on WRITE: batch 2 carries a NEW column committed
    // into the root's schema metadata; batch-1 rows surface it as NULL
    // (grouped under 'none'). The oracle replays both batches and tags
    // them identically — old data, new data, and the evolved schema
    // must agree
    "q_schema_evolution" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)}
SELECT service_year, adjudication_source, count(*) AS n_claims,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount
FROM (
  SELECT service_year, 'none' AS adjudication_source, claim_amount
  FROM silver_b1
  UNION ALL
  SELECT service_year,
    CASE WHEN claim_amount > 1000 THEN 'manual' ELSE 'auto' END
      AS adjudication_source,
    claim_amount
  FROM silver_b2) u
GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    // metadata-only rollback: v1 = pre-1997 silver, v2 = the 1997+
    // batch, then rollbackTo(1) — the table must read as EXACTLY the
    // pre-1997 silver again (v2 stays time-travelable, spec-pinned)
    "q_snapshot_rollback" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b1", b1)}
SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
  service_year, service_month
FROM silver_b1 ORDER BY claim_id"""
    },

    // manifest rewrite: twelve micro-commits' chunks merged down to 2
    // partition-ordered chunks in one metadata-only commit; the table
    // content must be the COMPLETE silver, bit-unchanged (same
    // contract as q_concurrent_commits)
    "q_manifest_compact" -> (ClaimsCte + """
SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
  service_year, service_month
FROM silver ORDER BY claim_id"""),

    // metadata row counts: the Spark side answers from roots + chunks
    // ALONE (zero data files opened); the oracle recomputes the
    // two-batch silver and counts per partition — equality proves the
    // committed counts are the data's truth
    "q_snapshot_stats" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)}
SELECT service_year, service_month, count(*) AS n_claims
FROM (SELECT service_year, service_month FROM silver_b1
      UNION ALL
      SELECT service_year, service_month FROM silver_b2) u
GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    // ANALYZE NDV sidecar: the Spark side reads the persisted KMV
    // sketch (no data); the oracle runs the engine-standard KMV mirror
    // (md5 hash60, k=64, identical estimator arithmetic) over the
    // recomputed silver — byte-equality proves the sidecar is exactly
    // the live data's sketch
    "q_snapshot_ndv" -> {
      import graft.operators.SketchOps.hash60Sql
      val k = graft.operators.SketchOps.KmvK
      val two60 = "1.152921504606846976e18"
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      def arm(c: String) =
        s"""SELECT '$c' AS column_name,
  CASE WHEN __held < $k THEN CAST(__held AS DOUBLE)
       ELSE ${(k - 1).toDouble} /
         ((CAST(__kth AS DOUBLE) + 1.0) / $two60) END AS ndv_kmv
FROM (
  SELECT count(*) AS __held, max(__h) AS __kth FROM (
    SELECT __h, row_number() OVER (ORDER BY __h) AS __rk
    FROM (SELECT DISTINCT ${hash60Sql(c)} AS __h FROM u
          WHERE $c IS NOT NULL) d
  ) r WHERE __rk <= $k)"""
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)},
u AS (SELECT claim_id, member_id, provider_name FROM silver_b1
      UNION ALL
      SELECT claim_id, member_id, provider_name FROM silver_b2)
${Seq("claim_id", "member_id", "provider_name").map(arm)
        .mkString("", "\nUNION ALL\n", "")}
ORDER BY column_name"""
    },

    // partition evolution: pre-1997 batch written month-grain, spec
    // evolved to day grain, 1997+ batch written day-grain; the read
    // spans both layouts (service_day from data vs from path) and must
    // equal the plain two-batch silver recompute
    "q_partition_evolution" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)}
SELECT service_year, service_month, count(*) AS n_claims,
  count(DISTINCT service_day) AS n_days,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount
FROM (SELECT service_year, service_month, service_day, claim_amount
      FROM silver_b1
      UNION ALL
      SELECT service_year, service_month, service_day, claim_amount
      FROM silver_b2) u
GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    // hidden partitioning: the engine derives (year, month) partition
    // pruning from a service_date range over a year boundary; the
    // oracle aggregates the FULL silver under the same row predicate —
    // equality proves the derived pruning lossless
    "q_hidden_partitioning" -> (ClaimsCte + """
SELECT service_year, service_month, count(*) AS n_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount
FROM silver
WHERE service_date BETWEEN DATE '1995-11-15' AND DATE '1996-02-14'
GROUP BY 1, 2 ORDER BY 1, 2"""),

    // cross-table WAP: a silver-only repin (gold left stale) fails the
    // staged-cut audit and rolls back; the republished pair passes and
    // main fast-forwards — gold through main is the both-batch rollup
    "q_catalog_wap" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)}
SELECT service_year, service_month, claim_amount_category,
  count(*) AS total_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  count(CASE WHEN data_quality_score < 1.0 THEN 1 END) AS n_flagged
FROM (SELECT * FROM silver_b1 UNION ALL SELECT * FROM silver_b2) u
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""
    },

    // z-order clustering: a 2-D predicate (date range x amount band)
    // answered through one planScan carrying two zone predicates over
    // the z-clustered table; oracle = full-table recompute under the
    // same row predicate (pruning lossless on both dimensions)
    "q_zorder_scan" -> (ClaimsCte + """
SELECT service_month, count(*) AS n_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount
FROM silver
WHERE service_date BETWEEN DATE '1996-04-01' AND DATE '1996-06-30'
  AND claim_amount BETWEEN 1000.0 AND 100000.0
GROUP BY 1 ORDER BY 1"""),

    // exactly-once streaming sink: two silver drops drained through a
    // checkpointed file stream into snapshot commits carrying their
    // micro-batch id; a hand-replayed last batch must skip — the table
    // is the two-batch silver exactly once
    "q_stream_snapshot" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)}
SELECT * FROM (
  SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
    service_year, service_month
  FROM silver_b1
  UNION ALL
  SELECT claim_id, '20240102_000000' AS batch_id, claim_amount,
    service_year, service_month
  FROM silver_b2) u
ORDER BY claim_id"""
    },

    // multi-table transactions: gold read through catalog v1 must be
    // the rollup of batch-1 silver alone; through catalog v2 the
    // rollup of both batches — every catalog version serves the gold
    // consistent with its paired silver (atomic cross-table cut)
    "q_catalog_txn" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      val rollup = (src: String, cv: Int) =>
        s"""SELECT service_year, service_month, claim_amount_category,
  count(*) AS total_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  count(CASE WHEN data_quality_score < 1.0 THEN 1 END) AS n_flagged,
  $cv AS catalog_version
FROM $src GROUP BY 1, 2, 3"""
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)},
both_b AS (SELECT * FROM silver_b1 UNION ALL SELECT * FROM silver_b2)
${rollup("silver_b1", 1)}
UNION ALL
${rollup("both_b", 2)}
ORDER BY catalog_version, service_year, service_month,
  claim_amount_category"""
    },

    // metadata-driven broadcast join: the dim side carries a broadcast
    // hint because its COMMIT METADATA row count is under threshold
    // (PlanSpec pins the BroadcastHashJoin with Spark's own size
    // estimation disabled); the oracle recomputes the same join — the
    // hint changes the strategy, never the rows
    "q_snapshot_cbo" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)},
u AS (SELECT provider_name, claim_amount FROM silver_b1
      UNION ALL
      SELECT provider_name, claim_amount FROM silver_b2),
dim AS (
  SELECT DISTINCT provider_name,
    CASE WHEN provider_name = 'UNKNOWN' THEN 'none'
         ELSE 't' || CAST(CAST(substr(provider_name, 6, 1) AS INT) % 3
           AS VARCHAR) END AS provider_tier
  FROM u)
SELECT provider_tier, count(*) AS n_claims,
  count(DISTINCT provider_name) AS n_providers,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount
FROM u JOIN dim USING (provider_name)
GROUP BY 1 ORDER BY 1"""
    },

    // merge-on-read row-level DELETE: the same doomed key set as
    // q_snapshot_delete, erased by ONE equality-delete file (zero data
    // files rewritten — the engine asserts that against the manifest);
    // the oracle recomputes silver minus the keys over the full chain,
    // so equality proves the sequence-scoped anti-join read erased
    // every doomed row and nothing else
    "q_snapshot_delete_mor" -> (ClaimsCte + """
SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
  service_year, service_month
FROM silver
WHERE claim_id NOT IN (
  SELECT 'C' || CAST(o_orderkey AS VARCHAR) FROM orders
  WHERE o_orderkey % 10 = 0)
ORDER BY claim_id"""),

    // positional (deletion-vector) DELETE BY PREDICATE: every claim
    // over 300k erased via one DV sidecar commit (zero data files
    // rewritten — asserted against the manifest); the oracle keeps
    // exactly the non-matching rows over the full chain
    "q_snapshot_delete_where" -> (ClaimsCte + """
SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
  service_year, service_month
FROM silver
WHERE claim_amount <= 300000.0 OR claim_amount IS NULL
ORDER BY claim_id"""),

    // ATOMIC merge-on-read MERGE: one commit = equality-delete of the
    // update keys + the update rows as a new chunk (zero reads, zero
    // rewrites — asserted against the manifest); oracle identical to
    // q_snapshot_merge's latest-wins chain, proving the in-commit
    // delete+append composition equals the copy-on-write merge
    "q_snapshot_merge_mor" -> {
      val movedSrc = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, CAST(o_orderdate + INTERVAL 40 DAY AS DATE) " +
        "AS o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-07-01' AND o_orderkey % 10 = 0"
      s"""$ClaimsCte,
${claimsChainCtes("_m", movedSrc)},
allv AS (
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240101_000000' AS batch_id, 1 AS src FROM silver
  UNION ALL
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240102_000000' AS batch_id, 0 AS src FROM silver_m)
SELECT claim_id, batch_id, claim_amount, service_year, service_month
FROM (SELECT *, row_number() OVER (PARTITION BY claim_id
        ORDER BY batch_id DESC, src DESC) AS rn FROM allv) z
WHERE rn = 1 ORDER BY claim_id"""
    },

    // row-level BATCH change feed (round-15): mergeMor + deleteWhere
    // traffic, then changeRowsBetween(v1, v3) — the oracle
    // reconstructs INSERTs (update rows surviving the purge), the
    // restated keys' base pre-images (visible at v1), and the purged
    // rows' pre-images (the merged view at v2), proving the feed's
    // time-traveled markers exact
    "q_change_feed" -> changeFeedSql,

    // the STREAMING change feed must equal the batch feed row-for-row
    // (same fixture traffic, same window) — one oracle serves both
    "q_stream_change_feed" -> changeFeedSql,

    // bulk (GDPR-scale) erasure streamed row-level: one deleteWhere
    // erases every claim ≤ 300k, the stream spills its pre-image
    // positions to the executor-readable cache (tiny preImageEmbedMax
    // forces that path at every SF) — the oracle recomputes the erased
    // set's exact pre-images from the raw chain, proving the spilled
    // path emits exactly what the embedded path would
    "q_cdc_bulk_erase" -> s"""$ClaimsCte
SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
  service_year, service_month, 'delete' AS _change_type
FROM silver
WHERE claim_amount <= 300000.0
ORDER BY claim_id""",

    // the streaming source over a table taking MERGE-ON-READ traffic
    // (round-15): a mergeMor upsert + a positional deleteWhere purge,
    // then a fresh backfill — the oracle replays the latest-wins merge
    // chain and applies the purge predicate, proving the per-split
    // doomed-position application equals the batch read's anti-join
    "q_stream_cdc" -> mergedMinusPurgeSql,

    // streaming replication: the mirror fed by applyChangeFeed over
    // the CDC stream must equal the SOURCE's final content — the same
    // latest-wins-minus-purge oracle proves mirror == source
    "q_stream_replicate" -> mergedMinusPurgeSql,

    // one-call maintenance (OPTIMIZE analog): folding delete debt,
    // consolidating sidecars and compacting files must leave content
    // byte-identical — the same final-state oracle proves it
    "q_maintain" -> mergedMinusPurgeSql,

    // degradable change feed: a window SPANNING A COMPACTION consumed
    // as row markers + partition recompute must still converge the
    // mirror to the source's final content (same final-state oracle)
    "q_change_recompute" -> mergedMinusPurgeSql,

    // replication chain: apply-feed commits are row-monotone, so a
    // mirror-of-the-mirror (two CDC hops) equals the source exactly
    "q_replicate_chain" -> mergedMinusPurgeSql,

    // replication THROUGH maintenance: the follower streams each
    // row-monotone leg, overwrites the rewrite-touched partitions at
    // every maintain() commit, resumes after — the mirror must still
    // equal the source's final content (same final-state oracle)
    "q_stream_replicate_maintained" -> mergedMinusPurgeSql,

    // the snapshot table as a native streaming SOURCE: offsets are
    // snapshot versions, each micro-batch a manifest diff — the oracle
    // recomputes both committed batches through the cleanse chain, so
    // equality proves streamed == batch CDC (and the stream saw only
    // published commits)
    "q_stream_source" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)}
SELECT claim_id, batch_id, claim_amount, service_year, service_month
FROM (
  SELECT claim_id, '20240101_000000' AS batch_id, claim_amount,
    service_year, service_month FROM silver_b1
  UNION ALL
  SELECT claim_id, '20240102_000000' AS batch_id, claim_amount,
    service_year, service_month FROM silver_b2) u
ORDER BY claim_id"""
    },

    // catalog-transactional streaming: each micro-batch commits silver
    // exactly-once, republishes gold's changed partitions and pins the
    // pair in ONE catalog CAS — the oracle recomputes the rollup of
    // batch 1 (catalog v1) and both batches (catalog v2), proving no
    // published cut pairs silver vN with gold from vM≠N, across a
    // checkpointed stream with a replayed batch
    "q_stream_catalog_txn" -> {
      val b1 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate < DATE '1997-01-01'"
      val b2 = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1997-01-01'"
      val rollup = (src: String, cv: Int) =>
        s"""SELECT service_year, service_month, claim_amount_category,
  count(*) AS total_claims,
  count(DISTINCT member_id) AS unique_members,
  CAST(sum(CAST(claim_amount AS DECIMAL(38,4))) AS DOUBLE) AS total_amount,
  count(CASE WHEN data_quality_score < 1.0 THEN 1 END) AS n_flagged,
  $cv AS catalog_version
FROM $src GROUP BY 1, 2, 3"""
      s"""WITH ${claimsChainCtes("_b1", b1)},
${claimsChainCtes("_b2", b2)},
both_b AS (SELECT * FROM silver_b1 UNION ALL SELECT * FROM silver_b2)
${rollup("silver_b1", 1)}
UNION ALL
${rollup("both_b", 2)}
ORDER BY catalog_version, service_year, service_month,
  claim_amount_category"""
    },

    // file-granular copy-on-write MERGE: corrections confined to the
    // lowest eighth of the key range, merged on a 16-way key-clustered
    // base — the engine asserts most files carry by reference; the
    // oracle replays both batches through the cleanse CTEs and windows
    // per key, proving the narrow rewrite merged every correction and
    // lost nothing
    "q_snapshot_merge_file_cow" -> {
      val corrSrc = "SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "o_totalprice + 500 AS o_totalprice, o_orderdate FROM orders " +
        "WHERE o_orderdate >= DATE '1998-01-01' AND o_orderkey % 10 = 0 " +
        "AND CAST(o_orderkey AS VARCHAR) LIKE '19%'"
      s"""$ClaimsCte,
${claimsChainCtes("_n", corrSrc)},
allv AS (
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240101_000000' AS batch_id, 1 AS src FROM silver
  UNION ALL
  SELECT claim_id, claim_amount, service_year, service_month,
    '20240102_000000' AS batch_id, 0 AS src FROM silver_n)
SELECT claim_id, batch_id, claim_amount, service_year, service_month
FROM (SELECT *, row_number() OVER (PARTITION BY claim_id
        ORDER BY batch_id DESC, src DESC) AS rn FROM allv) z
WHERE rn = 1 ORDER BY claim_id"""
    },
  )

  /** The fused IVF-PQ ADC search pipeline, shared verbatim by
    * q_ivfpq_search (self-contained) and q_ivfpq_query (persisted
    * model — bit-identical by parquet round-trip). */
  private lazy val ivfPqSearchSql: String = {
      import graft.functions.VectorFunctions.l2sqSql
      val dts = (0 until 4).map { s =>
        val o = s * 16
        s"""dt$s AS (
  SELECT q.query_id, q.cell, c.code,
    ${l2sqSql(s"q.qres[${o + 1}:${o + 16}]", "c.centroid")} AS d
  FROM qres q CROSS JOIN r${s}c2 c)"""
      }.mkString(",\n")
      s"""WITH $ivfPqCoarseCtes,
${(0 until 4).map(pqResidSubCtes).mkString(",\n")},
q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < 5),
qprobe AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY ${l2sqSql("q.qv", "c.centroid")} ASC, c.cell) AS pr
    FROM q CROSS JOIN cc2 c) p
  WHERE pr <= 2),
qres AS (
  SELECT p.query_id, p.cell,
    list_transform(list_zip(p.qv, c.centroid),
      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS qres
  FROM qprobe p JOIN cc2 c ON c.cell = p.cell),
$dts,
encj AS (
  SELECT e0.vec_id, a.cell,
    e0.code AS c0, e1.code AS c1, e2.code AS c2, e3.code AS c3
  FROM r0enc e0
  JOIN r1enc e1 ON e1.vec_id = e0.vec_id
  JOIN r2enc e2 ON e2.vec_id = e0.vec_id
  JOIN r3enc e3 ON e3.vec_id = e0.vec_id
  JOIN cassign a ON a.vec_id = e0.vec_id),
scored AS (
  SELECT d0.query_id, e.vec_id, e.cell,
    d0.d + d1.d + d2.d + d3.d AS adc_dist
  FROM encj e
  JOIN dt0 d0 ON d0.cell = e.cell AND d0.code = e.c0
  JOIN dt1 d1 ON d1.query_id = d0.query_id AND d1.cell = e.cell
    AND d1.code = e.c1
  JOIN dt2 d2 ON d2.query_id = d0.query_id AND d2.cell = e.cell
    AND d2.code = e.c2
  JOIN dt3 d3 ON d3.query_id = d0.query_id AND d3.cell = e.cell
    AND d3.code = e.c3
  WHERE e.vec_id <> d0.query_id)
SELECT query_id, vec_id, cell, adc_dist, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY adc_dist ASC, vec_id) AS rnk FROM scored) r
WHERE rnk <= 5 ORDER BY query_id, rnk"""
    }

  /** The coarse-quantizer chain + residual frame for q_ivfpq_codes:
    * kmeansCentroids' exact arithmetic (25% sample, init vec_id < 8,
    * two fixed-point iterations), full-corpus assignment with the
    * (dist, cell) tie, then residual = CAST-to-double difference
    * against the assigned centroid. */
  private def ivfPqCoarseCtes: String = {
    import graft.functions.VectorFunctions.l2sqSql
    import graft.functions.TextFunctions.hashBucket100Sql
    val fp = "1048576.0"
    val cdims = (0 until 64).map { d =>
      s"CAST(sum(CAST(floor(CAST(embedding[${d + 1}] AS DOUBLE) * $fp) " +
        s"AS BIGINT)) AS DOUBLE) / $fp / count(*)"
    }.mkString(",\n    ")
    def asg(cent: String, src: String) =
      s"""SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY ${l2sqSql("e.embedding", "c.centroid")} ASC, c.cell) AS rn
    FROM $src e CROSS JOIN $cent c) a WHERE rn = 1"""
    s"""csamp AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE ${hashBucket100Sql("vec_id")} < 25),
cc0 AS (
  SELECT CAST(vec_id AS INT) AS cell,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM embeddings WHERE vec_id < 8),
ca1 AS (${asg("cc0", "csamp")}),
cc1 AS (SELECT cell, [$cdims] AS centroid FROM ca1 GROUP BY cell),
ca2 AS (${asg("cc1", "csamp")}),
cc2 AS (SELECT cell, [$cdims] AS centroid FROM ca2 GROUP BY cell),
cassign AS (${asg("cc2", "embeddings")}),
resid AS (
  SELECT a.vec_id, a.cell,
    list_transform(list_zip(a.embedding, c.centroid),
      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS embedding
  FROM cassign a JOIN cc2 c ON c.cell = a.cell)"""
  }

  /** [[pqSubCtes]] over the RESIDUAL frame (elements already double;
    * r-prefixed CTE names). */
  private def pqResidSubCtes(s: Int): String = {
    import graft.functions.VectorFunctions.l2sqSql
    import graft.functions.TextFunctions.hashBucket100Sql
    val fp = "1048576.0"
    val k = 8; val subDim = 16
    val o = s * subDim
    val sv = s"embedding[${o + 1}:${o + subDim}]"
    val cdims = (0 until subDim).map { d =>
      s"CAST(sum(CAST(floor(CAST(sv[${d + 1}] AS DOUBLE) * $fp) " +
        s"AS BIGINT)) AS DOUBLE) / $fp / count(*)"
    }.mkString(",\n    ")
    def asgn(cent: String, src: String) =
      s"""SELECT vec_id, sv, code, dist FROM (
    SELECT e.vec_id, e.sv, c.code, ${l2sqSql("e.sv", "c.centroid")} AS dist,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY ${l2sqSql("e.sv", "c.centroid")} ASC, c.code) AS rn
    FROM $src e CROSS JOIN $cent c) a WHERE rn = 1"""
    s"""r${s}samp AS (
  SELECT vec_id, $sv AS sv FROM resid
  WHERE ${hashBucket100Sql("vec_id")} < 25),
r${s}full AS (SELECT vec_id, $sv AS sv FROM resid),
r${s}c0 AS (
  SELECT CAST(vec_id AS INT) AS code, $sv AS centroid
  FROM resid WHERE vec_id < $k),
r${s}a1 AS (${asgn(s"r${s}c0", s"r${s}samp")}),
r${s}c1 AS (SELECT code, [$cdims] AS centroid FROM r${s}a1 GROUP BY code),
r${s}a2 AS (${asgn(s"r${s}c1", s"r${s}samp")}),
r${s}c2 AS (SELECT code, [$cdims] AS centroid FROM r${s}a2 GROUP BY code),
r${s}enc AS (${asgn(s"r${s}c2", s"r${s}full")})"""
  }

  /** The per-subspace PQ training chain shared by q_pq_codes and
    * q_ann_pq: 25% hash-sample, init = subvectors of vec_id < 8, two
    * fixed-point Lloyd's iterations, full-corpus encode — mirroring
    * [[graft.operators.VectorOps.pqCodebooks]] exactly. */
  private def pqSubCtes(s: Int): String = {
    import graft.functions.VectorFunctions.l2sqSql
    import graft.functions.TextFunctions.hashBucket100Sql
    val fp = "1048576.0"
    val k = 8; val subDim = 16
    val o = s * subDim
    val sv = s"list_transform(embedding[${o + 1}:${o + subDim}], " +
      "x -> CAST(x AS DOUBLE))"
    val cdims = (0 until subDim).map { d =>
      s"CAST(sum(CAST(floor(CAST(sv[${d + 1}] AS DOUBLE) * $fp) " +
        s"AS BIGINT)) AS DOUBLE) / $fp / count(*)"
    }.mkString(",\n    ")
    def asgn(cent: String, src: String) =
      s"""SELECT vec_id, sv, code, dist FROM (
    SELECT e.vec_id, e.sv, c.code, ${l2sqSql("e.sv", "c.centroid")} AS dist,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY ${l2sqSql("e.sv", "c.centroid")} ASC, c.code) AS rn
    FROM $src e CROSS JOIN $cent c) a WHERE rn = 1"""
    s"""s${s}samp AS (
  SELECT vec_id, $sv AS sv FROM embeddings
  WHERE ${hashBucket100Sql("vec_id")} < 25),
s${s}full AS (SELECT vec_id, $sv AS sv FROM embeddings),
s${s}c0 AS (
  SELECT CAST(vec_id AS INT) AS code, $sv AS centroid
  FROM embeddings WHERE vec_id < $k),
s${s}a1 AS (${asgn(s"s${s}c0", s"s${s}samp")}),
s${s}c1 AS (SELECT code, [$cdims] AS centroid FROM s${s}a1 GROUP BY code),
s${s}a2 AS (${asgn(s"s${s}c1", s"s${s}samp")}),
s${s}c2 AS (SELECT code, [$cdims] AS centroid FROM s${s}a2 GROUP BY code),
s${s}enc AS (${asgn(s"s${s}c2", s"s${s}full")})"""
  }
}
