package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.{Engine, Tables}
import graft.functions.Cleansing
import graft.functions.Exact._

/** The deterministic health-check queries of sql/trino_checks.sql
  * (SURVEY.md §2.11 tail): histograms with pct-of-total, top-k, null
  * audits, whole-table stats, plus the dimension joins SURVEY.md §7.1
  * adds over the star schema.
  */
object Checks {

  /** W1 pct-of-total over an aggregated relation, as a broadcast
    * cross-join with the grand total instead of an empty-over() window —
    * the same decomposed shape as [[AggPatterns.globalDistinctCount]].
    * The total aggregates the GROUPED frame, so the physical plan reuses
    * the group-by's shuffle exchange for both branches (one input scan;
    * plan-asserted by PlanSpec) and nothing ever moves to a single
    * partition. cnt is a long, so summing it in either shape is exact —
    * pct is bit-identical to the window form. */
  private def withPctOfTotal(agg: DataFrame): DataFrame =
    agg.crossJoin(broadcast(agg.agg(sum(col("cnt")).as("__total"))))
      .withColumn("pct",
        col("cnt").cast(DoubleType) * 100.0 / col("__total").cast(DoubleType))
      .drop("__total")

  /** trino_checks.sql:126-134 — category histogram with pct-of-total. */
  def categoryHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val agg = SilverCleanse.fromOrders(Tables.orders(spark, sfDir))
      .groupBy(col("claim_amount_category")).agg(count(lit(1)).as("cnt"))
    withPctOfTotal(agg)
      .orderBy(col("cnt").desc, col("claim_amount_category"))
  }

  /** trino_checks.sql:137-155 — quality-score histogram with pct. */
  def qualityHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val agg = SilverCleanse.fromOrders(Tables.orders(spark, sfDir))
      .groupBy(col("data_quality_score")).agg(count(lit(1)).as("cnt"))
    withPctOfTotal(agg)
      .orderBy(col("data_quality_score").desc)
  }

  /** trino_checks.sql:42-92 top-k pattern — ORDER BY metric DESC LIMIT 5
    * (ties broken on key for determinism). Spark plans
    * TakeOrderedAndProject: per-partition top-k then k-way driver merge,
    * no global sort — exactly the plan you want at scale. */
  def topMembers(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    SilverCleanse.fromOrders(Tables.orders(spark, sfDir))
      .filter(col("member_id").isNotNull)
      .groupBy(col("member_id")).agg(count(lit(1)).as("n_claims"))
      .orderBy(col("n_claims").desc, col("member_id"))
      .limit(5)
  }

  /** trino_checks.sql:158-166 — null/invalid audit over the RAW (pre-gate)
    * claims: one global aggregate pass. */
  def nullAudit(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    RawClaims.fromOrders(Engine.spread(Tables.orders(spark, sfDir)))
      .agg(
        count(lit(1)).as("total_rows"),
        countIf(col("claim_id_raw").isNull).as("null_claim_id"),
        countIf(col("member_id_raw").isNull).as("null_member_id"),
        countIf(col("provider_raw").isNull || trim(col("provider_raw")) === "")
          .as("missing_provider"),
        countIf(col("amount_raw").isNull).as("null_amount"),
        countIf(col("amount_raw") < 0).as("negative_amount"),
        countIf(Cleansing.parseServiceDate(col("service_date_raw")).isNull)
          .as("unparseable_date"))
  }

  /** trino_checks.sql:113-123 — whole-table statistics (A11). The two
    * distinct counts are decomposed ([[AggPatterns.globalDistinctCount]])
    * and cross-joined back as 1-row frames — no Expand over orders. */
  def tableStats(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val o = Tables.orders(spark, sfDir)
    o.agg(
        count(lit(1)).as("total_orders"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"),
        dsum(col("o_totalprice")).as("total_value"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .crossJoin(AggPatterns.globalDistinctCount(o, col("o_custkey"),
        "unique_customers"))
      .crossJoin(AggPatterns.globalDistinctCount(o, col("o_orderpriority"),
        "n_priorities"))
      .select(col("total_orders"), col("unique_customers"),
        col("n_priorities"), col("first_order"), col("last_order"),
        col("total_value"), col("min_price"), col("max_price"))
  }

  /** SURVEY.md §7.1 dim-join rollup: customer ⋈ nation ⋈ region, both
    * dims broadcast (25 / 5 rows at any SF) — no shuffle on either join. */
  def geoRollup(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_acctbal"),
        davg(col("c_acctbal")).as("avg_acctbal"),
        countDistinct(col("c_mktsegment")).as("n_segments"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** `q_geo_cube`: [[geoRollup]]'s hierarchy with ROLLUP subtotals —
    * per (region, nation), per region, and the grand total in one
    * grouping-sets aggregate (one pass over the input; Spark plans the
    * Expand + single hash aggregate this actually wants — row
    * multiplication ∝ 3 grouping sets is the POINT here, unlike the
    * multi-distinct Expand the rewrite rule removes). `grouping_id`
    * disambiguates a real NULL key from a subtotal row; ordering is on
    * (grouping_id, coalesced names) because Spark sorts NULLS FIRST
    * and DuckDB NULLS LAST — coalescing to '' removes the engine
    * disagreement instead of papering over it per query. */
  def geoCube(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy(col("gid"), coalesce(col("r_name"), lit("")),
        coalesce(col("n_name"), lit("")))
  }

  /** `q_segment_pivot`: customers per region PIVOTed by market
    * segment into columns — the wide dashboard shape. The segment
    * domain is passed EXPLICITLY (`pivot(col, values)`): at 100 TB the
    * implicit form runs a distinct-collect job over the fact table
    * just to learn the columns, and a domain drift silently reshapes
    * the output schema; the explicit list is one scan cheaper and
    * schema-stable. Spark compiles this to the same conditional-
    * aggregation the oracle writes out longhand. */
  def segmentPivot(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .pivot("c_mktsegment", segments)
      .agg(count(lit(1)))
      .orderBy(col("r_name"))
  }

  /** `q_region_unpivot`: [[segmentPivot]]'s inverse — the wide frame
    * melted back to (region, segment, n_customers) long form via
    * `unpivot` (Spark 3.4+'s melt). Pivot→unpivot round-trips the
    * original grouped counts, which is exactly what the oracle checks
    * (its long form comes straight from GROUP BY). Zero-count cells
    * survive the round trip as 0 rows — unpivot keeps them — so the
    * shape is lossless. */
  def regionUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")
    segmentPivot(spark, sfDir)
      .unpivot(Array(col("r_name")), segments.map(col).toArray,
        "segment", "n_customers")
      .orderBy(col("r_name"), col("segment"))
  }

  /** SURVEY.md §7.1 fact-fact join: lineitem ⋈ orders on the order key.
    * Both sides shuffle-hash/sort-merge on o_orderkey at scale; AQE picks
    * the physical join. Revenue goes through the exact-decimal path. */
  def factJoin(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        dsumWide(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** `q_shipping_priority`: the TPC-H Q3 shape — the canonical
    * three-way join the relational surface should plan well at scale:
    * the filtered customer dimension BROADCASTS onto orders (dim ∝
    * one segment of customers), that result hash-joins lineitem on
    * the fact key, and the top-k is TakeOrderedAndProject — never a
    * global sort of the aggregate. Revenue sums the per-row double
    * product through the exact Decimal(38,6) accumulator
    * ([[graft.functions.Exact.dsumWide]]) so the hash compare holds
    * across partitionings and engines; ties (unlikely doubles) break
    * on the order key for a deterministic top-10. */
  def shippingPriority(spark: SparkSession, sfDir: String,
      segment: String = "BUILDING", cutoff: String = "1996-03-15",
      k: Int = 10): DataFrame = {
    Engine.configure(spark)
    val cut = lit(cutoff).cast("timestamp")
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val orders = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_orderpriority"))
    val lines = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    orders.join(cust, col("o_custkey") === col("c_custkey"))
      .join(lines, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsumWide(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(k)
  }
}
