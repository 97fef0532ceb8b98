package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.{Engine, Tables}
import graft.functions.Cleansing
import graft.functions.Exact._

/** The six gold analytical views (sql/gold/create_views.sql:8-159),
  * transplanted onto the star schema per SURVEY.md §7.1 / FIXTURES.md §C.
  *
  * Every view is filter → hash-aggregate → (optional window/order) with no
  * wide intermediate: Catalyst plans partial+final HashAggregateExec with
  * map-side combine, so shuffled bytes are proportional to group count,
  * not input rows — the property that makes these hold at 100 TB.
  */
object GoldViews {

  /** create_views.sql:8-29 — claims_summary: date filter → 4-key groupBy →
    * count/distinct/money rollups. Amount buckets rescaled to
    * l_extendedprice's range (documented deviation; reference thresholds
    * assume claim-sized amounts). */
  def claimsSummary(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val keys = Seq("service_year", "service_month", "l_returnflag",
      "amount_category")
    val fact = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select(
        year(col("l_shipdate")).as("service_year"),
        month(col("l_shipdate")).as("service_month"),
        col("l_returnflag"),
        Cleansing.amountCategory(col("l_extendedprice"), 1000, 10000, 50000)
          .as("amount_category"),
        col("l_orderkey"), col("l_extendedprice"), col("l_shipdate"))
    val main = fact.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("total_claims"),
        dsum(col("l_extendedprice")).as("total_amount"),
        davg(col("l_extendedprice")).as("avg_amount"),
        min(col("l_extendedprice")).as("min_amount"),
        max(col("l_extendedprice")).as("max_amount"),
        countIf(col("l_extendedprice") > 10000).as("high_value_claims"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
    AggPatterns.nullSafeKeyJoin(main,
        distinctCount(fact, keys, col("l_orderkey"), "unique_orders"), keys)
      .select(col("service_year"), col("service_month"), col("l_returnflag"),
        col("amount_category"), col("total_claims"), col("unique_orders"),
        col("total_amount"), col("avg_amount"), col("min_amount"),
        col("max_amount"), col("high_value_claims"), col("first_ship"),
        col("last_ship"))
      .orderBy(col("service_year"), col("service_month"), col("l_returnflag"),
        col("amount_category"))
  }

  /** See [[AggPatterns.distinctCount]] — the shared decomposed
    * COUNT(DISTINCT) pattern. */
  private def distinctCount(df: DataFrame, keys: Seq[String], e: Column,
      as: String): DataFrame = AggPatterns.distinctCount(df, keys, e, as)

  /** create_views.sql:32-51 — monthly_claims_trend; month_date via
    * make_date (not the reference's unpadded string concat, which Spark's
    * to_date rejects — SURVEY.md §7.3). Distinct counts are decomposed
    * per [[distinctCount]]; the three per-month frames (tiny) join back
    * broadcast-style under AQE. */
  def monthlyTrend(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val keys = Seq("service_year", "service_month")
    val fact = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select(
        year(col("l_shipdate")).as("service_year"),
        month(col("l_shipdate")).as("service_month"),
        col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"))
    val main = fact.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("total_claims"),
        dsum(col("l_extendedprice")).as("total_amount"),
        davg(col("l_extendedprice")).as("avg_amount"),
        min(col("l_extendedprice")).as("min_amount"),
        max(col("l_extendedprice")).as("max_amount"))
    AggPatterns.nullSafeKeyJoin(AggPatterns.nullSafeKeyJoin(main,
        distinctCount(fact, keys, col("l_orderkey"), "unique_orders"), keys),
        distinctCount(fact, keys, col("l_suppkey"), "unique_suppliers"), keys)
      .select(col("service_year"), col("service_month"),
        col("total_claims"), col("unique_orders"), col("unique_suppliers"),
        col("total_amount"), col("avg_amount"), col("min_amount"),
        col("max_amount"))
      .withColumn("month_date",
        make_date(col("service_year"), col("service_month"), lit(1)))
      .orderBy(col("service_year").desc, col("service_month").desc)
  }

  /** Exact discrete median (percentile_disc 0.5 semantics: the value at
    * sorted position ceil(n/2), equivalently the smallest value whose
    * cumulative distribution ≥ 0.5) per group, in sort-based form: tiny
    * per-group totals (broadcast back), one row_number window over the
    * group-sorted values, keep the row at position ceil(n/2). One
    * spillable sort shuffle of (key, value) — no per-group state. The
    * built-in percentile_disc is a TypedImperativeAggregate that collects
    * EVERY raw value into a per-group buffer and ships the buffers
    * through the shuffle — at 100 TB a hot group is an OOM, and it forces
    * the whole operator to ObjectHashAggregate (no codegen). Measured
    * ~1.8× faster at sf0.1 too.
    *
    * NULL values are dropped before both the count and the window,
    * matching percentile_disc (which ignores them); a group whose values
    * are ALL null yields no row here — callers must LEFT-join this
    * branch (as providerPerformance does) so such a group keeps its main
    * row with a NULL median, exactly percentile_disc's answer (the
    * cleansed/clamped columns are non-null today, so this is a latent
    * contract, not a behavior change). */
  private def medianDiscBy(df: DataFrame, key: String, value: String,
      as: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = df.filter(col(value).isNotNull)
    val totals = vals.groupBy(col(key)).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(key)).orderBy(col(value))
    vals.select(col(key), col(value))
      .withColumn("__rn", row_number().over(w))
      .transform(AggPatterns.nullSafeKeyJoin(_, broadcast(totals), Seq(key)))
      // floor((n+1)/2) = ceil(n/2); Divide is double, exact for counts < 2^52
      .filter(col("__rn") === ((col("__n") + 1) / 2).cast("long"))
      .select(col(key), col(value).as(as))
  }

  /** create_views.sql:54-72 — provider_performance: dim join (supplier =
    * provider) → per-provider rollup with exact discrete median, pct-high,
    * active months; HAVING ≥10. Supplier is tiny at any scale factor →
    * broadcast hash join, zero shuffle on the build side.
    *
    * The rollup is FOUR composed aggregations over the joined fact
    * (broadcast exchange reused across branches), not one: the
    * single-operator form (2 distinct sets + percentile_disc) made
    * Catalyst Expand the fact 3× and build/shuffle exact-median partial
    * buffers keyed by ~every (provider, order) pair — 8.7 s at sf0.1 and
    * unshippable at 100 TB. Here the main rollup stays a codegen'd
    * two-phase HashAggregate, the exact median goes through the
    * shuffle-bounded [[medianDiscBy]], distinct counts through
    * [[distinctCount]], and the four ~|providers|-row frames join
    * broadcast-style under AQE. */
  def providerPerformance(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val li = Tables.lineitem(spark, sfDir)
    val sup = Tables.supplier(spark, sfDir)
    val fact = li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_name") =!= "UNKNOWN") // P5, create_views.sql:69
      .select(col("s_name").as("provider_name"), col("l_orderkey"),
        col("l_extendedprice"), col("l_shipdate"), col("l_quantity"))
    val keys = Seq("provider_name")
    val main = fact.groupBy(col("provider_name"))
      .agg(
        count(lit(1)).as("total_claims"),
        dsum(col("l_extendedprice")).as("total_billed"),
        davg(col("l_extendedprice")).as("avg_amount"),
        min(col("l_extendedprice")).as("min_amount"),
        max(col("l_extendedprice")).as("max_amount"),
        pct(countIf(col("l_extendedprice") > 10000), count(lit(1)))
          .as("high_value_pct"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"),
        davg(col("l_quantity")).as("avg_quantity"))
    val median =
      medianDiscBy(fact, "provider_name", "l_extendedprice", "median_amount")
    Seq(
        distinctCount(fact, keys, col("l_orderkey"), "unique_orders"),
        distinctCount(fact, keys,
          make_date(year(col("l_shipdate")), month(col("l_shipdate")), lit(1)),
          "active_months"))
      .foldLeft(main)(AggPatterns.nullSafeKeyJoin(_, _, keys))
      // LEFT: an all-null-values group keeps its row with median NULL
      // (percentile_disc semantics); inner would delete the whole group
      .transform(AggPatterns.nullSafeKeyJoin(_, median, keys, "left_outer"))
      .select(col("provider_name"), col("total_claims"), col("unique_orders"),
        col("total_billed"), col("avg_amount"), col("median_amount"),
        col("min_amount"), col("max_amount"), col("high_value_pct"),
        col("active_months"), col("first_ship"), col("last_ship"),
        col("avg_quantity"))
      .filter(col("total_claims") >= 10) // HAVING, create_views.sql:71
      .orderBy(col("total_billed").desc, col("provider_name"))
  }

  /** create_views.sql:75-97 — data_quality_dashboard over the silver
    * claims: score-band conditional counts + exact mean score per month. */
  def dqDashboard(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    SilverCleanse.fromOrders(Tables.orders(spark, sfDir))
      .groupBy(col("service_year"), col("service_month"))
      .agg(
        count(lit(1)).as("total_claims"),
        countIf(col("data_quality_score") === 1.0).as("perfect_quality"),
        countIf(col("data_quality_score") === 0.7).as("zero_amount_claims"),
        countIf(col("data_quality_score") === 0.5).as("missing_date_claims"),
        davg(col("data_quality_score")).as("avg_quality_score"),
        countIf(col("provider_name") === "UNKNOWN").as("unknown_provider_claims"),
        countIf(col("member_id").isNull).as("null_member_claims"))
      .orderBy(col("service_year").desc_nulls_last,
        col("service_month").desc_nulls_last)
  }

  /** create_views.sql:100-117 — member_activity: per-member rollup over
    * silver claims, activity span via datediff, HAVING ≥2. */
  def memberActivity(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    SilverCleanse.fromOrders(Tables.orders(spark, sfDir))
      .filter(col("member_id").isNotNull) // P6, create_views.sql:114
      .groupBy(col("member_id"))
      .agg(
        count(lit(1)).as("total_claims"),
        dsum(col("claim_amount")).as("total_amount"),
        davg(col("claim_amount")).as("avg_amount"),
        min(col("service_date")).as("first_date"),
        max(col("service_date")).as("last_date"),
        datediff(max(col("service_date")), min(col("service_date")))
          .as("active_span_days"), // F13: Trino DATE_DIFF arg order reversed
        countDistinct(col("claim_amount_category")).as("n_categories"))
      .filter(col("total_claims") >= 2) // HAVING, create_views.sql:116
      .orderBy(col("total_amount").desc, col("member_id"))
  }

  /** create_views.sql:120-159 — recent_activity: three sliding-window
    * global aggregates UNION ALL'd, ordered by a CASE expression (O2).
    * Windows anchor on max(ts), not wall clock, so results are
    * deterministic (SURVEY.md §7.4); the 1-row max side is broadcast.
    * Each arm's two distinct counts are decomposed
    * ([[AggPatterns.globalDistinctCount]]) and cross-joined back as
    * 1-row frames — no Expand over the filtered events. */
  def recentActivity(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val ev = Tables.events(spark, sfDir)
    val withMax = ev.crossJoin(broadcast(ev.agg(max(col("ts")).as("max_ts"))))
    def arm(label: String, order: Int, interval: String): DataFrame = {
      val w = withMax
        .filter(col("ts") >= col("max_ts") - expr(s"INTERVAL $interval"))
      val main = w.agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        davg(col("value")).as("avg_value"))
      main
        .crossJoin(AggPatterns.globalDistinctCount(w, col("user_id"), "n_users"))
        .crossJoin(AggPatterns.globalDistinctCount(w, col("event_type"),
          "n_event_types"))
        .select(lit(label).as("period"), lit(order).as("period_order"),
          col("n_events"), col("n_users"), col("n_event_types"),
          col("total_value"), col("avg_value"))
    }
    arm("Last 24 Hours", 1, "24 HOUR")
      .unionAll(arm("Last 7 Days", 2, "7 DAY"))
      .unionAll(arm("Last 30 Days", 3, "30 DAY"))
      .orderBy(col("period_order"))
  }
}
