package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventOps, GoldSql, SilverCleanse, TemporalSql}

/** The SQL-surface gold views (the reference user's own interface) over
  * silver_claims: structural checks + exact integer cross-checks against
  * independent DataFrame computations on the same silver. */
class GoldSqlSpec extends SparkSpec {

  private lazy val silver = {
    val s = SilverCleanse.fromOrders(Tables.orders(spark, sfDir))
      .withColumn("processing_timestamp",
        lit("2024-01-01 00:00:00").cast("timestamp"))
    s.createOrReplaceTempView("silver_claims")
    GoldSql.createViews(spark)
    s
  }

  test("all six views create and return rows") {
    silver
    GoldSql.ViewNames.foreach { v =>
      assert(GoldSql.view(spark, v).count() > 0, v)
    }
  }

  test("claims_summary: integer aggregates match an independent computation") {
    val direct = silver.filter(col("service_date") >= lit("1996-01-01"))
      .groupBy("service_year", "service_month", "provider_name",
        "claim_amount_category")
      .agg(count(lit(1)).as("n"), countDistinct(col("member_id")).as("m"))
      .collect()
      .map(r => (r.getAs[Int](0), r.getAs[Int](1), r.getString(2),
        r.getString(3)) -> (r.getAs[Long]("n"), r.getAs[Long]("m"))).toMap
    val sql = GoldSql.view(spark, "gold_claims_summary").collect()
    assert(sql.length == direct.size)
    sql.foreach { r =>
      val key = (r.getAs[Int]("service_year"), r.getAs[Int]("service_month"),
        r.getAs[String]("provider_name"), r.getAs[String]("claim_amount_category"))
      assert(direct(key) == ((r.getAs[Long]("total_claims"),
        r.getAs[Long]("unique_members"))))
    }
  }

  test("dq_dashboard: gate holds (no poor-quality rows), totals cover silver") {
    val rows = GoldSql.view(spark, "gold_data_quality_dashboard").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("poor_quality") == 0L)
      assert(r.getAs[Long]("missing_claim_id") == 0L)
      assert(r.getAs[Long]("missing_member_id") == 0L)
    }
    assert(rows.map(_.getAs[Long]("total_records")).sum == silver.count())
  }

  test("provider_performance: HAVING and UNKNOWN filter apply; median is an element") {
    val amounts = silver.select("claim_amount").collect()
      .map(_.getDouble(0)).toSet
    val rows = GoldSql.view(spark, "gold_provider_performance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("provider_name") != "UNKNOWN")
      assert(r.getAs[Long]("total_claims") >= 10L)
      assert(amounts.contains(r.getAs[Double]("median_claim_amount")))
    }
  }

  test("member_activity agrees with the DataFrame gold view on shared keys") {
    val df = operators.GoldViews.memberActivity(spark, sfDir).collect()
      .map(r => r.getAs[String]("member_id") ->
        (r.getAs[Long]("total_claims"), r.getAs[Int]("active_span_days"))).toMap
    val sql = GoldSql.view(spark, "gold_member_activity").collect()
    assert(sql.length == df.size)
    sql.foreach { r =>
      assert(df(r.getAs[String]("member_id")) ==
        ((r.getAs[Long]("total_claims"), r.getAs[Int]("activity_span_days"))))
    }
  }

  test("recent_activity: three period arms, zero-row arms still present") {
    val rows = GoldSql.view(spark, "gold_recent_activity").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("period")).toSet ==
      Set("Last 30 Days", "Last 7 Days", "Last 24 Hours"))
  }

  // The temporal joins as verbatim SQL (TemporalSql): each recipe must
  // reproduce its DataFrame twin row for row — same columns, same
  // values, same order — so a migrating SQL user gets IDENTICAL results
  // from the pasted text.

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("TemporalSql.rangeJoin == EventOps.rangeJoin (pure-SQL bucketized range join)") {
    val sql = TemporalSql.rangeJoin(spark, sfDir)
    val df = EventOps.rangeJoin(spark, sfDir)
    assert(sql.columns.toSeq == df.columns.toSeq)
    val (s, d) = (rowsOf(sql), rowsOf(df))
    assert(s.nonEmpty && s == d)
  }

  test("TemporalSql.asofJoin == EventOps.asofJoin (pure-SQL union-marker as-of)") {
    val sql = TemporalSql.asofJoin(spark, sfDir)
    val df = EventOps.asofJoin(spark, sfDir)
    assert(sql.columns.toSeq == df.columns.toSeq)
    val (s, d) = (rowsOf(sql), rowsOf(df))
    assert(s.nonEmpty && s == d)
  }

  test("TemporalSql.sessionOverlap == EventOps.sessionOverlap (pure-SQL overlap join)") {
    val sql = TemporalSql.sessionOverlap(spark, sfDir)
    val df = EventOps.sessionOverlap(spark, sfDir)
    assert(sql.columns.toSeq == df.columns.toSeq)
    val (s, d) = (rowsOf(sql), rowsOf(df))
    assert(s.nonEmpty && s == d)
  }

  test("TemporalSql.asofForward == EventOps.asofJoinForward (pure-SQL forward as-of)") {
    val sql = TemporalSql.asofForward(spark, sfDir)
    val df = EventOps.asofJoinForward(spark, sfDir)
    assert(sql.columns.toSeq == df.columns.toSeq)
    val (s, d) = (rowsOf(sql), rowsOf(df))
    assert(s.nonEmpty && s == d)
  }

  test("TemporalSql.asofNearest == EventOps.asofJoinNearest (pure-SQL nearest as-of)") {
    val sql = TemporalSql.asofNearest(spark, sfDir)
    val df = EventOps.asofJoinNearest(spark, sfDir)
    assert(sql.columns.toSeq == df.columns.toSeq)
    val (s, d) = (rowsOf(sql), rowsOf(df))
    assert(s.nonEmpty && s == d)
  }

  test("TemporalSql.idleGaps == EventOps.idleGaps (pure-SQL segment sweep)") {
    val sql = TemporalSql.idleGaps(spark, sfDir)
    val df = EventOps.idleGaps(spark, sfDir)
    assert(sql.columns.toSeq == df.columns.toSeq)
    val (s, d) = (rowsOf(sql), rowsOf(df))
    assert(s.nonEmpty && s == d)
  }

  test("TemporalSql.retentionMatrix == EventOps.retentionMatrix (pure-SQL cohort triangle)") {
    val sql = TemporalSql.retentionMatrix(spark, sfDir)
    val df = EventOps.retentionMatrix(spark, sfDir)
    assert(sql.columns.toSeq == df.columns.toSeq)
    val (s, d) = (rowsOf(sql), rowsOf(df))
    assert(s.nonEmpty && s == d)
  }
}
