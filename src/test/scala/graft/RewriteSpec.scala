package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftSqlBridge.ofRows
import org.apache.spark.sql.functions._
import graft.operators.{GoldSql, SilverCleanse}
import graft.plans.SplitMultiDistinctAggregate

/** [[graft.plans.SplitMultiDistinctAggregate]]: differential correctness
  * (rewritten plan == stock plan, row for row) on the verbatim SQL gold
  * views and on synthetic edge cases (null group keys, global
  * aggregates, multi-arg distinct, sum/avg distinct), plan-shape
  * assertions (no Expand after the rewrite), bail-out cases, and the
  * SparkSessionExtensions wiring end-to-end.
  */
class RewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val silver = {
    val s = SilverCleanse.fromOrders(Tables.orders(spark, sfDir))
      .withColumn("processing_timestamp",
        lit("2024-01-01 00:00:00").cast("timestamp"))
    s.createOrReplaceTempView("silver_claims")
    GoldSql.createViews(spark)
    s
  }

  /** Stock result vs hand-applied-rule result. Doubles compare with
    * relative tolerance: SUM/AVG over IEEE doubles is
    * accumulation-order-dependent and the rewrite (like any
    * repartitioning) reorders it — stock Spark itself doesn't promise
    * bit-equality for those run-to-run. Everything else compares exact. */
  private def assertSame(df: DataFrame): Unit = {
    val analyzed = df.queryExecution.analyzed
    val rewritten = SplitMultiDistinctAggregate(analyzed)
    assert(rewritten != analyzed, "rule did not fire")
    // doubles enter the sort key ROUNDED (not blanked): rows identical on
    // the other columns still pair deterministically, while the per-cell
    // comparison below stays tolerance-based
    def key(r: org.apache.spark.sql.Row) =
      r.toSeq.map { case d: Double => f"$d%.6f" case v => String.valueOf(v) }
        .mkString("|")
    val a = df.collect().sortBy(key)
    val b = ofRows(spark, rewritten).collect().sortBy(key)
    assert(a.length == b.length, s"rows ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (ra, rb) =>
      ra.toSeq.zip(rb.toSeq).foreach {
        case (x: Double, y: Double) =>
          assert(x == y || math.abs(x - y) <= 1e-9 * math.max(math.abs(x), 1.0),
            s"$x vs $y in $ra / $rb")
        case (x, y) => assert(x == y, s"$x vs $y in $ra / $rb")
      }
    }
    // schema (names, order, types) must be preserved for parent operators
    assert(ofRows(spark, rewritten).schema == df.schema)
  }

  test("gold_provider_performance (2 distincts + percentile_disc): equal, no Expand") {
    silver
    val df = GoldSql.view(spark, "gold_provider_performance")
    assertSame(df)
    val plan = ofRows(spark,
      SplitMultiDistinctAggregate(df.queryExecution.analyzed))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }

  test("gold_member_activity and gold_recent_activity: equal under rewrite") {
    silver
    assertSame(GoldSql.view(spark, "gold_member_activity"))
    assertSame(GoldSql.view(spark, "gold_recent_activity"))
  }

  test("null group keys join null-safe; multi-arg distinct counts all-non-null rows") {
    val df = Seq[(Option[String], Option[Int], Option[Int], Double)](
      (Some("a"), Some(1), Some(10), 1.0), (Some("a"), Some(1), None, 2.0),
      (Some("a"), Some(2), Some(10), 3.0), (None, Some(3), Some(30), 4.0),
      (None, Some(3), Some(30), 5.0), (None, None, Some(40), 6.0))
      .toDF("k", "x", "y", "v")
    df.createOrReplaceTempView("t_nulls")
    val q = spark.sql("""SELECT k, count(DISTINCT x) AS dx,
        count(DISTINCT x, y) AS dxy, count(DISTINCT y) AS dy,
        sum(v) AS sv, count(*) AS n
      FROM t_nulls GROUP BY k""")
    assertSame(q)
    // spot-check semantics survived: count(distinct x,y) skips any-null rows
    val byK = q.collect().map(r => Option(r.get(0)) -> r).toMap
    assert(byK(Some("a")).getAs[Long]("dxy") == 2L) // (1,10), (2,10)
    assert(byK(None).getAs[Long]("dxy") == 1L)      // (3,30) twice, (null,40) skipped
  }

  test("global aggregate (no GROUP BY) with distincts + percentile: 1-row cross join") {
    silver
    val q = spark.sql("""SELECT count(DISTINCT member_id) AS m,
        count(DISTINCT provider_name) AS p,
        percentile_disc(0.5) WITHIN GROUP (ORDER BY claim_amount) AS med,
        sum(claim_amount) AS s, count(*) AS n
      FROM silver_claims""")
    assertSame(q)
  }

  test("sum/avg/min/max DISTINCT rewrite to plain aggs over deduped values") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 2.0))
      .toDF("k", "v")
    df.createOrReplaceTempView("t_dist")
    val q = spark.sql("""SELECT k, sum(DISTINCT v) AS sd, avg(DISTINCT v) AS ad,
        min(DISTINCT v) AS mn, max(DISTINCT v) AS mx, count(DISTINCT k, v) AS c2
      FROM t_dist GROUP BY k""")
    assertSame(q)
    val m = q.collect().map(r => r.getString(0) -> r).toMap
    assert(m("a").getAs[Double]("sd") == 4.0 && m("a").getAs[Double]("ad") == 2.0)
  }

  test("distinct over computed expressions; group expr reused inside aggregates") {
    val df = Seq(("a", "X", 1.0), ("a", "x", 2.0), ("a", "Y", 2.0),
      ("b", "z", 3.0), ("b", "Z", 3.0)).toDF("k", "s", "v")
    df.createOrReplaceTempView("t_expr")
    val q = spark.sql("""SELECT upper(k) AS ku, count(DISTINCT upper(s)) AS du,
        count(DISTINCT v) AS dv, max(upper(k)) AS mk, sum(v) AS sv
      FROM t_expr GROUP BY upper(k)""")
    assertSame(q)
    val m = q.collect().map(r => r.getString(0) -> r).toMap
    assert(m("A").getAs[Long]("du") == 2L && m("A").getAs[Long]("dv") == 2L)
    assert(m("B").getAs[String]("mk") == "B")
  }

  test("HAVING and ORDER BY above the rewritten aggregate still resolve") {
    silver
    val q = spark.sql("""SELECT provider_name, count(DISTINCT member_id) AS m,
        count(DISTINCT claim_id) AS c, count(*) AS n
      FROM silver_claims GROUP BY provider_name
      HAVING count(*) > 5 ORDER BY n DESC, provider_name""")
    assertSame(q)
    // ordering preserved end-to-end (assertSame sorts; check directly too)
    val ns = ofRows(spark,
      SplitMultiDistinctAggregate(q.queryExecution.analyzed))
      .collect().map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sorted.reverse)
  }

  test("percentile-family DISTINCT rides the dedup branch (shared per column), no Expand") {
    val df = Seq(("a", 1.0, 1), ("a", 1.0, 2), ("a", 3.0, 2), ("a", 5.0, 3),
      ("b", 2.0, 1), ("b", 2.0, 1), ("b", 4.0, 2)).toDF("k", "v", "x")
    df.createOrReplaceTempView("t_pdist")
    val q = spark.sql("""SELECT k, count(DISTINCT x) AS dx,
        percentile(DISTINCT v, 0.5) AS p50,
        percentile(DISTINCT v, 0.25) AS p25,
        median(DISTINCT v) AS md, sum(v) AS sv, count(*) AS n
      FROM t_pdist GROUP BY k""")
    assertSame(q)
    // DISTINCT percentile aggregates the DEDUPED values: k='a' has
    // values {1,1,3,5} → distinct {1,3,5} → median 3 (plain median = 2)
    val m = q.collect().map(r => r.getString(0) -> r).toMap
    assert(m("a").getAs[Double]("md") == 3.0)
    assert(m("a").getAs[Double]("p50") == 3.0)
    // all three percentile-family DISTINCTs over v share ONE dedup
    // branch (identity = data child, not the percentage tail): branches
    // are base + distinct-x + distinct-v = two joins, and no Expand
    val rewritten = SplitMultiDistinctAggregate(q.queryExecution.analyzed)
    val joins = rewritten.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size == 2, rewritten.toString)
    val plan = ofRows(spark, rewritten).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }

  test("single distinct + percentile: split by default (measured), conf-gated to stock") {
    silver
    val q = spark.sql("""SELECT provider_name,
      count(DISTINCT member_id) AS m,
      percentile_disc(0.5) WITHIN GROUP (ORDER BY claim_amount) AS med,
      count(*) AS n
      FROM silver_claims GROUP BY provider_name""")
    // default ON (measured ~3x on lineitem sf0.1 — see the rule comment):
    // equal results, 3 branches (base/dedup/percentile) = 2 joins, no
    // Expand, and the percentile buffer never rides a distinct-keyed
    // partial aggregate
    assertSame(q)
    val rewritten = SplitMultiDistinctAggregate(q.queryExecution.analyzed)
    val joins = rewritten.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size == 2, rewritten.toString)
    val plan = ofRows(spark, rewritten).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // conf OFF: the case bails to stock planAggregateWithOneDistinct
    spark.conf.set("spark.graft.split.singleDistinctPercentile", "false")
    try {
      assert(SplitMultiDistinctAggregate(q.queryExecution.analyzed)
        == q.queryExecution.analyzed)
      // the MULTI-distinct path must be unaffected by the conf
      val multi = GoldSql.view(spark, "gold_provider_performance")
      assert(SplitMultiDistinctAggregate(multi.queryExecution.analyzed)
        != multi.queryExecution.analyzed)
    } finally
      spark.conf.unset("spark.graft.split.singleDistinctPercentile")
  }

  test("bails out: single distinct set without percentile is left to stock planning") {
    silver
    val q = spark.sql(
      "SELECT provider_name, count(DISTINCT member_id) AS m, count(*) AS n " +
        "FROM silver_claims GROUP BY provider_name")
    assert(SplitMultiDistinctAggregate(q.queryExecution.analyzed)
      == q.queryExecution.analyzed)
  }

  test("bails out: non-replayable child (rand, TABLESAMPLE, LIMIT)") {
    silver
    val rand = spark.sql("""SELECT k, count(DISTINCT x) AS a, count(DISTINCT y) AS b
      FROM (SELECT provider_name AS k, rand() AS x, rand() AS y
            FROM silver_claims) GROUP BY k""")
    assert(SplitMultiDistinctAggregate(rand.queryExecution.analyzed)
      == rand.queryExecution.analyzed)
    val lim = spark.sql("""SELECT count(DISTINCT member_id) AS a,
        count(DISTINCT claim_id) AS b
      FROM (SELECT * FROM silver_claims LIMIT 100)""")
    assert(SplitMultiDistinctAggregate(lim.queryExecution.analyzed)
      == lim.queryExecution.analyzed)
    val samp = spark.sql("""SELECT count(DISTINCT member_id) AS a,
        count(DISTINCT claim_id) AS b
      FROM silver_claims TABLESAMPLE (50 PERCENT)""")
    assert(SplitMultiDistinctAggregate(samp.queryExecution.analyzed)
      == samp.queryExecution.analyzed)
  }

  test("AggPatterns: null distinct values skipped; null group keys survive the rejoin") {
    import graft.operators.AggPatterns
    val df = Seq[(Option[String], Option[Int])](
      (Some("a"), Some(1)), (Some("a"), None), (Some("a"), Some(2)),
      (None, Some(7)), (None, None), (None, Some(7)))
      .toDF("k", "x")
    // distinctCount must match countDistinct exactly, including NULLs
    val expected = df.groupBy($"k").agg(countDistinct($"x").as("dx"))
      .collect().map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    val got = AggPatterns.distinctCount(df, Seq("k"), $"x", "dx")
      .collect().map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got(None) == 1L && got(Some("a")) == 2L)
    // null-safe rejoin keeps the NULL-key group
    val main = df.groupBy($"k").agg(count(lit(1)).as("n"))
    val joined = AggPatterns.nullSafeKeyJoin(main,
      AggPatterns.distinctCount(df, Seq("k"), $"x", "dx"), Seq("k"))
      .collect().map(r => Option(r.get(0)) -> (r.getAs[Long]("n"), r.getAs[Long]("dx")))
      .toMap
    assert(joined(None) == ((3L, 1L)) && joined(Some("a")) == ((3L, 2L)))
  }

  test("FILTERed distinct aggregates: equal under rewrite, no Expand, groups kept") {
    silver
    val q = spark.sql("""SELECT provider_name,
        count(DISTINCT member_id) FILTER (WHERE claim_amount > 100) AS m,
        count(DISTINCT member_id) AS m_all,
        count(DISTINCT claim_id) AS c,
        sum(claim_amount) FILTER (WHERE claim_amount > 100) AS s,
        count(*) AS n
      FROM silver_claims GROUP BY provider_name""")
    assertSame(q)
    val plan = ofRows(spark,
      SplitMultiDistinctAggregate(q.queryExecution.analyzed))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // a group where NO row passes the filter must survive with m = 0:
    // the filter dedups as a grouping key, never as a pre-filter
    val all = Seq(("a", 1, 5.0), ("a", 2, 7.0), ("z", 3, 1.0))
      .toDF("k", "mid", "amt")
    all.createOrReplaceTempView("t_filter_groups")
    val fq = spark.sql("""SELECT k,
        count(DISTINCT mid) FILTER (WHERE amt > 4) AS hi,
        count(DISTINCT mid) AS total
      FROM t_filter_groups GROUP BY k""")
    assertSame(fq)
    val byK = fq.collect().map(r => r.getString(0) -> r).toMap
    assert(byK("z").getAs[Long]("hi") == 0L && byK("z").getAs[Long]("total") == 1L)
    assert(byK("a").getAs[Long]("hi") == 2L)
  }

  test("percentile_cont and approx_percentile are isolated like percentile_disc") {
    silver
    val q = spark.sql("""SELECT provider_name,
        count(DISTINCT member_id) AS m,
        percentile_cont(0.5) WITHIN GROUP (ORDER BY claim_amount) AS pc,
        approx_percentile(claim_amount, 0.5) AS ap,
        count(*) AS n
      FROM silver_claims GROUP BY provider_name""")
    assertSame(q)
    val plan = ofRows(spark,
      SplitMultiDistinctAggregate(q.queryExecution.analyzed))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // the buffer-collecting percentiles must not drag the base branch
    // into ObjectHashAggregate
    assert(plan.contains("HashAggregate"), plan)
  }

  test("collect_set/collect_list DISTINCT ride the dedup branch: equal, no Expand") {
    val df = Seq(("a", 1, 10), ("a", 1, 20), ("a", 3, 20), ("b", 2, 30),
      ("b", 2, 30), ("b", 7, 40)).toDF("k", "v", "w")
    df.createOrReplaceTempView("t_coll")
    // sort_array pins the (otherwise unspecified) array order so the
    // differential compare is exact in both plans; the second distinct
    // set (w) is what makes the stock plan Expand-shaped
    val q = spark.sql("""SELECT k,
        sort_array(collect_set(v)) AS cs,
        sort_array(collect_list(DISTINCT v)) AS cl,
        count(DISTINCT w) AS dw, sum(v) AS sv
      FROM t_coll GROUP BY k""")
    assertSame(q)
    val plan = ofRows(spark,
      SplitMultiDistinctAggregate(q.queryExecution.analyzed))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    val m = q.collect().map(r => r.getString(0) -> r).toMap
    assert(m("a").getSeq[Int](1) == Seq(1, 3) && m("a").getSeq[Int](2) == Seq(1, 3))
  }

  test("stddev/variance/corr/bool/bit DISTINCT ride the dedup branch") {
    val df = Seq(("a", 1.0, 2.0, true, 6), ("a", 1.0, 2.0, true, 6),
      ("a", 3.0, 5.0, false, 12), ("b", 2.0, 2.0, true, 7),
      ("b", 4.0, 9.0, true, 7), ("b", 4.0, 9.0, true, 5)).toDF("k", "x", "y", "p", "m")
    df.createOrReplaceTempView("t_stats")
    val q = spark.sql("""SELECT k,
        stddev(DISTINCT x) AS sd, var_samp(DISTINCT x) AS vs,
        corr(DISTINCT x, y) AS cr,
        bool_and(DISTINCT p) AS ba, bit_and(DISTINCT m) AS bm,
        approx_count_distinct(DISTINCT x) AS acd,
        count(DISTINCT y) AS dy, count(*) AS n
      FROM t_stats GROUP BY k""")
    assertSame(q)
    val plan = ofRows(spark,
      SplitMultiDistinctAggregate(q.queryExecution.analyzed))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // semantics spot-check: distinct-dedup actually happened
    val m = q.collect().map(r => r.getString(0) -> r).toMap
    // a: distinct x = {1,3} -> var_samp = 2.0 (plain var over 1,1,3 would be 4/3)
    assert(math.abs(m("a").getAs[Double]("vs") - 2.0) < 1e-9)
    assert(m("b").getAs[Int]("bm") == (7 & 5))
  }

  test("first/last DISTINCT ride the dedup branch and return a distinct value") {
    // single distinct value per group => first/last are fully determined,
    // so the differential compare is exact
    val one = Seq(("a", 5, 1), ("a", 5, 2), ("b", 9, 3)).toDF("k", "v", "w")
    one.createOrReplaceTempView("t_first1")
    val q1 = spark.sql("""SELECT k, first(DISTINCT v) AS fv, last(DISTINCT v) AS lv,
        count(DISTINCT w) AS dw, count(*) AS n
      FROM t_first1 GROUP BY k""")
    assertSame(q1)
    // multi-valued group: assert membership (the value is unspecified in
    // stock Spark too), plus plan shape; w adds the second distinct set
    val many = Seq(("a", 1, 5), ("a", 2, 6), ("a", 2, 6), ("b", 7, 8))
      .toDF("k", "v", "w")
    many.createOrReplaceTempView("t_firstN")
    val qn = spark.sql("""SELECT k, first(DISTINCT v) AS fv,
        count(DISTINCT w) AS dw, max(v) AS mx
      FROM t_firstN GROUP BY k""")
    val rewritten = SplitMultiDistinctAggregate(qn.queryExecution.analyzed)
    assert(rewritten != qn.queryExecution.analyzed, "rule did not fire")
    val plan = ofRows(spark, rewritten).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    val got = ofRows(spark, rewritten).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(Set(1, 2).contains(got("a")) && got("b") == 7)
  }

  test("DISTINCT percentile mixes with plain percentile + distinct: equal under rewrite") {
    silver
    // once excluded (the percentage literal lives in children), now
    // supported: only the DATA child joins the dedup key, the foldable
    // tail rides verbatim — the mixed shape must stay correct
    val q = spark.sql("""SELECT provider_name,
        percentile_disc(0.5) WITHIN GROUP (ORDER BY claim_amount) AS med,
        count(DISTINCT member_id) AS m,
        percentile(DISTINCT claim_amount, 0.5) AS pd
      FROM silver_claims GROUP BY provider_name""")
    assertSame(q)
  }

  test("bails out: percentile with a non-foldable frequency argument") {
    silver
    // percentile's 3rd argument is a PER-ROW frequency column here —
    // deduping on the value alone would change its semantics
    val q = spark.sql("""SELECT provider_name,
        count(DISTINCT member_id) AS m,
        percentile(DISTINCT claim_amount, 0.5,
          CAST(service_day AS BIGINT)) AS pw
      FROM silver_claims GROUP BY provider_name""")
    assert(SplitMultiDistinctAggregate(q.queryExecution.analyzed)
      == q.queryExecution.analyzed)
  }

  test("SparkSessionExtensions wiring: native expressions resolve as SQL functions") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      Engine.configure(ext)
      // scalar kernels: SQL result == the DataFrame API's native column
      val row = ext.sql(s"""SELECT
        graft_nfc('é') AS nfc,
        graft_vector_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
                         CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS dot,
        graft_vector_l2sq(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
                          CAST(array(4.0, 6.0) AS ARRAY<FLOAT>)) AS l2,
        graft_simhash48(array('a b', 'b c')) AS sh,
        size(graft_minhash_bands(array('a b', 'b c'), 12, 3)) AS nbands
        """).head()
      assert(row.getAs[String]("nfc") == "é")
      assert(row.getAs[Double]("dot") == 32.0)
      assert(row.getAs[Double]("l2") == 25.0)
      import graft.functions.TextFunctions.simhash48
      val dfSh = ext.range(1).select(
        simhash48(org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit("a b"),
          org.apache.spark.sql.functions.lit("b c"))).as("sh"))
        .head().getAs[Long]("sh")
      assert(row.getAs[Long]("sh") == dfSh)
      assert(row.getAs[Int]("nbands") == 4) // 12 components in bands of 3
      // bounded aggregate: cap respected, NULL once exceeded
      ext.range(3).createOrReplaceTempView("_ids")
      val agg = ext.sql("""SELECT
        graft_bounded_collect_set(id, 5) AS ok,
        graft_bounded_collect_set(id, 2) AS over
        FROM _ids""").head()
      assert(agg.getAs[Seq[Long]]("ok").toSet == Set(0L, 1L, 2L))
      assert(agg.isNullAt(agg.fieldIndex("over")))
      // shape args must be literals — a column reference is a plan-time error
      val err = intercept[Exception] {
        ext.sql("SELECT graft_bounded_collect_set(id, CAST(id AS INT)) FROM _ids").collect()
      }
      assert(err.getMessage.contains("INT literal"), err.getMessage)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("SparkSessionExtensions wiring: verbatim SQL optimizes without Expand") {
    silver // materialize the fixture on the shared session first
    val stock = GoldSql.view(spark, "gold_provider_performance")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("total_claims"))
      .sortBy(_._1)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        // NOT .config("spark.sql.extensions", ...): that conf is static,
        // read from the SparkContext, and silently ignored when the
        // builder attaches to an existing context (as here)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      Engine.configure(ext)
      assert(ext ne spark) // a genuinely new session over the same context
      SilverCleanse.fromOrders(Tables.orders(ext, sfDir))
        .withColumn("processing_timestamp",
          lit("2024-01-01 00:00:00").cast("timestamp"))
        .createOrReplaceTempView("silver_claims")
      GoldSql.createViews(ext)
      val df = GoldSql.view(ext, "gold_provider_performance")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("Expand"), optimized)
      assert(optimized.contains("Join"), optimized)
      val got = df.collect()
        .map(r => r.getString(0) -> r.getAs[Long]("total_claims"))
        .sortBy(_._1)
      assert(got.sameElements(stock))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
