package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchOps

/** The sketch family's error contracts: the deterministic engine-exact
  * sketches (KMV, HLL registers, histogram quantiles) against their
  * published bounds, and Spark's builtin approximate aggregates
  * (approx_count_distinct / approx_percentile — NOT oracle-expressible,
  * so this differential spec is their correctness surface) against the
  * exact values.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: exact below k, within 3x rsd above k, deterministic") {
    // two groups: one tiny (< k: the sketch IS exact), one large
    val df = (0 until 30).map(i => ("small", i.toLong)) ++
      (0 until 5000).map(i => ("large", i.toLong))
    val frame = df.toDF("g", "v")
    val est = SketchOps.kmvDistinct(frame, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("small") == 30.0) // held < k => exact by construction
    val rsd = 1.0 / math.sqrt(SketchOps.KmvK - 2)
    assert(math.abs(est("large") - 5000.0) / 5000.0 <= 3 * rsd,
      s"kmv ${est("large")} vs 5000, 3*rsd=$rsd")
    // deterministic: same input, same estimate, any partitioning
    val again = SketchOps.kmvDistinct(frame.repartition(7), Seq("g"),
      col("v")).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again == est)
  }

  test("hllEstimate: raw regime within 3x rsd; registers merge by max") {
    val n = 10000 // >> 2.5m = 1280: the raw estimator's valid regime
    val frame = (0 until n).map(i => ("g", i.toLong)).toDF("g", "v")
    val regs = SketchOps.hllRegisters(frame, Seq("g"), col("v"))
    val est = SketchOps.hllEstimate(regs, Seq("g")).collect().head
    val rsd = 1.04 / math.sqrt(SketchOps.HllM)
    val rel = math.abs(est.getAs[Double]("hll_est") - n) / n.toDouble
    assert(rel <= 3 * rsd, s"hll ${est.getAs[Double]("hll_est")} vs $n")
    // mergeability: registers from two half-corpus runs, merged by max,
    // give the IDENTICAL register table — the partial-agg property a
    // 1000-executor rollup rests on
    val half1 = SketchOps.hllRegisters(frame.filter(col("v") < n / 2),
      Seq("g"), col("v"))
    val half2 = SketchOps.hllRegisters(frame.filter(col("v") >= n / 2),
      Seq("g"), col("v"))
    val merged = half1.unionByName(half2)
      .groupBy(col("g"), col("__bucket")).agg(max(col("__m")).as("__m"))
    val a = regs.collect().map(r => (r.getString(0), r.getInt(1),
      r.getInt(2))).sortBy(t => (t._1, t._2)).toSeq
    val b = merged.collect().map(r => (r.getString(0), r.getInt(1),
      r.getInt(2))).sortBy(t => (t._1, t._2)).toSeq
    assert(a == b)
  }

  test("hll registers: linear-counting correction (consumer-side) fixes small n") {
    // small cardinality (linear regime): raw overestimates wildly, the
    // shipped n_zero_registers lets a consumer apply m*ln(m/V0) — this
    // is WHY the report carries the zero-register count
    val n = 100
    val frame = (0 until n).map(i => ("g", i.toLong)).toDF("g", "v")
    val est = SketchOps.hllEstimate(
      SketchOps.hllRegisters(frame, Seq("g"), col("v")), Seq("g"))
      .collect().head
    val m = SketchOps.HllM.toDouble
    val z = est.getAs[Long]("n_zero_registers").toDouble
    val corrected = m * math.log(m / z)
    assert(math.abs(corrected - n) / n <= 0.15,
      s"linear-counting $corrected vs $n")
  }

  test("approxQuantiles: est <= exact < est + width, every group and p") {
    val rows = SketchOps.approxQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val width = r.getAs[Double]("max_abs_err")
      for (p <- Seq("p50", "p90", "p99")) {
        val est = r.getAs[Double](s"${p}_est")
        val exact = r.getAs[Double](s"${p}_exact")
        assert(est <= exact && exact < est + width + 1e-9,
          s"${r.getString(0)} $p: est=$est exact=$exact width=$width")
      }
    }
  }

  test("q_approx_error: kmv errors within 3x rsd wherever the sketch estimates") {
    val rows = SketchOps.approxError(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val rsd = 1.0 / math.sqrt(SketchOps.KmvK - 2)
    rows.foreach { r =>
      val exact = r.getAs[Long]("unique_orders_exact")
      val err = r.getAs[Double]("kmv_rel_err")
      if (exact < SketchOps.KmvK) assert(err == 0.0, s"row $r")
      else assert(err <= 3 * rsd, s"row $r")
    }
  }

  test("builtin approx_count_distinct / approx_percentile: differential bound") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.agg(countDistinct(col("l_orderkey"))).head.getLong(0)
    val approx = li.agg(approx_count_distinct(col("l_orderkey"), 0.05))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 5 * 0.05,
      s"approx_count_distinct $approx vs $exact")
    val exactP50 = li.stat.approxQuantile("l_extendedprice",
      Array(0.5), 0.0).head // relativeError=0 => exact
    val builtinP50 = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)))
      .head.getDouble(0)
    assert(math.abs(builtinP50 - exactP50) / exactP50 <= 0.05,
      s"approx_percentile $builtinP50 vs $exactP50")
  }

  test("q_monthly_trend_approx: both sketches within bound against exact") {
    import graft.operators.SketchOps
    val rsd = 1.0 / math.sqrt(SketchOps.KmvK - 2)
    val exact = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
      .groupBy(year(col("l_shipdate")).as("service_year"),
        month(col("l_shipdate")).as("service_month"))
      .agg(countDistinct(col("l_orderkey")).as("eo"),
        countDistinct(col("l_suppkey")).as("es"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val rows = SketchOps.monthlyTrendApprox(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length == exact.size)
    rows.foreach { r =>
      val (eo, es) = exact((r.getInt(0), r.getInt(1)))
      val ko = r.getAs[Double]("unique_orders_kmv")
      val ks = r.getAs[Double]("unique_suppliers_kmv")
      if (eo < SketchOps.KmvK) assert(ko == eo.toDouble, s"row $r")
      else assert(math.abs(ko - eo) / eo <= 3 * rsd, s"row $r")
      if (es < SketchOps.KmvK) assert(ks == es.toDouble, s"row $r")
      else assert(math.abs(ks - es) / es <= 3 * rsd, s"row $r")
    }
  }

  test("cmSketch: never underestimates, bounded size, mergeable by sum") {
    val rows = SketchOps.cmHeavyHitters(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the CM contract: min-of-d counters is always an overcount
    rows.foreach { r =>
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("exact_n"), s"row $r")
      assert(r.getAs[Long]("overestimate") >= 0L, s"row $r")
    }
    // bounded size: <= d*w counter rows per language however large the
    // vocabulary
    import graft.functions.TextFunctions.tokens
    val tok = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
    val sketch = SketchOps.cmSketch(tok, Seq("lang"), col("token"))
    val perLang = sketch.groupBy(col("lang")).count().collect()
    assert(perLang.forall(_.getLong(1) <= SketchOps.CmD * SketchOps.CmW))
    // mergeability: half-corpus sketches summed == whole-corpus sketch
    val h1 = SketchOps.cmSketch(tok.filter(col("lang") <= "en"),
      Seq("lang"), col("token"))
    val h2 = SketchOps.cmSketch(tok.filter(col("lang") > "en"),
      Seq("lang"), col("token"))
    val merged = h1.unionByName(h2)
      .groupBy(col("lang"), col("cm_row"), col("cm_col"))
      .agg(sum(col("cm_count")).as("cm_count"))
      .collect().map(_.toSeq).toSet
    assert(merged == sketch.collect().map(_.toSeq).toSet)
  }

  test("userOverlapKmv: set-algebra estimates within bound; exact when degenerate") {
    val rows = SketchOps.userOverlapKmv(spark, sfDir).collect()
    assert(rows.length == 3) // 3 type pairs
    val k = SketchOps.KmvK
    val rsd = 1.0 / math.sqrt(k - 2)
    rows.foreach { r =>
      val eu = r.getAs[Long]("exact_union").toDouble
      val ei = r.getAs[Long]("exact_inter").toDouble
      val ku = r.getAs[Double]("union_kmv")
      val ki = r.getAs[Double]("inter_kmv")
      if (eu < k) { // degenerate: complete sketches => exact by rule
        assert(ku == eu && ki == ei, s"row $r")
      } else {
        assert(math.abs(ku - eu) / eu <= 3 * rsd, s"union row $r")
        // intersection compounds the Jaccard ratio's ~1/sqrt(k) error
        // with the union estimate's — generous envelope, still a real
        // contract
        assert(math.abs(ki - ei) <= 0.5 * eu, s"inter row $r")
      }
    }
    // deterministic across runs
    val again = SketchOps.userOverlapKmv(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("userOverlapKmv: one events scan feeds sketches AND exact arm (staged collapse frames only)") {
    Engine.clearStaged(spark, blocking = true)
    SketchOps.userOverlapKmv(spark, sfDir).collect()
    // the staging doctrine hook: the frames staged are the distinct
    // (type,user) collapse, the <= k*types sketch, and the per-user
    // flags — no corpus ride-along columns
    val staged = Engine.stagedSchemas(spark)
    assert(staged.nonEmpty)
    assert(staged.forall(_.fields.forall(f =>
      !f.dataType.typeName.contains("array"))), staged.toString)
    Engine.clearStaged(spark, blocking = true)
  }

  test("sketch lifecycle: query side reads persisted sketches only (no raw scan), estimates == from-raw") {
    // build (idempotent: versioned model dir), then query
    SketchOps.sketchBuild(spark, sfDir).collect()
    val viaModel = SketchOps.sketchQuery(spark, sfDir)
    // steady-state plan must not touch lineitem — the whole point of
    // the persisted tier
    val plan = viaModel.queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem"), plan)
    // month->year register merge over the parquet round-trip equals the
    // from-raw year-level estimate
    val fromRaw = SketchOps.hllEstimate(
      SketchOps.hllRegisters(
        graft.Tables.lineitem(spark, sfDir)
          .filter(org.apache.spark.sql.functions.col("l_shipdate") >=
            org.apache.spark.sql.functions.lit("1996-01-01 00:00:00")
              .cast("timestamp"))
          .select(org.apache.spark.sql.functions.year(
            org.apache.spark.sql.functions.col("l_shipdate"))
            .as("service_year"),
            org.apache.spark.sql.functions.col("l_orderkey")),
        Seq("service_year"),
        org.apache.spark.sql.functions.col("l_orderkey")),
      Seq("service_year"))
      .orderBy("service_year")
    assert(viaModel.collect().map(_.toSeq).toSeq ==
      fromRaw.collect().map(_.toSeq).toSeq)
    // probe side: deterministic, persisted-only, never negative
    val probes = SketchOps.sketchProbe(spark, sfDir).collect()
    assert(probes.nonEmpty)
    assert(probes.forall(_.getAs[Long]("cm_est") >= 0L))
    val planP = SketchOps.sketchProbe(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!planP.contains("documents"), planP)
  }
}
