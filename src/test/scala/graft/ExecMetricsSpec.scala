package graft

import org.apache.spark.sql.functions._
import graft.operators.ExecMetrics

/** Pins for the runtime-metrics surface (round-10 VERDICT #2): the
  * listener capture path works, partition pruning is VISIBLE in the
  * reported metrics (not just in the plan), and the full dashboard feed
  * carries the scan/shuffle observables a Prometheus exporter would
  * scrape. Value-level truth of the deterministic summary is the DuckDB
  * oracle's job (q_exec_metrics). */
class ExecMetricsSpec extends SparkSpec {

  private lazy val summary: Map[String, Long] =
    ExecMetrics.execMetricsProbe(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("partition pruning is visible in the reported metrics") {
    assert(summary("partitions_scanned") > 0)
    assert(summary("partitions_total") > summary("partitions_scanned"),
      summary.toString)
    assert(summary("partitions_pruned") ==
      summary("partitions_total") - summary("partitions_scanned"))
    assert(summary("rows_read") > 0)
    assert(summary("groups_out") > 0)
    // the probe reads strictly less than the table: pruning actually
    // bounded the scan
    val tableDir = s"target/exec_metrics/sf0.001/silver"
    val allRows = spark.read.parquet(tableDir).count()
    assert(summary("rows_read") < allRows)
  }

  test("listener capture returns the probe execution") {
    summary // ensure fixture exists
    val tableDir = s"target/exec_metrics/sf0.001/silver"
    val probe = ExecMetrics.probeOf(spark, tableDir)
    val caught = ExecMetrics.captureExecutions(spark,
      () => probe.write.format("noop").mode("overwrite").save())
    assert(caught.nonEmpty)
    val scans = ExecMetrics.walkFinalPlan(caught.last.qe.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
  }

  test("full metric feed carries scan and shuffle observables") {
    summary
    val tableDir = s"target/exec_metrics/sf0.001/silver"
    val probe = ExecMetrics.probeOf(spark, tableDir)
    val caught = ExecMetrics.captureExecutions(spark,
      () => probe.write.format("noop").mode("overwrite").save())
    val feed = ExecMetrics.metricRows(spark, caught.last.qe).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[String]("metric"),
        r.getAs[Long]("value")))
    // scan observables
    assert(feed.exists { case (n, m, v) =>
      n.contains("Scan") && m == "numFiles" && v > 0 })
    assert(feed.exists { case (n, m, v) =>
      n.contains("Scan") && m == "numPartitions" && v > 0 })
    // the groupBy's exchange published shuffle write metrics
    assert(feed.exists { case (_, m, v) =>
      m.toLowerCase.contains("shuffle") && v > 0 }, feed.mkString("\n"))
    // the Prometheus rendering is grammar-valid and carries the same
    // observables
    val prom = ExecMetrics.prometheusText("probe", caught.last.qe)
    val line = """graft_[a-z0-9_]+\{query="[a-z0-9_]+",node="[a-z0-9_]+",node_id="\d+"\} -?\d+""".r
    val lines = prom.linesIterator.toSeq
    assert(lines.nonEmpty)
    lines.foreach(l => assert(line.matches(l), l))
    assert(lines.exists(_.startsWith("graft_num_files")), prom.take(500))
  }

  test("metrics log: date-partitioned appends carry feed AND summary series") {
    ExecMetrics.metricsHistory(spark, sfDir) // builds + reads the log
    val leaf = sfDir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last
    val logDir = s"target/exec_metrics/$leaf/metrics_log"
    // the log is partitioned by log_date on disk (retention = partition op)
    assert(new java.io.File(s"$logDir/log_date=2024-01-01").isDirectory)
    val log = spark.read.parquet(logDir)
    // three captures, distinct scrape stamps
    assert(log.select("captured_at").distinct().count() == 3)
    // full dashboard feed rows (node-level) present alongside the
    // summary series, never only the summary
    assert(log.filter(col("node") =!= "summary")
      .filter(col("metric") === "numFiles").count() >= 3)
    // summary series is constant across captures for every metric
    val drift = log.filter(col("node") === "summary")
      .groupBy("metric")
      .agg(countDistinct(col("value")).as("nv"))
      .filter(col("nv") =!= 1)
    assert(drift.isEmpty, drift.collect().mkString(","))
  }
}
