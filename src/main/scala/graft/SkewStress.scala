package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{EventOps, ExecMetrics}

/** Flash-crowd skew stress for the bucketized temporal joins — the
  * committed, reproducible form of the round-9 ad-hoc measurement,
  * sized so AQE's skew thresholds actually trigger (round-10 VERDICT
  * #6: re-measure at 10× where the hot partition crosses the 256 MB
  * skew threshold).
  *
  * Fixture (deterministic range arithmetic, no RNG): `pointsM` million
  * points, HALF of them on ONE (user_id=0, hour) bucket — the
  * adversarial shape for a join that hashes on (keys, bucket), since a
  * time-distributed celebrity key is already spread across buckets by
  * construction. `intervalsM` million 1-hour intervals spread over
  * `Users` users × `Hours` hours (user 0 holds intervals too, so the
  * hot bucket joins). Broadcast disabled to force the shuffled join.
  *
  * Arms: AQE skew-join ON vs OFF, 2 reps each (first rep carries
  * codegen warmup — compare rep 2). The final adaptive plan is walked
  * ([[ExecMetrics.walkFinalPlan]]) for `isSkew=true` SMJ markers, so
  * the output RECORDS whether the skew split actually engaged rather
  * than inferring it from timings.
  *
  * Usage: runMain graft.SkewStress [pointsM] [intervalsM]
  * (defaults 40 / 15 — 10× the round-9 fixture; the hot partition
  * carries pointsM/2 rows ≈ 0.5 GB at 40M, past the 256 MB
  * threshold).
  */
object SkewStress {

  private val Users = 100000L
  private val Hours = 720L
  private val HotHour = 100L
  private val BaseUs = 1700000000000000L // fixed epoch anchor (µs)
  private val HourUs = 3600L * 1000000L

  private def points(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      when(col("id") % 2 === 0, expr("id div 2") % Users + 1)
        .otherwise(lit(0L)).as("user_id"),
      timestamp_micros(
        when(col("id") % 2 === 0,
          lit(BaseUs) + (expr("id div 2") % Hours) * HourUs +
            (col("id") % 3600L) * 1000000L)
          .otherwise(lit(BaseUs) + lit(HotHour * HourUs) +
            (col("id") % 3600L) * 1000000L)).as("ts"),
      col("id").as("event_id"))

  private def intervals(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      (col("id") % Users).as("user_id"),
      timestamp_micros(lit(BaseUs) +
        ((expr("id div 100000") % Hours)) * HourUs).as("start_ts"),
      timestamp_micros(lit(BaseUs) +
        ((expr("id div 100000") % Hours) + 1L) * HourUs - 1000000L)
        .as("end_ts"),
      col("id").as("interval_id"))

  def main(args: Array[String]): Unit = {
    val pointsN = args.headOption.map(_.toLong).getOrElse(40L) * 1000000L
    val intervalsN = args.drop(1).headOption.map(_.toLong)
      .getOrElse(15L) * 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    // arms: (skew-join enabled, threshold override). LZ4 shuffle
    // compression keeps even a 20M-row hot partition under the 256 MB
    // default threshold, so the "tuned" arm lowers it to what a cluster
    // operator running this shape would set — the arm that PROVES the
    // split engages and measures what it buys.
    val arms = Seq(
      ("on_default", true, None),
      ("on_tuned", true, Some(("64m", "32m"))),
      ("off", false, None))
    for ((label, skewOn, tuned) <- arms; rep <- 1 to 2) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        skewOn.toString)
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        tuned.map(_._1).getOrElse("256m"))
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        tuned.map(_._2).getOrElse("64m"))
      val joined = EventOps.rangeJoinOf(
        points(spark, pointsN), intervals(spark, intervalsN),
        Seq("user_id"), "ts", "start_ts", "end_ts", bucketSec = 3600L)
      var skewMarkers = 0
      var rows = -1L
      val t0 = System.nanoTime()
      val captured = ExecMetrics.captureExecutions(spark, () =>
        joined.write.format("noop").mode("overwrite").save())
      val sec = (System.nanoTime() - t0) / 1e9
      captured.lastOption.foreach { c =>
        val nodes = ExecMetrics.walkFinalPlan(c.qe.executedPlan)
        skewMarkers = nodes.count {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            j.isSkewJoin
          case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
            j.isSkewJoin
          case _ => false
        }
        rows = nodes.collectFirst {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            j.metrics("numOutputRows").value
          case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
            j.metrics("numOutputRows").value
        }.getOrElse(-1L)
      }
      results += f"""{"arm":"$label","rep":$rep,"sec":$sec%.2f,""" +
        s""""skew_marked_joins":$skewMarkers,"join_rows":$rows}"""
      // free shuffle debris between arms
      System.gc()
    }
    println(s"""{"fixture":{"points":$pointsN,"intervals":$intervalsN,""" +
      s""""hot_share":0.5,"users":$Users,"hours":$Hours},""" +
      s""""arms":[${results.mkString(",")}]}""")
    spark.stop()
  }
}
