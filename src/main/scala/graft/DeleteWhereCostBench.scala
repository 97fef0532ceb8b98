package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SnapshotTable

/** deleteWhere (positional/DV delete by predicate) cost vs TABLE size —
  * the round-14 perf-weak's "done" evidence: before round 15 the
  * matching scan read EVERY live file (O(table)); with the partition +
  * zone pruning it reads only the files whose partition range and
  * amount zones intersect the predicate's bounds. So as untouched
  * partitions multiply (4 → 16 → 64 months, rows and files growing
  * 16×), `files_scanned` and `delete_ms` must stay FLAT while
  * `files_total` grows linearly — "purge claims over X in period Y"
  * reads period Y's intersecting files, never the table.
  *
  * Table shape per size P: P month partitions × `filesPerPart`
  * amount-clustered files (claim_amount zones committed), equal rows
  * per partition. The purge: amounts ≥ 990 in ONE month, passed with
  * the partition hint + the amount ZonePredicate the predicate implies.
  *
  * Usage: `sbt "runMain graft.DeleteWhereCostBench"` → one JSON line,
  * archived as bench_archive/delete_where_cost_r15.json.
  */
object DeleteWhereCostBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("delete-where-cost-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val rowsPerPart = 100000
    val filesPerPart = 4
    val parts = Seq(4, 16, 64)
    val results = parts.map { p =>
      val dir = s"target/delete_where_cost_bench/p$p"
      val path = new Path(dir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
      val n = p.toLong * rowsPerPart
      val base = spark.range(n).select(
        format_string("K%09d", col("id")).as("claim_id"),
        lit("b1").as("batch_id"),
        (col("id") % 1000).cast("double").as("claim_amount"),
        (lit(2000) + (col("id") % p) / 12).cast("int")
          .as("service_year"),
        ((col("id") % p) % 12 + 1).cast("int").as("service_month"))
      // amount-clustered within each partition: every range task holds
      // one narrow amount band and writes it to every month dir
      SnapshotTable.append(spark, dir, base
        .repartitionByRange(filesPerPart, col("claim_amount"))
        .sortWithinPartitions(col("claim_amount")),
        statsColumns = Seq("claim_amount"), rebalance = false)
      val t0 = System.nanoTime()
      val planned = SnapshotTable.deleteWherePlanned(spark, dir,
        col("claim_amount") >= 990.0 &&
          col("service_year") === 2000 && col("service_month") === 1,
        parts = Some(Seq((Some(2000), Some(1)))),
        zones = Seq(SnapshotTable.ZonePredicate.num("claim_amount",
          990.0, Double.MaxValue)))
      val ms = (System.nanoTime() - t0) / 1e6
      val (_, total, scanned) = planned.get
      val remaining = SnapshotTable.read(spark, dir).count()
      Map("partitions" -> p, "rows" -> n, "files_total" -> total,
        "files_scanned" -> scanned, "delete_ms" -> ms,
        "rows_deleted" -> (n - remaining))
    }
    def j(v: Any): String = v match {
      case m: Map[_, _] => m.map { case (k, x) => s""""$k":${j(x)}""" }
        .mkString("{", ",", "}")
      case s: Seq[_] => s.map(j).mkString("[", ",", "]")
      case d: Double => f"$d%.2f"
      case s: String => s""""$s""""
      case x => x.toString
    }
    println(j(Map("metric" -> "delete_where_cost_vs_table_size",
      "unit" -> "ms", "rows_per_partition" -> rowsPerPart,
      "files_per_partition" -> filesPerPart, "sizes" -> results)))
    spark.stop()
  }
}
