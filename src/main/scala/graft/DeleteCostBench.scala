package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SnapshotTable

/** Row-level-DELETE cost vs partition size — the round-13 perf-weak's
  * "done" evidence: before round 14 a k-key delete rewrote its whole
  * PARTITIONS (cost ∝ partition size — at month-grain on 100 TB,
  * correcting one claim rewrote whole months); with file-granular
  * copy-on-write the rewrite is ∝ the files that hold the keys, and
  * with merge-on-read it is ∝ k alone. So the curves must be:
  * `delete_mor_ms` FLAT in partition size; `delete_cow_ms` tracking
  * FILE size (rows/file held constant here, so ~flat too), both
  * decoupled from the partition's total rows.
  *
  * Table shape per size N: ONE month partition holding N rows split
  * over N/rowsPerFile key-clustered files (claim_id zones committed);
  * the doomed set is 40 keys spread over 4 files. Timed: deleteKeysMor
  * (delete-file commit) and deleteKeys (file-granular COW rewrite),
  * each on a fresh truncate of the same base.
  *
  * Usage: `sbt "runMain graft.DeleteCostBench"` → one JSON line,
  * archived as bench_archive/delete_cost_r14.json.
  */
object DeleteCostBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("delete-cost-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rowsPerFile = 50000
    val sizes = Seq(200000, 800000, 3200000) // 4 → 64 files, one partition
    val results = sizes.map { n =>
      val dir = s"target/delete_cost_bench/n$n"
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val files = n / rowsPerFile
      val base = spark.range(n.toLong).select(
        format_string("K%09d", col("id")).as("claim_id"),
        lit("b1").as("batch_id"),
        (col("id") % 1000).cast("double").as("claim_amount"),
        lit(2000).as("service_year"), lit(1).as("service_month"))
      SnapshotTable.append(spark, dir, base
        .repartitionByRange(files, col("claim_id"))
        .sortWithinPartitions(col("claim_id")),
        statsColumns = Seq("claim_id"), rebalance = false)
      // 40 doomed keys spread over the first 4 files' key ranges
      val doomed = (0 until 40)
        .map(i => f"K${(i % 4) * rowsPerFile + i * 7}%09d")
        .toDF("claim_id")
      def timed(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      val morMs = timed { SnapshotTable.deleteKeysMor(spark, dir, doomed) }
      SnapshotTable.truncateTo(spark, dir, 1)
      val cowMs = timed { SnapshotTable.deleteKeys(spark, dir, doomed) }
      val rewritten = files -
        SnapshotTable.manifest(spark, dir, 1).files.toSet
          .intersect(SnapshotTable.manifest(spark, dir,
            SnapshotTable.latestVersion(spark, dir)).files.toSet).size
      Map("partition_rows" -> n, "files" -> files,
        "delete_mor_ms" -> morMs, "delete_cow_ms" -> cowMs,
        "cow_files_rewritten" -> rewritten)
    }
    def j(v: Any): String = v match {
      case m: Map[_, _] => m.map { case (k, x) => s""""$k":${j(x)}""" }
        .mkString("{", ",", "}")
      case s: Seq[_] => s.map(j).mkString("[", ",", "]")
      case d: Double => f"$d%.2f"
      case s: String => s""""$s""""
      case x => x.toString
    }
    println(j(Map("metric" -> "delete_cost_vs_partition_size",
      "unit" -> "ms", "keys_deleted" -> 40, "rows_per_file" -> rowsPerFile,
      "sizes" -> results)))
    spark.stop()
  }
}
