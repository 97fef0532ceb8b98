package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SnapshotTable

/** Per-file Bloom index cost/benefit vs TABLE size — the round-15
  * equality-pruning evidence: on a HASH-distributed key column every
  * file's min/max zone spans the whole key domain, so the zone probe
  * keeps ~every live file and a 10-key lookup (or keyed DML's verify
  * scan) reads O(table). The Bloom sidecar answers the equality
  * question zones can't: as files grow 16 → 64 → 256 (rows 16×),
  * `files_bloom` must stay ~flat at ~|keys| while `files_zone` grows
  * linearly — and the lookup's wall-clock follows its file count.
  * Build cost (`build_ms`, one distributed scan + one metadata commit)
  * and sidecar footprint (`sidecar_kb`) are recorded so the index's
  * price is part of the same record.
  *
  * Usage: `sbt "runMain graft.BloomCostBench"` → one JSON line,
  * archived as bench_archive/bloom_cost_r15.json.
  */
object BloomCostBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("bloom-cost-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val rowsPerFile = 25000
    val fileCounts = Seq(16, 64, 256)
    val results = fileCounts.map { nf =>
      val dir = s"target/bloom_cost_bench/f$nf"
      val path = new Path(dir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
      val n = nf.toLong * rowsPerFile
      val base = spark.range(n).select(
        format_string("K%09d", col("id")).as("claim_id"),
        lit("b1").as("batch_id"),
        (col("id") % 1000).cast("double").as("claim_amount"),
        lit(2000).as("service_year"),
        lit(1).as("service_month"))
      // hash-distributed: every file spans ~the whole claim_id domain
      SnapshotTable.append(spark, dir,
        base.repartition(nf, col("claim_id")),
        statsColumns = Seq("claim_id"), rebalance = false)
      val keys = (0 until 10).map(i => f"K${i * (n / 10)}%09d")
      import spark.implicits._
      val keysDf = keys.toDF("claim_id")
      val v = SnapshotTable.latestVersion(spark, dir)
      // zone-only probe (what the lookup costs without the index)
      val t0 = System.nanoTime()
      val zoneCands = SnapshotTable.candidateFilesByKeyZone(
        spark, dir, keysDf, "claim_id", v)
      val zoneProbeMs = (System.nanoTime() - t0) / 1e6
      // build the index (one scan + one metadata-only commit)
      val t1 = System.nanoTime()
      SnapshotTable.buildFileBlooms(spark, dir, Seq("claim_id"))
      val buildMs = (System.nanoTime() - t1) / 1e6
      val sidecarKb = {
        val bl = new Path(s"$dir/_snapshots/blooms")
        fs.listStatus(bl).map(s =>
          fs.getContentSummary(s.getPath).getLength).sum / 1024
      }
      // indexed lookup end-to-end (probe + pruned read)
      val t2 = System.nanoTime()
      val (df, live, scanned) = SnapshotTable.readKeysPlanned(
        spark, dir, keysDf, "claim_id")
      val got = df.count()
      val lookupMs = (System.nanoTime() - t2) / 1e6
      require(got == 10, s"lookup must find its 10 keys, got $got")
      Map("files" -> nf, "rows" -> n,
        "files_zone" -> zoneCands.size, "files_bloom" -> scanned,
        "files_live" -> live,
        "zone_probe_ms" -> zoneProbeMs, "build_ms" -> buildMs,
        "sidecar_kb" -> sidecarKb, "lookup_ms" -> lookupMs)
    }
    def j(v: Any): String = v match {
      case m: Map[_, _] => m.map { case (k, x) => s""""$k":${j(x)}""" }
        .mkString("{", ",", "}")
      case s: Seq[_] => s.map(j).mkString("[", ",", "]")
      case d: Double => f"$d%.2f"
      case s: String => s""""$s""""
      case x => x.toString
    }
    println(j(Map("metric" -> "bloom_lookup_cost_vs_table_size",
      "unit" -> "ms", "rows_per_file" -> rowsPerFile,
      "lookup_keys" -> 10, "sizes" -> results)))
    spark.stop()
  }
}
