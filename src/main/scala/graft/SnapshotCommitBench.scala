package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.operators.SnapshotTable

/** Commit-cost-vs-live-file-count curve for the chunked snapshot
  * metadata (round-11 VERDICT #1's "done" evidence): a FLAT-manifest
  * design rewrites every live file's entry per commit, so commit cost
  * grows linearly with table size; the two-level chunked design writes
  * one new chunk + a bounded root, so the curve must stay ~flat as the
  * table grows 64x.
  *
  * The harness is metadata-only ([[SnapshotTable.commitFiles]] with
  * synthetic file names, no stats columns): no parquet is read or
  * written, so the measured milliseconds are purely the commit
  * protocol — chunk write + root compose + CAS publish (+ the
  * amortized size-tier merges, which is why the MEDIAN is the
  * headline and p95 shows the merge spikes).
  *
  * Usage: `sbt "runMain graft.SnapshotCommitBench"` → one JSON line
  * with, per live-file count N: median/p95 append-commit ms and a
  * 1-partition overwrite-commit ms. Archived as
  * bench_archive/commit_cost_r12.json.
  */
object SnapshotCommitBench {

  private def fileName(part: Int, i: Int): String =
    f"service_year=${2000 + part / 12}/service_month=${1 + part % 12}%d/" +
      f"part-$i%08d.parquet"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("snapshot-commit-bench")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 256k added in round 14 with the range-adjacent tier merge: the
    // wide-range merged blobs that made overwrite cost creep 80→219 ms
    // from 1k→64k are gone, so the curve must stay flat to here
    val sizes = Seq(1000, 4000, 16000, 64000, 256000)
    val parts = 48 // 4 years of months
    val results = sizes.map { n =>
      val dir = s"target/commit_bench/n$n"
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // seed the table to N live files in 32-commit increments — the
      // realistic shape (a table grows by appends), which also leaves
      // the chunk tiers in their organic merged state
      val perSeed = math.max(1, n / 32)
      var written = 0
      var seedCommit = 0
      while (written < n) {
        val batch = (written until math.min(n, written + perSeed))
          .map(i => fileName(i % parts, i))
        SnapshotTable.commitFiles(spark, dir, "seed", batch)
        written += batch.size
        seedCommit += 1
      }
      // timed: 21 single-partition append commits of 4 files each
      val appendMs = (0 until 21).map { k =>
        val batch = (0 until 4).map(i => fileName(k % parts,
          1000000 + k * 10 + i))
        val t0 = System.nanoTime()
        SnapshotTable.commitFiles(spark, dir, "append", batch)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      // timed: one copy-on-write overwrite of a single partition
      val ovBatch = (0 until 4).map(i => fileName(3, 2000000 + i))
      val t0 = System.nanoTime()
      SnapshotTable.commitFiles(spark, dir, "overwrite", ovBatch,
        replacedPrefixes = Seq("service_year=2000/service_month=4/"))
      val overwriteMs = (System.nanoTime() - t0) / 1e6
      val live = SnapshotTable.manifest(spark, dir,
        SnapshotTable.latestVersion(spark, dir)).files.size
      Map(
        "n" -> n, "live_files" -> live,
        "append_ms_median" -> appendMs(appendMs.size / 2),
        "append_ms_p95" -> appendMs((appendMs.size * 95) / 100),
        "overwrite_1part_ms" -> overwriteMs)
    }
    def j(v: Any): String = v match {
      case m: Map[_, _] => m.map { case (k, x) => s""""$k":${j(x)}""" }
        .mkString("{", ",", "}")
      case s: Seq[_] => s.map(j).mkString("[", ",", "]")
      case d: Double => f"$d%.2f"
      case s: String => s""""$s""""
      case x => x.toString
    }
    println(j(Map("metric" -> "snapshot_commit_cost", "unit" -> "ms",
      "sizes" -> results)))
    spark.stop()
  }
}
