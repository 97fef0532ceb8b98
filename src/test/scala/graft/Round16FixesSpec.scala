package graft

import java.io.File
import org.apache.spark.sql.functions._
import graft.operators.SnapshotTable

/** Round-16 pins, headline: TARGET-FILE-SIZE WRITES. Before this
  * round the staged writer fanned out one file per (task × partition
  * value) — a 32-task append touching ~90 (year,month) partitions
  * committed thousands of ~12 KB files (measured: 4,694 files for a
  * 59 MB table), the classic small-files killer at 100 TB. The writer
  * now AQE-rebalances by the table's partition columns before
  * `partitionBy` (the Delta optimizeWrite / Iceberg
  * write.distribution-mode=hash equivalent): small post-shuffle
  * partitions coalesce to the advisory size, skewed ones split — so a
  * small append lands ~1 file per touched partition and a huge
  * single-partition append still parallelizes into advisory-sized
  * files. Callers that pre-shape the frame (z-order clustering,
  * key-range clustering, deliberate hash fan-out in Bloom demos) pass
  * `rebalance = false` and keep their layout.
  */
class Round16FixesSpec extends SparkSpec {

  import spark.implicits._

  private val base = "target/test_round16_fixes"

  private def wipe(dir: String): Unit = {
    def del(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del); f.delete()
    }
    val root = new File(dir)
    if (root.exists()) del(root)
  }

  test("append files-per-commit is bounded by partitions touched, not tasks x partitions") {
    val dir = s"$base/writer_sizing"
    wipe(dir)
    // 3 months, deliberately spread over 32 upstream tasks — the exact
    // shape that used to fan out to up to 96 files
    val df = (0 until 3000).map(i =>
        (f"K$i%05d", "b1", i * 1.0, 2000, 1 + i % 3))
      .toDF("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month")
      .repartition(32)
    SnapshotTable.append(spark, dir, df)
    val files = SnapshotTable.manifest(spark, dir, 1).files
    val partsTouched = 3
    // slack 1: AQE may leave one boundary partition split
    assert(files.size <= partsTouched + 1,
      s"small-files fan-out is back: ${files.size} files for " +
        s"$partsTouched partitions")
    // every partition dir still holds its rows — content unchanged
    assert(SnapshotTable.read(spark, dir).count() == 3000)
    (1 to 3).foreach { m =>
      assert(files.exists(
        _.startsWith(s"service_year=2000/service_month=$m/")), s"m$m")
    }
  }

  test("unpartitioned (dimension) append coalesces instead of one file per task") {
    val dir = s"$base/writer_dim"
    wipe(dir)
    val dim = (0 until 500).map(i => (i.toLong, s"n$i"))
      .toDF("dim_id", "name").repartition(16)
    SnapshotTable.append(spark, dir, dim)
    val files = SnapshotTable.manifest(spark, dir, 1).files
    assert(files.size <= 2,
      s"dimension append fanned out: ${files.size} files for 500 rows")
    assert(SnapshotTable.read(spark, dir).count() == 500)
  }

  test("MoR delete sidecars rebalance instead of one file per shuffle task") {
    val dir = s"$base/sidecar_sizing"
    wipe(dir)
    val df = (0 until 3000).map(i =>
        (f"K$i%05d", "b1", i * 1.0, 2000, 1 + i % 3))
      .toDF("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month")
    SnapshotTable.append(spark, dir, df)
    // key set spread over 32 upstream tasks — distinct() used to land
    // its 32 shuffle partitions as 32 tiny sidecar files
    val keys = (0 until 600).map(i => f"K$i%05d").toDF("claim_id")
      .repartition(32)
    assert(SnapshotTable.deleteKeysMor(spark, dir, keys).nonEmpty)
    val sidecarFiles = new File(s"$dir/_snapshots/deletes")
      .listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(sidecarFiles.length <= 2,
      s"delete sidecar fanned out: ${sidecarFiles.length} files for 600 keys")
    assert(SnapshotTable.read(spark, dir).count() == 2400)
  }

  test("root cache revalidates: truncate + recommit never serves a stale root") {
    val dir = s"$base/root_cache"
    wipe(dir)
    val mk = (tag: String) => (0 until 100).map(i =>
        (s"$tag$i", tag, i * 1.0, 2000, 1))
      .toDF("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month")
    SnapshotTable.append(spark, dir, mk("A"))
    SnapshotTable.append(spark, dir, mk("B")) // v2, now cached
    assert(SnapshotTable.read(spark, dir).count() == 200)
    // delete v2 and re-commit the SAME version number with new content
    SnapshotTable.truncateTo(spark, dir, 1)
    SnapshotTable.append(spark, dir, mk("C")) // a different v2
    val batches = SnapshotTable.read(spark, dir)
      .select("batch_id").distinct().collect().map(_.getString(0)).toSet
    assert(batches == Set("A", "C"),
      s"stale root served after truncate+recommit: $batches")
  }

  test("rebalance = false preserves a deliberately fanned layout") {
    val dir = s"$base/writer_optout"
    wipe(dir)
    val df = (0 until 2000).map(i => (f"K$i%05d", "b1", i * 1.0, 2000, 1))
      .toDF("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month")
    SnapshotTable.append(spark, dir,
      df.repartition(8, col("claim_id")), rebalance = false)
    val files = SnapshotTable.manifest(spark, dir, 1).files
    assert(files.size == 8, s"opt-out must keep 8 files: ${files.size}")
  }
}
