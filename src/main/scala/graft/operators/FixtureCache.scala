package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Build-once fixture store for the e2e lifecycle queries (round-11
  * VERDICT "bench fixture hygiene"): the expensive, deterministic part
  * of each fixture — the cleansed silver batches, clustered snapshot
  * base tables, CSV drops — is built ONCE per (fixture name, scale
  * leaf, corpus fingerprint) under `target/fixture_cache` and reused by
  * every later run (warmup, min-of-3 bench repetitions, repeated verify
  * passes). Before this, q_time_travel/q_snapshot_publish/etc rebuilt
  * their snapshot tables from the full silver cleanse inside the TIMED
  * region on every run, so the recorded seconds measured fixture
  * construction, not the operator.
  *
  * Safety is [[ModelStore.corpusFingerprint]]'s: the cache key binds the
  * SOURCE data (path + per-file name/length/mtime), so a regenerated
  * `/root/testdata` re-fingerprints and rebuilds — a cached fixture can
  * never silently serve rows from other data. A `_FIXTURE_OK` marker is
  * written only after the build completes; a dir without it (crashed
  * build) is wiped and rebuilt.
  *
  * Mutating queries (snapshot MERGE/DELETE/rollback/WAP) share a
  * cached BASE table and reset to its base version with
  * [[SnapshotTable.truncateTo]] before operating — metadata plus the
  * prior run's small mutation output, so the timed region is the
  * operation itself, not the base ingest.
  */
object FixtureCache {

  private val Root = "target/fixture_cache"

  private def leafOf(sfDir: String): String =
    sfDir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Generic directory cache: `build(dir)` runs once per (name, scale
    * leaf, orders fingerprint); later calls return the path untouched.
    * sbt forks one test JVM and Bench/Verify are sequential, so no
    * cross-process build race exists in this environment; a production
    * deployment would take a lock file here. */
  def cachedDir(spark: SparkSession, name: String, sfDir: String)(
      build: String => Unit): String = {
    val fp = ModelStore.corpusFingerprint(spark, Tables.path(sfDir, "orders"))
    val dir = s"$Root/$name/${leafOf(sfDir)}_$fp"
    val marker = new Path(s"$dir/_FIXTURE_OK")
    val fs = fsOf(spark, marker)
    if (!fs.exists(marker)) {
      val root = new Path(dir)
      if (fs.exists(root)) fs.delete(root, true)
      build(dir)
      fs.create(marker, true).close()
    }
    dir
  }

  // ------------------------------------------------------------------
  // The cleansed claims silver batches every lifecycle fixture ingests.
  // Each is the deterministic SilverCleanse chain over an orders slice,
  // cleansed once and persisted as plain parquet; fixtures re-ingest by
  // READING these (cheap scan) instead of re-running the cleanse per
  // run (the round-11 q_concurrent_commits ran it 4x concurrently).
  // ------------------------------------------------------------------

  private def silverBatchDir(spark: SparkSession, sfDir: String, tag: String,
      clockS: String, transform: DataFrame => DataFrame): String = {
    val dir = cachedDir(spark, s"silver_$tag", sfDir) { d =>
      IncrementalGold.silverBatchOf(
          transform(Tables.orders(spark, sfDir)), clockS)
        .write.mode("overwrite").parquet(s"$d/data")
    }
    s"$dir/data"
  }

  private val Clock1 = "2024-01-01 00:00:00"
  private val Clock2 = "2024-01-02 00:00:00"
  private def cut = lit("1997-01-01").cast("date")

  /** The full claims silver (batch_id 20240101_000000). */
  def silverFull(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(silverBatchDir(spark, sfDir, "full", Clock1, identity))

  /** Pre-1997 orders' silver — batch 1 of the two-batch cadence chain. */
  def silverPre1997(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(silverBatchDir(spark, sfDir, "pre1997", Clock1,
      _.filter(col("o_orderdate") < cut)))

  /** 1997+ orders' silver — batch 2 of the two-batch cadence chain. */
  def silverPost1997(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(silverBatchDir(spark, sfDir, "post1997", Clock2,
      _.filter(col("o_orderdate") >= cut)))

  /** The partition-MOVING correction batch (service date restated +40
    * days for every 10th 1997-07+ order) — q_upsert_moving /
    * q_stream_upsert / q_snapshot_merge's update set. */
  def movedBatch(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(silverBatchDir(spark, sfDir, "moved", Clock2, { o =>
      o.filter(col("o_orderdate") >= lit("1997-07-01").cast("date") &&
          col("o_orderkey") % 10 === 0)
        .withColumn("o_orderdate", date_add(col("o_orderdate"), 40))
    }))

  /** The two-batch snapshot silver table (v1 = pre-1997 silver, v2 =
    * the 1997+ batch) — the read-side fixture of the CDC, history,
    * rollback and metadata-publish queries. Built once; mutating
    * consumers truncate back to v2. */
  def snapshotTwoBatchTable(spark: SparkSession, sfDir: String): String = {
    val dir = cachedDir(spark, "snap_two_batch", sfDir) { d =>
      SnapshotTable.append(spark, s"$d/silver",
        silverPre1997(spark, sfDir))
      SnapshotTable.append(spark, s"$d/silver",
        silverPost1997(spark, sfDir))
    }
    s"$dir/silver"
  }

  /** The KEY-NARROW correction batch (amount restated +500 for every
    * 10th 1998+ order whose DIGITS start with "19") —
    * q_snapshot_merge_file_cow's update set. The narrowness must be in
    * the CLUSTERED key order, which for the string claim_id ("C" +
    * digits) is LEXICOGRAPHIC: a digit-prefix is one contiguous string
    * range ["C19", "C1:") at every scale (~2% of keys), where a
    * numeric "lowest eighth" scatters across most lexicographic range
    * buckets as digit counts mix (it failed exactly that way at sf1).
    * On the key-clustered base only the C19-range files hold these
    * keys, so a file-granular MERGE must carry the rest by
    * reference. */
  def narrowCorrectionBatch(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(silverBatchDir(spark, sfDir, "corrections_c19",
      Clock2, { o =>
        o.filter(col("o_orderdate") >= lit("1998-01-01").cast("date") &&
            col("o_orderkey") % 10 === 0 &&
            col("o_orderkey").cast("string").startsWith("19"))
          .withColumn("o_totalprice", col("o_totalprice") + 500)
      }))

  /** The SCD1 correction batch (amount restated +500 for every 10th
    * 1998+ order, plus key-shifted inserts for every 17th) —
    * q_upsert_claims / q_time_travel's update set. */
  def correctionBatch(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(silverBatchDir(spark, sfDir, "corrections", Clock2, { o =>
      val k = col("o_orderkey")
      val recent = col("o_orderdate") >= lit("1998-01-01").cast("date")
      val corrections = o.filter(recent && k % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 500)
      val inserts = o.filter(recent && k % 17 === 0)
        .withColumn("o_orderkey", k + lit(100000000L))
      corrections.unionByName(inserts)
    }))
}
