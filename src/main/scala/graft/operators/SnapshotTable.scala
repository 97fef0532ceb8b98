package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Manifest-based snapshot layer over partitioned parquet — the table-
  * format mechanism the reference gets from Iceberg/Delta
  * (jobs/silver/claims_to_iceberg.py:130 `writeTo(...).append()`, Delta
  * mirror :139-144), built natively because the sandbox ships neither
  * jar. The MODEL is the same as those formats':
  *
  *  - The directory listing is NOT the truth; the manifest is. Every
  *    commit writes an immutable versioned manifest (`_snapshots/
  *    v<N>.txt`) listing the table's LIVE data files; readers pin a
  *    manifest and read exactly those files (`basePath` recovers the
  *    partition columns).
  *  - Writes are COPY-ON-WRITE: [[append]] adds files and never touches
  *    existing ones; [[overwritePartitions]] writes replacement files
  *    and drops the replaced partitions' files from the NEW manifest
  *    only — the old files stay on disk, so every prior version remains
  *    readable (time travel) until [[vacuum]] reclaims it.
  *  - Commit = CAS: data files are staged under `_staging/<uuid>` and
  *    moved into place (so each writer knows EXACTLY its own files —
  *    never inferred from a racy listing diff), then the manifest is
  *    published to `v<N>.txt` with an atomic fail-if-exists rename
  *    (hard-link on local FS, where rename(2) would clobber; plain
  *    rename on HDFS-semantics stores, whose rename fails when the
  *    destination exists). Losing a CAS means another writer took
  *    version N first: the loser re-reads the new latest manifest,
  *    recomputes its live set against it, and retries — optimistic
  *    concurrency, the same protocol Iceberg runs against its catalog
  *    and Delta against its log store. Concurrent APPENDS always
  *    compose (disjoint file sets union); concurrent overwrites of the
  *    same partition serialize last-wins, each a complete consistent
  *    replacement. A crashed write leaves orphan staged/data files
  *    that no manifest references, which [[vacuum]] deletes.
  *
  * At 100 TB the wins are the same as Iceberg's: O(1) file pruning from
  * the manifest instead of a recursive listing, per-partition
  * copy-on-write instead of in-place directory swaps, and version reads
  * that never block writers.
  */
object SnapshotTable {

  final case class Manifest(version: Int, parent: Int, op: String,
      files: Seq[String])

  private def snapDir(tableDir: String) = new Path(s"$tableDir/_snapshots")

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recursive (relative-path) listing of the table's data files,
    * manifests and markers excluded. */
  private def listDataFiles(spark: SparkSession, tableDir: String)
      : Set[String] = {
    val root = new Path(tableDir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return Set.empty
    val it = fs.listFiles(root, true)
    val out = Set.newBuilder[String]
    val rootPath = fs.makeQualified(root).toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toUri.getPath.stripPrefix(rootPath)
        .stripPrefix("/")
      if (rel.endsWith(".parquet") && !rel.startsWith("_snapshots/") &&
          !rel.startsWith("_staging/"))
        out += rel
    }
    out.result()
  }

  def latestVersion(spark: SparkSession, tableDir: String): Int = {
    val d = snapDir(tableDir)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) 0
    else fs.listStatus(d).map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+\\.txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .maxOption.getOrElse(0)
  }

  def manifest(spark: SparkSession, tableDir: String, version: Int)
      : Manifest = {
    val p = new Path(snapDir(tableDir), f"v$version%05d.txt")
    val fs = fsOf(spark, p)
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val lines = text.linesIterator.toSeq
    // exactly three meta lines precede the file list (partition dirs in
    // file paths contain '=' too — never sniff on that)
    val MetaKeys = Set("version", "parent", "op")
    val isMeta = (l: String) => MetaKeys.exists(k => l.startsWith(s"$k="))
    val meta = lines.takeWhile(isMeta)
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
    Manifest(meta("version").toInt, meta("parent").toInt, meta("op"),
      lines.dropWhile(isMeta))
  }

  /** Atomically publish `tmp` as `dst`, failing (false) if `dst`
    * already exists — the CAS primitive of the commit protocol. Local
    * `file:` FS uses a hard link (link(2) fails EEXIST atomically,
    * where rename(2) would silently clobber the winning writer's
    * manifest); any other scheme uses `FileSystem.rename`, which on
    * HDFS-semantics stores fails when the destination exists, behind
    * an existence pre-check. */
  private def casPublish(fs: org.apache.hadoop.fs.FileSystem, tmp: Path,
      dst: Path): Boolean = {
    val won =
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else !fs.exists(dst) && fs.rename(tmp, dst)
    if (fs.exists(tmp)) fs.delete(tmp, false)
    won
  }

  /** Write manifest `m`'s bytes to a writer-unique temp name, then CAS
    * it to `v<N>.txt`. False = another writer committed N first. */
  private def tryWriteManifest(spark: SparkSession, tableDir: String,
      m: Manifest): Boolean = {
    val dir = snapDir(tableDir)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s"_tmp_${java.util.UUID.randomUUID()}.txt")
    val dst = new Path(dir, f"v${m.version}%05d.txt")
    val out = fs.create(tmp, true)
    try out.write(
      (Seq(s"version=${m.version}", s"parent=${m.parent}", s"op=${m.op}")
        ++ m.files.sorted).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    casPublish(fs, tmp, dst)
  }

  private def liveFiles(spark: SparkSession, tableDir: String): Set[String] =
    latestVersion(spark, tableDir) match {
      case 0 => Set.empty
      case v => manifest(spark, tableDir, v).files.toSet
    }

  /** Write `df`'s partitioned files under `_staging/<uuid>`, then move
    * each into the table tree (Spark's task-UUID file names make
    * collisions impossible). Returns EXACTLY the relative paths this
    * writer created — its own file set, known first-hand rather than
    * inferred from a directory-listing diff a concurrent writer could
    * dirty. The move is per-file rename: metadata-only, no data copy. */
  private def stagedWrite(spark: SparkSession, tableDir: String,
      df: DataFrame): Seq[String] = {
    val staging = new Path(
      s"$tableDir/_staging/${java.util.UUID.randomUUID()}")
    val fs = fsOf(spark, staging)
    df.write.mode("overwrite")
      .partitionBy(IncrementalGold.PartCols: _*).parquet(staging.toString)
    val stagingPath = fs.makeQualified(staging).toUri.getPath
      .stripSuffix("/")
    val it = fs.listFiles(staging, true)
    val rels = Seq.newBuilder[String]
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toUri.getPath.stripPrefix(stagingPath)
        .stripPrefix("/")
      if (rel.endsWith(".parquet")) rels += rel
    }
    val created = rels.result().sorted
    created.foreach { rel =>
      val dst = new Path(s"$tableDir/$rel")
      fs.mkdirs(dst.getParent)
      if (!fs.rename(new Path(s"$staging/$rel"), dst))
        throw new IllegalStateException(s"staging move failed: $rel")
    }
    fs.delete(staging, true)
    created
  }

  /** Optimistic-concurrency commit: `added` files join the live set,
    * files under `replacedPrefixes` leave it. On CAS conflict the
    * writer re-reads the NEW latest manifest, recomputes its live set
    * against it, and retries — the staged data files never move again,
    * so a retry costs only metadata (manifest + carried-stats re-read;
    * the fresh per-file stats depend only on `added` and are computed
    * once). Concurrent appends therefore always compose; concurrent
    * same-partition overwrites serialize last-wins. */
  private def commitRetrying(spark: SparkSession, tableDir: String,
      op: String, added: Seq[String], replacedPrefixes: Seq[String],
      statsColumns: Seq[String], maxRetries: Int = 20): Int = {
    val fresh = statsColumns.flatMap { c =>
      fileStats(spark, tableDir, added, c)
        .map { case (f, r) => (c, f) -> r }
    }
    var attempt = 0
    while (attempt <= maxRetries) {
      val parent = latestVersion(spark, tableDir)
      val survivors = liveFiles(spark, tableDir)
        .filterNot(f => replacedPrefixes.exists(f.startsWith))
      val m = Manifest(parent + 1, parent, op, (survivors ++ added).toSeq)
      val live = m.files.toSet
      val carried = readStats(spark, tableDir, parent)
        .filter { case ((_, f), _) => live.contains(f) }
      val all = carried ++ fresh
      // stats to a writer-unique tmp: only the CAS winner may own
      // v<N>.stats.txt (a loser writing it directly would clobber the
      // winner's zone maps with stats for a manifest that never existed)
      val statsTmp =
        if (all.isEmpty) None else Some(writeStatsTmp(spark, tableDir, all))
      if (tryWriteManifest(spark, tableDir, m)) {
        statsTmp.foreach { t =>
          val fs = fsOf(spark, t)
          val dst = statsPath(tableDir, m.version)
          // we own version N now; a reader hitting the gap just scans
          // stat-less (always-read is the safe direction)
          if (fs.exists(dst)) fs.delete(dst, false)
          if (!fs.rename(t, dst))
            throw new IllegalStateException(s"stats publish failed: $dst")
        }
        return m.version
      }
      statsTmp.foreach(t => fsOf(spark, t).delete(t, false))
      attempt += 1
      Thread.sleep(5L * attempt) // linear backoff under contention
    }
    throw new IllegalStateException(
      s"commit contention: $maxRetries CAS retries exhausted at $tableDir")
  }

  /** Append `df` as a new snapshot: staged write + CAS commit — safe
    * under concurrent writers (disjoint file sets union; every commit
    * gets its own version). When `statsColumns` is set, per-file
    * min/max zone maps are committed alongside (stats collection scans
    * ONLY this commit's files — cost ∝ change). Returns the committed
    * version. */
  def append(spark: SparkSession, tableDir: String, df: DataFrame,
      op: String = "append", statsColumns: Seq[String] = Nil): Int = {
    val created = stagedWrite(spark, tableDir, df)
    commitRetrying(spark, tableDir, op, created, Nil, statsColumns)
  }

  // ------------------------------------------------------------------
  // Zone maps: per-file min/max stats committed next to each manifest
  // (`v<N>.stats.txt`), the data-skipping half of a table format. A
  // point/range scan consults the stats and hands the parquet reader
  // only the files whose range intersects — at 100 TB with clustered
  // writes ([[IncrementalGold]] fixtures use repartitionByRange +
  // sortWithinPartitions) this skips the bulk of the table without
  // opening a footer.
  // ------------------------------------------------------------------

  private def statsPath(tableDir: String, v: Int) =
    new Path(snapDir(tableDir), f"v$v%05d.stats.txt")

  /** A file's zone for one column. `kind` fixes the comparison domain:
    * `num` (numeric, values are Double renderings), or a
    * lexicographically-ordered string domain — `date` (ISO yyyy-MM-dd),
    * `ts` (fixed-width yyyy-MM-dd HH:mm:ss.SSSSSS), `str` (raw; ASCII-
    * safe — Spark's binary min/max and Java's compareTo agree there).
    * ISO renderings make chronological order == string order, so one
    * comparator serves every non-numeric kind. */
  final case class ZoneStat(kind: String, min: String, max: String) {
    def intersectsNum(lo: Double, hi: Double): Boolean =
      kind != "num" || (max.toDouble >= lo && min.toDouble <= hi)
    def intersectsStr(lo: String, hi: String): Boolean =
      kind == "num" || (max >= lo && min <= hi)
  }

  /** Distributed per-file typed min/max for `column` over the given
    * files: one aggregate grouped by input_file_name — the ANALYZE-
    * style collection pass, run only over a commit's NEW files. The
    * zone kind comes from the column's Spark type. Files whose column
    * is entirely NULL carry no stats row (they are always scanned;
    * range predicates never match NULL, so skipping a statted file with
    * some nulls is still lossless). */
  private[graft] def fileStats(spark: SparkSession, tableDir: String,
      files: Seq[String], column: String): Map[String, ZoneStat] = {
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    if (files.isEmpty) return Map.empty
    val rootPath = fsOf(spark, new Path(tableDir))
      .makeQualified(new Path(tableDir)).toUri.getPath.stripSuffix("/")
    val df = spark.read.option("basePath", tableDir)
      .parquet(files.map(f => s"$tableDir/$f"): _*)
    val (kind, render) = df.schema(column).dataType match {
      case _: NumericType =>
        ("num", (c: org.apache.spark.sql.Column) =>
          c.cast("double").cast("string"))
      case DateType =>
        ("date", (c: org.apache.spark.sql.Column) => c.cast("string"))
      case _: TimestampType =>
        ("ts", (c: org.apache.spark.sql.Column) =>
          date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      case _ =>
        ("str", (c: org.apache.spark.sql.Column) => c.cast("string"))
    }
    df.groupBy(input_file_name().as("__f"))
      .agg(min(col(column)).as("__mn0"), max(col(column)).as("__mx0"))
      .select(col("__f"), render(col("__mn0")).as("__mn"),
        render(col("__mx0")).as("__mx"))
      .collect()
      .flatMap { r =>
        val uri = new java.net.URI(r.getAs[String]("__f")).getPath
        val rel = uri.stripPrefix(rootPath).stripPrefix("/")
        (Option(r.getAs[String]("__mn")), Option(r.getAs[String]("__mx"))) match {
          case (Some(mn), Some(mx)) => Some(rel -> ZoneStat(kind, mn, mx))
          case _ => None
        }
      }.toMap
  }

  /** (column, file) → zone recorded at `version` (empty when the commit
    * carried no stats). */
  def readStats(spark: SparkSession, tableDir: String, version: Int)
      : Map[(String, String), ZoneStat] = {
    val p = statsPath(tableDir, version)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    text.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(c, k, mn, mx, f) = l.split("\t", 5)
      (c, f) -> ZoneStat(k, dec(mn), dec(mx))
    }.toMap
  }

  /** Serialize a stats map to a writer-unique temp file; the CAS winner
    * renames it to its version's stats path. */
  private def writeStatsTmp(spark: SparkSession, tableDir: String,
      all: Map[(String, String), ZoneStat]): Path = {
    val tmp = new Path(snapDir(tableDir),
      s"_tmp_stats_${java.util.UUID.randomUUID()}.txt")
    val fs = fsOf(spark, tmp)
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val out = fs.create(tmp, true)
    try out.write(all.toSeq.sortBy(_._1)
      .map { case ((c, f), z) =>
        s"$c\t${z.kind}\t${enc(z.min)}\t${enc(z.max)}\t$f" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    tmp
  }

  /** Range scan with zone-map skipping: read ONLY the live files whose
    * [min, max] for `column` intersects [lo, hi] (files without stats
    * are always read — skipping must never drop rows). Returns the
    * frame plus (filesTotal, filesRead) so callers can pin
    * effectiveness. The caller still applies its row-level filter: zone
    * maps prune FILES, not rows. */
  def scanSkipping(spark: SparkSession, tableDir: String, column: String,
      lo: Double, hi: Double, version: Option[Int] = None)
      : (DataFrame, Int, Int) =
    scanSkippingBy(spark, tableDir, column, version,
      _.intersectsNum(lo, hi))

  /** [[scanSkipping]] in the lexicographic domain — string columns and
    * ISO-rendered date/timestamp zones, where string order IS
    * chronological order (probe dates as `yyyy-MM-dd`, timestamps as
    * `yyyy-MM-dd HH:mm:ss.SSSSSS`). */
  def scanSkippingStr(spark: SparkSession, tableDir: String,
      column: String, lo: String, hi: String, version: Option[Int] = None)
      : (DataFrame, Int, Int) =
    scanSkippingBy(spark, tableDir, column, version,
      _.intersectsStr(lo, hi))

  private def scanSkippingBy(spark: SparkSession, tableDir: String,
      column: String, version: Option[Int],
      intersects: ZoneStat => Boolean): (DataFrame, Int, Int) = {
    val v = version.getOrElse(latestVersion(spark, tableDir))
    require(v > 0, s"no snapshot at $tableDir")
    val files = manifest(spark, tableDir, v).files
    val stats = readStats(spark, tableDir, v)
    // no stat, or a stat whose kind mismatches the probe's domain →
    // always read (skipping must never drop rows)
    val keep = files.filter(f =>
      stats.get((column, f)).forall(intersects))
    val df =
      if (keep.nonEmpty)
        spark.read.option("basePath", tableDir)
          .parquet(keep.map(f => s"$tableDir/$f"): _*)
      else // nothing intersects: an empty frame with the table's schema
        read(spark, tableDir, Some(v)).filter(lit(false))
    (df, files.size, keep.size)
  }

  /** Copy-on-write partition overwrite: `df`'s rows REPLACE the listed
    * partitions (derived from `df` itself when not given). Replacement
    * files are appended; the new manifest drops every old file under a
    * replaced partition — nothing is deleted, so all prior versions
    * stay readable. This is the snapshot-native form of the SCD1
    * upsert's directory swap and the incremental publish's dynamic
    * overwrite. */
  def overwritePartitions(spark: SparkSession, tableDir: String,
      df: DataFrame,
      parts: Option[Seq[(Option[Int], Option[Int])]] = None,
      op: String = "overwrite", statsColumns: Seq[String] = Nil): Int = {
    val ps = parts.getOrElse(
      df.select(col("service_year"), col("service_month")).distinct()
        .collect().map(r => (
          Option(r.getAs[Integer]("service_year")).map(_.intValue),
          Option(r.getAs[Integer]("service_month")).map(_.intValue)))
        .toSeq)
    val replacedPrefixes = ps.map(Upsert.partitionRelPath).map(_ + "/")
    val created = stagedWrite(spark, tableDir, df)
    commitRetrying(spark, tableDir, op, created, replacedPrefixes,
      statsColumns)
  }

  /** Read the table at `version` (default: latest): exactly the
    * manifest's files, `basePath` recovering the partition columns.
    * Never lists data directories — at 100 TB the manifest IS the scan
    * plan's file index. */
  def read(spark: SparkSession, tableDir: String,
      version: Option[Int] = None, mergeSchema: Boolean = false)
      : DataFrame = {
    val v = version.getOrElse(latestVersion(spark, tableDir))
    require(v > 0, s"no snapshot at $tableDir")
    val files = manifest(spark, tableDir, v).files
    require(files.nonEmpty, s"empty snapshot v$v at $tableDir")
    // mergeSchema unions the schemas of every live file (a column
    // appended in a later commit reads as NULL for older files) at the
    // cost of a footer read per file — opt in for evolved tables, skip
    // for the common fixed-schema scan
    spark.read.option("basePath", tableDir)
      .option("mergeSchema", mergeSchema.toString)
      .parquet(files.map(f => s"$tableDir/$f"): _*)
  }

  /** Delete every data file not referenced by the `retainLast` most
    * recent manifests (plus the older manifests themselves) — reclaims
    * replaced copy-on-write files AND orphans from crashed writes.
    * Returns the deleted relative paths. */
  def vacuum(spark: SparkSession, tableDir: String, retainLast: Int = 1)
      : Seq[String] = {
    val latest = latestVersion(spark, tableDir)
    require(latest > 0, s"no snapshot at $tableDir")
    val keepFrom = math.max(1, latest - retainLast + 1)
    val referenced = (keepFrom to latest)
      .flatMap(v => manifest(spark, tableDir, v).files).toSet
    val root = new Path(tableDir)
    val fs = fsOf(spark, root)
    val doomed = (listDataFiles(spark, tableDir) -- referenced).toSeq.sorted
    doomed.foreach(f => fs.delete(new Path(s"$tableDir/$f"), false))
    (1 until keepFrom).foreach { v =>
      fs.delete(new Path(snapDir(tableDir), f"v$v%05d.txt"), false)
      fs.delete(statsPath(tableDir, v), false)
    }
    // crashed writers leave staging dirs and tmp manifests no commit
    // references; a LIVE writer holds staging only between write and
    // move, so (as with Delta's VACUUM) run this in a maintenance
    // window, not concurrently with active writers
    val stagingRoot = new Path(s"$tableDir/_staging")
    if (fs.exists(stagingRoot))
      fs.listStatus(stagingRoot).foreach(s => fs.delete(s.getPath, true))
    val snaps = snapDir(tableDir)
    if (fs.exists(snaps))
      fs.listStatus(snaps).filter(_.getPath.getName.startsWith("_tmp_"))
        .foreach(s => fs.delete(s.getPath, false))
    doomed
  }

  /** Parse a data file's (service_year, service_month) from its
    * relative path; None/None components for the null partition. */
  private[graft] def partitionOf(rel: String)
      : Option[(Option[Int], Option[Int])] = {
    def field(name: String): Option[Option[Int]] =
      rel.split("/").collectFirst {
        case seg if seg.startsWith(s"$name=") =>
          seg.stripPrefix(s"$name=") match {
            case "__HIVE_DEFAULT_PARTITION__" => None
            case v => v.toIntOption
          }
      }
    for (y <- field("service_year"); m <- field("service_month"))
      yield (y, m)
  }

  /** Partitions touched between two snapshots, from MANIFEST DIFF
    * ALONE — no listing, no data read, no Spark job. Both added and
    * removed files dirty a partition (an overwrite shows as both).
    * This is the metadata answer Iceberg/Delta give an incremental
    * consumer, and the API seam [[IncrementalGold.changedPartitions]]
    * documents: batch_id footer-stat detection still LISTS every file;
    * this is O(manifest). */
  def changedPartitionsBetween(spark: SparkSession, tableDir: String,
      fromVersion: Int, toVersion: Int): Seq[(Option[Int], Option[Int])] = {
    val before =
      if (fromVersion == 0) Set.empty[String]
      else manifest(spark, tableDir, fromVersion).files.toSet
    val after = manifest(spark, tableDir, toVersion).files.toSet
    ((after -- before) ++ (before -- after))
      .flatMap(partitionOf).toSeq.distinct
  }

  /** The rows ADDED between two snapshots: exactly the files present in
    * `toVersion` but not `fromVersion` — an append-commit CDC feed read
    * without touching any pre-existing file. (For overwrite commits
    * this is the partitions' full replacement content — copy-on-write
    * has no row-level deltas; consumers recompute those partitions,
    * which is the exactness contract the incremental publish already
    * lives by.) */
  def readFilesAdded(spark: SparkSession, tableDir: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    val before =
      if (fromVersion == 0) Set.empty[String]
      else manifest(spark, tableDir, fromVersion).files.toSet
    val added = manifest(spark, tableDir, toVersion).files
      .filterNot(before)
    require(added.nonEmpty,
      s"no files added between v$fromVersion and v$toVersion")
    spark.read.option("basePath", tableDir)
      .parquet(added.map(f => s"$tableDir/$f"): _*)
  }

  /** Manifest-level pruned read: exactly the live files under the given
    * partitions at `version` — the file index comes from the manifest,
    * so at 100 TB a two-partition read opens two partitions' files and
    * plans nothing else (no listing, no Catalyst partition-pruning pass
    * over the full file index). */
  def readPartitions(spark: SparkSession, tableDir: String,
      parts: Seq[(Option[Int], Option[Int])], version: Option[Int] = None)
      : DataFrame = {
    val v = version.getOrElse(latestVersion(spark, tableDir))
    require(v > 0, s"no snapshot at $tableDir")
    val prefixes = parts.map(Upsert.partitionRelPath).map(_ + "/")
    val files = manifest(spark, tableDir, v).files
      .filter(f => prefixes.exists(f.startsWith))
    if (files.isEmpty) read(spark, tableDir, Some(v)).filter(lit(false))
    else spark.read.option("basePath", tableDir)
      .parquet(files.map(f => s"$tableDir/$f"): _*)
  }

  /** Live files that MIGHT hold any of `keys`, from the manifest's
    * per-file key zones alone — the snapshot-native analog of the Bloom
    * sidecar probe: metadata-only, no data read. Files without a key
    * zone (or with a numeric zone for a string probe) are always
    * candidates. The zones frame is manifest-sized metadata, so the
    * range join broadcasts it; cost is |keys| × |zones of this table|,
    * bounded by catalog state, never by table rows. */
  private[graft] def candidateFilesByKeyZone(spark: SparkSession,
      tableDir: String, keys: DataFrame, key: String, version: Int)
      : Seq[String] = {
    import spark.implicits._
    val stats = readStats(spark, tableDir, version)
    val files = manifest(spark, tableDir, version).files
    val zoned = files.flatMap(f => stats.get((key, f))
      .filter(_.kind != "num").map(z => (f, z.min, z.max)))
    val zoneless = files.filterNot(f =>
      stats.get((key, f)).exists(_.kind != "num"))
    val hits =
      if (zoned.isEmpty) Nil
      else keys.select(col(key).cast("string").as("__k")).distinct()
        .join(broadcast(zoned.toDF("__f", "__mn", "__mx")),
          col("__k") >= col("__mn") && col("__k") <= col("__mx"))
        .select(col("__f")).distinct().collect().map(_.getString(0)).toSeq
    hits ++ zoneless
  }

  /** Snapshot-native MERGE (SCD1, latest `versionCol` wins per `key`;
    * base wins ties so replay is a no-op): the moved-from partitions
    * are located by probing the update keys against the manifest's
    * per-file KEY zones ([[candidateFilesByKeyZone]] — committed when
    * the table is written key-clustered), verified by a semi-join over
    * ONLY the candidate files, merged over the manifest-pruned slice,
    * and committed as one copy-on-write partition overwrite — so the
    * merge is a single snapshot version with time travel to the
    * pre-merge table, and a partition left empty by a move simply has
    * no files in the new manifest. The rewrite re-clusters by key and
    * re-commits key zones, so the NEXT merge's probe stays sharp.
    * Returns the rewritten partitions. */
  private def toParts(rows: Array[org.apache.spark.sql.Row])
      : Seq[(Option[Int], Option[Int])] = rows.map(r => (
    Option(r.getAs[Integer]("service_year")).map(_.intValue),
    Option(r.getAs[Integer]("service_month")).map(_.intValue))).toSeq

  def merge(spark: SparkSession, tableDir: String, updates: DataFrame,
      key: String = "claim_id", versionCol: String = "batch_id",
      rangeGroups: Int = 4): Seq[(Option[Int], Option[Int])] = {
    import org.apache.spark.sql.expressions.Window
    val v = latestVersion(spark, tableDir)
    require(v > 0, s"no snapshot at $tableDir")
    val targets = toParts(updates
      .select(col("service_year"), col("service_month")).distinct()
      .collect())
    if (targets.isEmpty) return Nil
    val cands = candidateFilesByKeyZone(spark, tableDir,
      updates.select(col(key)), key, v)
    // verify: which candidate-file partitions actually hold an update
    // key (zone false positives drop out here, before any rewrite)
    val verified =
      if (cands.isEmpty) Nil
      else toParts(spark.read.option("basePath", tableDir)
        .parquet(cands.map(f => s"$tableDir/$f"): _*)
        .join(updates.select(col(key)).distinct(), Seq(key), "leftsemi")
        .select(col("service_year"), col("service_month")).distinct()
        .collect())
    val parts = (targets ++ verified).distinct
    val slice = readPartitions(spark, tableDir, parts, Some(v))
    val merged = slice.withColumn("__src", lit(1))
      .unionByName(updates.withColumn("__src", lit(0)))
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, col("__src").desc)
    val latest = merged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__src")
    overwritePartitions(spark, tableDir,
      latest.repartitionByRange(rangeGroups, col(key))
        .sortWithinPartitions(col(key)),
      Some(parts), op = "merge", statsColumns = Seq(key))
    parts
  }

  /** Snapshot-native row-level DELETE by key set — the GDPR
    * right-to-erasure shape. Candidate files come from the manifest's
    * per-file key zones (metadata-only probe), the verify semi-join
    * reads ONLY those files, and the affected partitions are rewritten
    * without the doomed rows in one copy-on-write commit — a partition
    * whose every row is deleted simply has no files in the new
    * manifest. Prior versions still hold the rows until [[vacuum]]
    * runs: for actual erasure compliance the vacuum IS the forget, and
    * its retention window is the erasure deadline. Returns the
    * rewritten partitions (empty = no key present; no commit made). */
  def deleteKeys(spark: SparkSession, tableDir: String, keys: DataFrame,
      key: String = "claim_id", rangeGroups: Int = 4)
      : Seq[(Option[Int], Option[Int])] = {
    val v = latestVersion(spark, tableDir)
    require(v > 0, s"no snapshot at $tableDir")
    val keySet = keys.select(col(key)).distinct()
    val cands = candidateFilesByKeyZone(spark, tableDir, keySet, key, v)
    if (cands.isEmpty) return Nil
    val verified = toParts(spark.read.option("basePath", tableDir)
      .parquet(cands.map(f => s"$tableDir/$f"): _*)
      .join(keySet, Seq(key), "leftsemi")
      .select(col("service_year"), col("service_month")).distinct()
      .collect())
    if (verified.isEmpty) return Nil
    val kept = readPartitions(spark, tableDir, verified, Some(v))
      .join(keySet, Seq(key), "left_anti")
    overwritePartitions(spark, tableDir,
      kept.repartitionByRange(rangeGroups, col(key))
        .sortWithinPartitions(col(key)),
      Some(verified), op = "delete", statsColumns = Seq(key))
    verified
  }

  /** `q_snapshot_delete`: row-level DELETE on the snapshot layer as an
    * oracle-checked query. Fixture: the key-clustered claims silver;
    * every 10th order's claim erased via [[deleteKeys]]. The DuckDB
    * oracle recomputes the silver minus the doomed key set over the
    * FULL chain — equality proves the zone-pruned rewrite deleted
    * every doomed row and nothing else. */
  def deleteE2e(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val leaf = sfDir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last
    val base = s"target/snapshot_delete/$leaf"
    val root = new Path(base)
    val fs = fsOf(spark, root)
    if (fs.exists(root)) fs.delete(root, true)
    val tableDir = s"$base/silver"
    val orders = graft.Tables.orders(spark, sfDir)
    append(spark, tableDir,
      SilverCleanse.withBatchMetadata(
        SilverCleanse.clean(RawClaims.fromOrders(Engine.spread(orders)),
          passthrough = Nil),
        to_timestamp(lit("2024-01-01 00:00:00")))
        .repartitionByRange(8, col("claim_id"))
        .sortWithinPartitions(col("claim_id")),
      statsColumns = Seq("claim_id"))
    val doomed = orders.filter(col("o_orderkey") % 10 === 0)
      .select(concat(lit("C"), col("o_orderkey").cast("string"))
        .as("claim_id"))
    deleteKeys(spark, tableDir, doomed)
    read(spark, tableDir)
      .select(col("claim_id"), col("batch_id"), col("claim_amount"),
        col("service_year"), col("service_month"))
      .orderBy(col("claim_id"))
  }

  /** Compact the given partitions of the LATEST snapshot into
    * `targetFileCount` files each: read only those partitions' live
    * files (manifest-pruned), rewrite coalesced, commit as a
    * copy-on-write overwrite — content is bit-identical (spec-pinned),
    * the small files stay readable in prior versions until vacuumed.
    * The maintenance op that keeps streaming appends and per-partition
    * upserts from degrading scan performance at scale. */
  def compactPartitions(spark: SparkSession, tableDir: String,
      parts: Seq[(Option[Int], Option[Int])], targetFileCount: Int = 1)
      : Int = {
    val slice = readPartitions(spark, tableDir, parts)
      .repartition(targetFileCount)
    overwritePartitions(spark, tableDir, slice, Some(parts), op = "compact")
  }

  /** Live file count per partition, from the MANIFEST alone — the
    * health signal a table-maintenance service watches. No listing, no
    * data read. */
  def fileCountsByPartition(spark: SparkSession, tableDir: String,
      version: Option[Int] = None)
      : Map[(Option[Int], Option[Int]), Int] = {
    val v = version.getOrElse(latestVersion(spark, tableDir))
    require(v > 0, s"no snapshot at $tableDir")
    manifest(spark, tableDir, v).files
      .flatMap(partitionOf)
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  /** Compact every partition whose live file count exceeds `maxFiles`
    * (streaming appends and per-partition upserts accrete small files;
    * this is the maintenance loop that keeps scans healthy). Victim
    * selection is manifest-only; the rewrite reads exactly the victim
    * partitions. Returns the compacted partitions (empty = table
    * healthy, no commit made). */
  def autoCompact(spark: SparkSession, tableDir: String, maxFiles: Int,
      targetFileCount: Int = 1): Seq[(Option[Int], Option[Int])] = {
    val victims = fileCountsByPartition(spark, tableDir)
      .collect { case (p, n) if n > maxFiles => p }.toSeq
    if (victims.nonEmpty)
      compactPartitions(spark, tableDir, victims, targetFileCount)
    victims
  }

  /** Write the claims silver as a snapshot table CLUSTERED by
    * claim_amount — repartitionByRange gives disjoint per-task amount
    * ranges, sortWithinPartitions orders rows inside each file — so the
    * committed zone maps are near-disjoint and a range scan can skip
    * most files. The clustering/stats cost is paid once at write; every
    * later range query wins. */
  private[graft] def buildClusteredSilver(spark: SparkSession,
      sfDir: String, tableDir: String, rangeGroups: Int = 8): Unit = {
    val silver = IncrementalGold.silverBatchOf(
      graft.Tables.orders(spark, sfDir), "2024-01-01 00:00:00")
    append(spark, tableDir,
      silver.repartitionByRange(rangeGroups, col("claim_amount"))
        .sortWithinPartitions(col("claim_amount")),
      statsColumns = Seq("claim_amount"))
  }

  /** [[buildClusteredSilver]] clustered on `service_date` instead — a
    * DATE-typed zone-map column, exercising the lexicographic ISO
    * domain end-to-end. */
  private[graft] def buildDateClusteredSilver(spark: SparkSession,
      sfDir: String, tableDir: String, rangeGroups: Int = 8): Unit = {
    val silver = IncrementalGold.silverBatchOf(
      graft.Tables.orders(spark, sfDir), "2024-01-01 00:00:00")
    append(spark, tableDir,
      silver.repartitionByRange(rangeGroups, col("service_date"))
        .sortWithinPartitions(col("service_date")),
      statsColumns = Seq("service_date"))
  }

  /** `q_date_skipping`: typed (DATE) zone-map pruning as an oracle-
    * checked query. The fixture commits the claims silver clustered by
    * service_date with per-file ISO min/max zones; the query aggregates
    * one year having handed the parquet reader only the files whose
    * date zone intersects it (lexicographic compare of ISO strings ==
    * chronological). The DuckDB oracle computes the same aggregate over
    * the FULL table — equality proves date skipping never dropped a
    * qualifying row (rows with NULL service_date can't qualify, so
    * skipping files on non-null zones is lossless). */
  def dateSkippingE2e(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val leaf = sfDir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last
    val base = s"target/snapshot_skip_date/$leaf"
    val root = new Path(base)
    val fs = fsOf(spark, root)
    if (fs.exists(root)) fs.delete(root, true)
    val tableDir = s"$base/silver"
    buildDateClusteredSilver(spark, sfDir, tableDir)
    val (df, _, _) = scanSkippingStr(spark, tableDir, "service_date",
      "1996-01-01", "1996-12-31")
    df.filter(col("service_date") >= lit("1996-01-01").cast("date") &&
        col("service_date") <= lit("1996-12-31").cast("date"))
      .groupBy(col("service_month"))
      .agg(count(lit(1)).as("n_claims"),
        countDistinct(col("member_id")).as("unique_members"),
        graft.functions.Exact.dsum(col("claim_amount")).as("total_amount"))
      .orderBy(col("service_month"))
  }

  /** `q_data_skipping`: zone-map file pruning as an oracle-checked
    * query. The fixture commits the claims silver amount-clustered with
    * per-file min/max stats; the query answers a narrow amount-range
    * aggregate having handed the parquet reader ONLY the files whose
    * zone intersects the range (SnapshotSpec pins the file-skip ratio).
    * The DuckDB oracle computes the same aggregate over the FULL table
    * — equality proves skipping never dropped a qualifying row. */
  def dataSkippingE2e(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val leaf = sfDir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last
    val base = s"target/snapshot_skip/$leaf"
    val root = new Path(base)
    val fs = fsOf(spark, root)
    if (fs.exists(root)) fs.delete(root, true)
    val tableDir = s"$base/silver"
    buildClusteredSilver(spark, sfDir, tableDir)
    val (df, _, _) =
      scanSkipping(spark, tableDir, "claim_amount", 1000.0, 20000.0)
    df.filter(col("claim_amount") >= 1000.0 &&
        col("claim_amount") <= 20000.0)
      .agg(count(lit(1)).as("n_claims"),
        countDistinct(col("member_id")).as("unique_members"),
        graft.functions.Exact.dsum(col("claim_amount")).as("total_amount"))
  }

  /** `q_concurrent_commits`: the multi-writer CAS protocol as an
    * oracle-checked query. Four writers append disjoint quarters of the
    * claims silver CONCURRENTLY (real threads, real CAS contention on
    * the manifest); the final table must be the complete silver — the
    * DuckDB oracle recomputes it from the raw chain, so equality proves
    * no commit was lost and no row duplicated, whatever order the
    * writers won their versions in. SnapshotSpec pins the protocol
    * details (one version per commit, linear parent chain, monotone
    * live sets). */
  def concurrentCommitsE2e(spark: SparkSession, sfDir: String): DataFrame = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.DurationInt
    Engine.configure(spark)
    val leaf = sfDir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last
    val base = s"target/snapshot_cas/$leaf"
    val root = new Path(base)
    val fs = fsOf(spark, root)
    if (fs.exists(root)) fs.delete(root, true)
    val tableDir = s"$base/silver"
    val silver = IncrementalGold.silverBatchOf(
      graft.Tables.orders(spark, sfDir), "2024-01-01 00:00:00")
    implicit val ec: ExecutionContext = ExecutionContext.global
    val writers = (0 until 4).map { w =>
      Future(append(spark, tableDir,
        silver.filter(pmod(crc32(col("claim_id")), lit(4)) === w),
        op = s"append-w$w"))
    }
    Await.result(Future.sequence(writers), 10.minutes)
    require(latestVersion(spark, tableDir) == 4,
      "every concurrent commit must get its own version")
    read(spark, tableDir)
      .select(col("claim_id"), col("batch_id"), col("claim_amount"),
        col("service_year"), col("service_month"))
      .orderBy(col("claim_id"))
  }

  /** `q_snapshot_merge`: partition-MOVING MERGE on the snapshot layer
    * as an oracle-checked query. Fixture: the full claims silver
    * appended KEY-CLUSTERED (so per-file claim_id zones are narrow),
    * then the moving-correction batch (service date restated +40 days
    * for every 10th 1997-07+ order — each corrected claim leaves its
    * partition) merged via [[merge]]: candidate files from the key
    * zones, verified semi-join, one copy-on-write commit. The DuckDB
    * oracle replays both batches through the cleanse CTEs and windows
    * per key (identical to q_upsert_moving's contract), so row-level
    * equality proves no key survived in its old home and none was lost
    * — while v1 time travel to the pre-merge table stays readable
    * (SnapshotSpec). */
  def mergeE2e(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val leaf = sfDir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last
    val base = s"target/snapshot_merge/$leaf"
    val root = new Path(base)
    val fs = fsOf(spark, root)
    if (fs.exists(root)) fs.delete(root, true)
    val tableDir = s"$base/silver"
    runMergeFixture(spark, sfDir, tableDir)
    read(spark, tableDir)
      .select(col("claim_id"), col("batch_id"), col("claim_amount"),
        col("service_year"), col("service_month"))
      .orderBy(col("claim_id"))
  }

  /** Key-clustered base append + moving-batch merge (query + spec). */
  private[graft] def runMergeFixture(spark: SparkSession, sfDir: String,
      tableDir: String): Seq[(Option[Int], Option[Int])] = {
    val orders = graft.Tables.orders(spark, sfDir)
    def chain(src: DataFrame, clock: String): DataFrame =
      SilverCleanse.withBatchMetadata(
        SilverCleanse.clean(RawClaims.fromOrders(Engine.spread(src)),
          passthrough = Nil),
        to_timestamp(lit(clock)))
    append(spark, tableDir,
      chain(orders, "2024-01-01 00:00:00")
        .repartitionByRange(8, col("claim_id"))
        .sortWithinPartitions(col("claim_id")),
      statsColumns = Seq("claim_id"))
    val k = col("o_orderkey")
    val moved = orders
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("date") &&
        k % 10 === 0)
      .withColumn("o_orderdate", date_add(col("o_orderdate"), 40))
    merge(spark, tableDir, chain(moved, "2024-01-02 00:00:00"))
  }

  /** `q_time_travel`: snapshot isolation + time travel as one oracle-
    * checked query. Fixture: v1 = the full claims silver appended to a
    * snapshot table; v2 = the SCD1 correction batch committed as a
    * copy-on-write partition overwrite (merge logic identical to
    * [[Upsert.scd1]]'s latest-wins window). The query reads BOTH
    * versions from their manifests and unions them tagged by version;
    * the DuckDB oracle recomputes v1 from the batch-1 chain and v2 from
    * the windowed merge — equality proves v1 is STILL byte-faithful
    * after v2's overwrite (copy-on-write isolation) and v2 sees the
    * merge. */
  def timeTravelE2e(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val leaf = sfDir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last
    val base = s"target/snapshot_tt/$leaf"
    val root = new Path(base)
    val fs = fsOf(spark, root)
    if (fs.exists(root)) fs.delete(root, true)
    val tableDir = s"$base/silver"
    runSnapshotFixture(spark, sfDir, tableDir)
    def at(v: Int) = read(spark, tableDir, Some(v))
      .select(col("claim_id"), col("batch_id"), col("claim_amount"),
        col("service_year"), col("service_month"))
      .withColumn("version", lit(v))
    at(1).unionByName(at(2)).orderBy(col("version"), col("claim_id"))
  }

  /** v1 = base silver; v2 = latest-wins merge of the correction batch
    * (the q_upsert_claims fixture's update set), committed copy-on-
    * write. Shared by the query and the spec. */
  private[graft] def runSnapshotFixture(spark: SparkSession, sfDir: String,
      tableDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val orders = graft.Tables.orders(spark, sfDir)
    def chain(src: DataFrame, clock: String): DataFrame =
      SilverCleanse.withBatchMetadata(
        SilverCleanse.clean(RawClaims.fromOrders(Engine.spread(src)),
          passthrough = Nil),
        to_timestamp(lit(clock)))
    append(spark, tableDir, chain(orders, "2024-01-01 00:00:00"))
    val k = col("o_orderkey")
    val recent = col("o_orderdate") >= lit("1998-01-01").cast("date")
    val corrections = orders.filter(recent && k % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 500)
    val inserts = orders.filter(recent && k % 17 === 0)
      .withColumn("o_orderkey", k + lit(100000000L))
    val updates = chain(corrections.unionByName(inserts),
      "2024-01-02 00:00:00")
    val targets = updates
      .select(col("service_year"), col("service_month")).distinct()
      .collect().map(r => (
        Option(r.getAs[Integer]("service_year")).map(_.intValue),
        Option(r.getAs[Integer]("service_month")).map(_.intValue))).toSeq
    val slice = IncrementalGold.partitionSlice(read(spark, tableDir),
      targets)
    val merged = slice.withColumn("__src", lit(1))
      .unionByName(updates.withColumn("__src", lit(0)))
    val w = Window.partitionBy(col("claim_id"))
      .orderBy(col("batch_id").desc, col("__src").desc)
    val latest = merged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__src")
    overwritePartitions(spark, tableDir, latest, Some(targets))
  }
}
