package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftSparkInternals, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.SnapshotTable

/** The row-level CHANGE FEED as a native Structured Streaming source
  * (round-15): `spark.readStream.format("graft-snapshot-cdc")
  * .option("path", dir).load()` — each micro-batch carries the
  * insert/delete markers of the snapshot versions it covers, closing
  * the contract edge the append source documents ("deletes after
  * emission are not retracted; that's the batch CDC path's job"):
  * this IS that path, streaming. Semantics per batch window (from, to]
  * match [[SnapshotTable.changeRowsBetween]] exactly:
  *
  *  - `_change_type = "insert"`: rows of files ADDED in the window, as
  *    visible at `to` (a row inserted then MoR-erased in-window nets
  *    out of the insert arm and surfaces only as its delete pre-image);
  *  - `_change_type = "delete"`: the EXACT PRE-IMAGES of rows erased
  *    by delete refs committed in the window, read from their immutable
  *    files as visible at each delete's parent version
  *    ([[SnapshotTable.preImagePositionsAt]] plans the positions; the
  *    split reader emits ONLY those row indices);
  *  - `_commit_version`: the commit that added the file / committed the
  *    delete — consumers order replays without a second metadata read.
  *
  * Offsets are snapshot versions (checkpointable; restart resumes at
  * the next unseen commit); `.option("startVersion", v)` begins the
  * feed after `v` for consumers bootstrapped from a snapshot read.
  * Copy-on-write rewrites and rollbacks have no row-level delta — a
  * version range containing one fails LOUDLY, same as the batch feed
  * (consumers recompute those partitions via the coarse contract).
  * Vacuumed roots in range fail loudly too: retention bounds how far
  * back the changelog reaches.
  *
  * Scale shape: planning is O(manifest diff) root/chunk reads plus one
  * distributed semi-join per delete commit over only the zone+Bloom
  * candidate files; insert splits with no reaching delete decode
  * VECTORIZED (the constant `_change_type`/`_commit_version` columns
  * ride as constant vectors on the same ColumnarBatch); delete splits
  * decode row-based, emitting only their pre-image positions. */
class SnapshotCdcProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot-cdc"

  private def dirOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot-cdc requires .option(\"path\", <table dir>)"))

  override def inferSchema(options: CaseInsensitiveStringMap)
      : StructType = {
    val spark = SparkSession.active
    val dir = dirOf(options)
    val table = SnapshotTable.tableSchema(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot schema at $dir — the table needs at least one " +
          "data commit"))
    StructType(table.fields ++ SnapshotCdc.ExtraFields)
  }

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = CaseInsensitiveMap(properties.asScala.toMap)
    new SnapshotCdcTable(opts.getOrElse("path",
      throw new IllegalArgumentException("missing path")), schema,
      opts.get("startVersion").map(_.toInt).getOrElse(0),
      opts.get("maxVersionsPerBatch").map(_.toInt),
      opts.get("preImageEmbedMax").map(_.toLong)
        .getOrElse(SnapshotCdc.DefaultEmbedMax),
      opts.get("endVersion").map(_.toInt))
  }
}

private[sources] object SnapshotCdc {
  val ChangeType = "_change_type"
  val CommitVersion = "_commit_version"
  val ExtraFields: Array[StructField] = Array(
    StructField(ChangeType, StringType, nullable = false),
    StructField(CommitVersion, IntegerType, nullable = false))
  def isExtra(name: String): Boolean =
    name == ChangeType || name == CommitVersion
  /** Driver embed budget for pre-image positions per micro-batch;
    * commits beyond it SPILL their positions to an executor-readable
    * cache instead of failing (`.option("preImageEmbedMax", n)`). */
  val DefaultEmbedMax = 2000000L
  /** The spilled positions cache's schema — what
    * [[graft.operators.SnapshotTable.preImagePositionsFrame]] yields. */
  val PosCacheSchema: StructType = StructType(Seq(
    StructField("__rel", StringType, nullable = false),
    StructField("__ri", LongType, nullable = false)))
}

private[sources] class SnapshotCdcTable(dir: String, schema0: StructType,
    startVersion: Int, maxVersionsPerBatch: Option[Int] = None,
    preImageEmbedMax: Long = SnapshotCdc.DefaultEmbedMax,
    endVersion: Option[Int] = None)
    extends Table with SupportsRead {
  override def name(): String = s"graft-snapshot-cdc:`$dir`"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SnapshotCdcScanBuilder(dir, schema0, startVersion,
      maxVersionsPerBatch, preImageEmbedMax, endVersion)
}

private[sources] class SnapshotCdcScanBuilder(dir: String,
    full: StructType, startVersion: Int,
    maxVersionsPerBatch: Option[Int], preImageEmbedMax: Long,
    endVersion: Option[Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = {
    if (requiredSchema.nonEmpty) required = requiredSchema
  }
  override def build(): Scan =
    new SnapshotCdcScan(dir, full, required, startVersion,
      maxVersionsPerBatch, preImageEmbedMax, endVersion)
}

private[sources] class SnapshotCdcScan(dir: String, full: StructType,
    required: StructType, startVersion: Int,
    maxVersionsPerBatch: Option[Int], preImageEmbedMax: Long,
    endVersion: Option[Int])
    extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-snapshot-cdc $dir [${required.fieldNames.mkString(",")}]"
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new SnapshotCdcMicroBatchStream(dir, full, required, startVersion,
      maxVersionsPerBatch, preImageEmbedMax,
      Some(checkpointLocation).filter(_.nonEmpty), endVersion)
}

/** One file slice of a CDC batch. `keep` inverts the positions'
  * meaning: false = `positions` are SKIPPED (insert slices carrying
  * MoR-doomed rows), true = ONLY `positions` are emitted (delete
  * slices — the pre-images). A delete slice whose commit's erasure
  * exceeded the driver embed budget carries `posRefs` — the spilled
  * positions-cache parquet files covering `rel` — instead of embedded
  * `positions`: the reader loads its own file's row indices
  * EXECUTOR-side, so driver memory stays O(files) regardless of how
  * many rows one commit erased. */
private[graft] case class CdcFileSlice(absPath: String, length: Long,
    partValues: Array[Any], positions: Array[Long], keep: Boolean,
    changeType: String, commitVersion: Int, rel: String = "",
    posRefs: Seq[(String, Long)] = Nil)

private[graft] case class CdcInputPartition(slices: Seq[CdcFileSlice])
    extends InputPartition

private[graft] class SnapshotCdcMicroBatchStream(dir: String,
    full: StructType, required: StructType, startVersion: Int,
    maxVersionsPerBatch: Option[Int] = None,
    preImageEmbedMax: Long = SnapshotCdc.DefaultEmbedMax,
    checkpointLocation: Option[String] = None,
    endVersion: Option[Int] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val spark = SparkSession.active
  @volatile private var availableNowTarget: Option[Int] = None

  /** Spilled pre-image positions live under the stream's OWN
    * checkpoint (executor-readable by the same shared-storage contract
    * checkpoints already require), so their lifecycle is the stream's:
    * dirs for committed batches are dropped in [[commit]], everything
    * in [[stop]], and a restart's replanned batch overwrites. */
  private val cacheRoot: Option[String] =
    checkpointLocation.map(c => s"$c/graft_cdc_pre")

  private def tableFields: Array[StructField] =
    full.fields.filterNot(f => SnapshotCdc.isExtra(f.name))

  private def partCols: Seq[String] =
    SnapshotTable.currentPartCols(spark, dir).filter(c =>
      tableFields.map(_.name).contains(c))

  override def initialOffset(): Offset = SnapshotOffset(startVersion)
  override def deserializeOffset(json: String): Offset =
    SnapshotOffset.parse(json)

  private def dropCacheDirs(keep: Int => Boolean): Unit =
    cacheRoot.foreach { root =>
      try {
        val p = new Path(root)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p))
          fs.listStatus(p).foreach { st =>
            val name = st.getPath.getName
            if (name.startsWith("v") && name.drop(1).forall(_.isDigit) &&
                !keep(name.drop(1).toInt))
              fs.delete(st.getPath, true)
          }
      } catch { case _: java.io.IOException => () }
    }

  override def commit(end: Offset): Unit =
    dropCacheDirs(v => v > end.asInstanceOf[SnapshotOffset].version)
  override def stop(): Unit = dropCacheDirs(_ => false)

  /** `.option("endVersion", v)` caps the feed at commit `v` — what
    * lets a follower drain EXACTLY one row-monotone leg between two
    * rewrite commits (the through-maintenance replication recipe,
    * [[SnapshotTable.followAvailableNow]]). */
  private def capEnd(v: Int): Int =
    endVersion.fold(v)(math.min(v, _))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      Some(capEnd(SnapshotTable.latestVersion(spark, dir)))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control, same contract as the append source: cap each
    * micro-batch to `maxVersionsPerBatch` snapshot versions so a deep
    * changelog replay is paced, not one table-sized batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowTarget.getOrElse(
      capEnd(SnapshotTable.latestVersion(spark, dir)))
    val capped = (maxVersionsPerBatch, Option(start)) match {
      case (Some(m), Some(s)) =>
        math.min(target, s.asInstanceOf[SnapshotOffset].version + m)
      case _ => target
    }
    SnapshotOffset(capped)
  }

  override def latestOffset(): Offset =
    latestOffset(null, ReadLimit.allAvailable())

  private def partValue(raw: Option[String], dt: DataType): Any =
    raw match {
      case None | Some("__HIVE_DEFAULT_PARTITION__") => null
      case Some(v) => dt match {
        case IntegerType => v.toInt
        case LongType => v.toLong
        case StringType => UTF8String.fromString(v)
        case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
        case other => throw new UnsupportedOperationException(
          s"graft-snapshot-cdc: unsupported partition column type $other")
      }
    }

  // MicroBatchScanExec.inputPartitions is a lazy val PER PLAN NODE,
  // and physical planning consults it on several transient node copies
  // (DataSourceV2Strategy's supportsColumnar probe, then each
  // preparation rule) — without memoization the pre-image jobs below
  // re-run 4× per micro-batch (measured ~4 s each at sf0.1). The plan
  // for a (from, to] window is deterministic (manifests are immutable
  // per version), so one entry keyed by the offset pair is exact; a
  // single slot suffices because batches advance monotonically.
  @volatile private var planCache
      : Option[((Int, Int), Array[InputPartition])] = None

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val key = (start.asInstanceOf[SnapshotOffset].version,
      end.asInstanceOf[SnapshotOffset].version)
    planCache match {
      case Some((k, parts)) if k == key => parts
      case _ =>
        val parts = planInputPartitions0(start, end)
        planCache = Some((key, parts))
        parts
    }
  }

  private def planInputPartitions0(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[SnapshotOffset].version
    val to = end.asInstanceOf[SnapshotOffset].version
    if (to <= from) return Array.empty
    val pcs = partCols.map(c => c -> full(c).dataType)
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // per-version walk: validate row-monotonicity, track added files
    // per commit (for _commit_version), plan delete pre-images.
    // Small erasures EMBED their positions in the splits (no extra
    // IO); once the batch's embedded total would exceed the driver
    // budget, a commit's positions SPILL to an executor-readable
    // range-clustered parquet cache and its splits carry file REFS —
    // so one bulk (GDPR-scale) erasure streams row-level with driver
    // memory O(files), no pacing, no refusal.
    var embedded = 0L
    var prevFiles =
      if (from == 0) Set.empty[String]
      else SnapshotTable.manifest(spark, dir, from).files.toSet
    val inserts = Seq.newBuilder[(String, Int)] // (rel, version added)
    val deletes = Seq.newBuilder[(String, Array[Long], Int)]
    // (rel, version, covering positions-cache files)
    val spilled = Seq.newBuilder[(String, Int, Seq[(String, Long)])]
    ((from + 1) to to).foreach { v =>
      val m = SnapshotTable.manifest(spark, dir, v) // loud if vacuumed
      if (!SnapshotTable.rowMonotoneOp(m.op))
        throw new UnsupportedOperationException(
          s"graft-snapshot-cdc at $dir: commit v$v is '${m.op}' — a " +
            "rewrite has no row-level delta; recompute those " +
            "partitions via changedPartitionsBetween + readFilesAdded")
      val cur = m.files.toSet
      (cur -- prevFiles).toSeq.sorted.foreach(rel =>
        inserts += ((rel, v)))
      prevFiles = cur
      if (v >= 2)
        SnapshotTable.preImagePositionsFrame(spark, dir, v).foreach {
          frame =>
            val pre = frame.persist()
            try {
              val n = pre.count()
              if (n == 0) ()
              else if (embedded + n <= preImageEmbedMax) {
                embedded += n
                pre.collect().groupBy(_.getString(0)).toSeq.sortBy(_._1)
                  .foreach { case (rel, rows) =>
                    deletes += ((rel, rows.map(_.getLong(1)).sorted, v))
                  }
              } else cacheRoot match {
                case Some(root) =>
                  spillPositions(pre, n, s"$root/v$v", v).foreach(s =>
                    spilled += s)
                case None => throw new IllegalStateException(
                  s"graft-snapshot-cdc at $dir: batch v$from..v$to " +
                    s"holds >$preImageEmbedMax delete pre-image " +
                    "positions and no checkpoint location exists to " +
                    "spill them — pace with " +
                    ".option(\"maxVersionsPerBatch\", n)")
              }
            } finally { pre.unpersist(); () }
        }
    }
    val added = inserts.result()
    val delList = deletes.result()
    val spilledList = spilled.result()
    // inserts stream as visible at `to`: live MoR deletes reaching the
    // added files ship their doomed positions with the split
    val doomedOf = SnapshotTable.deletePositionsFor(spark, dir, to,
      added.map(_._1))
    // file lengths in one listStatus per PARTITION DIRECTORY instead of
    // one getFileStatus RPC per slice (a wide window touches thousands)
    val rels = (added.map(_._1) ++ delList.map(_._1) ++
      spilledList.map(_._1)).distinct
    val lenOf: Map[String, Long] = rels
      .groupBy(_.split("/").init.mkString("/"))
      .flatMap { case (parentRel, rs) =>
        val parent =
          if (parentRel.isEmpty) new Path(dir)
          else new Path(s"$dir/$parentRel")
        val byName = fs.listStatus(parent).iterator
          .map(st => st.getPath.getName -> st.getLen).toMap
        // a planned file vanished between manifest read and listing
        // (concurrent vacuum): fail with the full path, as the per-file
        // getFileStatus this replaced did — not a bare key-not-found
        rs.map(r => r -> byName.getOrElse(r.split("/").last,
          throw new java.io.FileNotFoundException(s"$dir/$r")))
      }
    def sliceOf(rel: String, positions: Array[Long], keep: Boolean,
        changeType: String, v: Int): CdcFileSlice = {
      val segs = rel.split("/").init.collect {
        case s if s.contains("=") =>
          s.takeWhile(_ != '=') -> s.dropWhile(_ != '=').tail
      }.toMap
      val values = pcs.map { case (c, dt) =>
        partValue(segs.get(c), dt) }.toArray
      CdcFileSlice(fs.makeQualified(new Path(s"$dir/$rel")).toString,
        lenOf(rel), values, positions, keep, changeType, v, rel)
    }
    val deleteSlices = delList.map { case (rel, pos, v) =>
      sliceOf(rel, pos, keep = true, "delete", v)
    }
    val spilledSlices = spilledList.map { case (rel, v, refs) =>
      sliceOf(rel, Array.empty, keep = true, "delete", v)
        .copy(posRefs = refs)
    }
    val insertSlices = added.map { case (rel, v) =>
      sliceOf(rel, doomedOf.getOrElse(rel, Array.empty), keep = false,
        "insert", v)
    }
    // bin-pack to the session split size (delete slices bill only
    // their pre-image rows but length is a fine upper bound)
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val bins = Seq.newBuilder[CdcInputPartition]
    var cur = Vector.empty[CdcFileSlice]
    var curBytes = 0L
    (insertSlices ++ deleteSlices).foreach { s =>
      if (cur.nonEmpty && curBytes + s.length > maxBytes) {
        bins += CdcInputPartition(cur); cur = Vector.empty
        curBytes = 0L
      }
      cur :+= s; curBytes += s.length
    }
    if (cur.nonEmpty) bins += CdcInputPartition(cur)
    // spilled slices bin by CACHE FILE: every slice in the bin shares
    // its posRefs, so the reader loads each cache file ONCE and serves
    // all its rels from memory bounded by the cache file's target size
    // (~250k positions) — parallelism scales with the erasure, read
    // amplification stays 1×
    spilledSlices.groupBy(_.posRefs).toSeq.sortBy(_._2.head.rel)
      .foreach { case (_, g) => bins += CdcInputPartition(g.sortBy(_.rel)) }
    bins.result().toArray
  }

  /** Write one commit's pre-image positions to an EXECUTOR-readable
    * cache: range-clustered and sorted by (`__rel`, `__ri`) into
    * ~250k-position files, so each reader bin loads one bounded cache
    * file. Returns (rel, version, covering cache files) per affected
    * data file — O(files) driver state, never O(positions). */
  private def spillPositions(pre: org.apache.spark.sql.DataFrame,
      n: Long, cacheDir: String, v: Int)
      : Seq[(String, Int, Seq[(String, Long)])] = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val k = math.max(1L, math.min(n / 250000L + 1L, 10000L)).toInt
    pre.repartitionByRange(k, col("__rel"), col("__ri"))
      .sortWithinPartitions("__rel", "__ri")
      .write.mode("overwrite").parquet(cacheDir)
    val cp = new Path(cacheDir)
    val cfs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byName = cfs.listStatus(cp).iterator
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName ->
        (cfs.makeQualified(st.getPath).toString, st.getLen)).toMap
    // per-cache-file (minRel, maxRel) in one small aggregation — the
    // rel → covering-file map costs O(cache files) driver-side
    val ranges = spark.read.schema(SnapshotCdc.PosCacheSchema)
      .parquet(cacheDir)
      .groupBy(input_file_name().as("__f"))
      .agg(min(col("__rel")).as("mn"), max(col("__rel")).as("mx"))
      .collect()
      .map { r =>
        val (p, len) = byName(r.getString(0).split("/").last)
        (r.getString(1), r.getString(2), p, len)
      }
    val relList = pre.select(col("__rel")).distinct()
      .collect().map(_.getString(0)).sorted
    relList.toSeq.map { rel =>
      val covering = ranges.iterator
        .filter(rg => rg._1 <= rel && rel <= rg._2)
        .map(rg => (rg._3, rg._4)).toSeq
      (rel, v, covering)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val pcs = partCols
    val tf = tableFields.map(_.name).toSet
    val partReq = StructType(required.fields.filter(f =>
      pcs.contains(f.name)))
    val dataReq = StructType(required.fields.filter(f =>
      tf.contains(f.name) && !pcs.contains(f.name)))
    val extraReq = StructType(required.fields.filter(f =>
      SnapshotCdc.isExtra(f.name)))
    val dataSchema = StructType(tableFields.filterNot(f =>
      pcs.contains(f.name)))
    val emitted =
      StructType(dataReq.fields ++ partReq.fields ++ extraReq.fields)
    val readFunc = GraftSparkInternals.parquetReaderFunc(spark,
      dataSchema, partReq, dataReq)
    val batchFunc = GraftSparkInternals.parquetBatchReaderFunc(spark,
      dataSchema, partReq, dataReq)
    val posReadFunc = GraftSparkInternals.parquetReaderFunc(spark,
      SnapshotCdc.PosCacheSchema, new StructType(),
      SnapshotCdc.PosCacheSchema)
    new SnapshotCdcReaderFactory(readFunc, batchFunc, emitted, required,
      extraReq,
      pcs.zipWithIndex.filter { case (c, _) =>
        partReq.fieldNames.contains(c) }.map(_._2).toArray, posReadFunc)
  }
}

private[graft] class SnapshotCdcReaderFactory(
    readFunc: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow],
    batchFunc: Option[
      org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]],
    emitted: StructType, required: StructType, extraReq: StructType,
    partValueIdx: Array[Int],
    posReadFunc: org.apache.spark.sql.execution.datasources
      .PartitionedFile => Iterator[InternalRow] = null)
    extends PartitionReaderFactory {

  private def partRowOf(s: CdcFileSlice) =
    new GenericInternalRow(partValueIdx.map(s.partValues(_)))

  /** The constant per-slice extra values in extraReq order. */
  private def extraValues(s: CdcFileSlice): Array[Any] =
    extraReq.fieldNames.map {
      case SnapshotCdc.ChangeType => UTF8String.fromString(s.changeType)
      case SnapshotCdc.CommitVersion => s.commitVersion: Any
    }

  /** Columnar only for whole-file insert slices (no positions to skip
    * or keep) — the extras ride as constant vectors on the batch. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    batchFunc.nonEmpty && partition.asInstanceOf[CdcInputPartition]
      .slices.forall(s => !s.keep && s.positions.isEmpty)

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[CdcInputPartition]
    val f = batchFunc.get
    val it = p.slices.iterator.flatMap { s =>
      f(GraftSparkInternals.partitionedFile(partRowOf(s),
        s.absPath, s.length)).map(b => (s, b))
    }
    val remap = required.fieldNames.map(emitted.fieldIndex)
    val identity = remap.zipWithIndex.forall { case (v, i) => v == i }
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var cur: org.apache.spark.sql.vectorized.ColumnarBatch = _
      override def next(): Boolean =
        if (it.hasNext) {
          val (s, b) = it.next()
          // append the constant extras, then permute to declared order
          val extras = extraReq.fields.zip(extraValues(s)).map {
            case (fld, v) =>
              val cv = new org.apache.spark.sql.execution.vectorized
                .ConstantColumnVector(b.numRows(), fld.dataType)
              v match {
                case u: UTF8String => cv.setUtf8String(u)
                case i: Integer => cv.setInt(i)
                case i: Int => cv.setInt(i)
                case other => throw new IllegalStateException(
                  s"unsupported extra value $other")
              }
              cv: org.apache.spark.sql.vectorized.ColumnVector
          }
          val cols = (0 until b.numCols()).map(b.column) ++ extras
          val out =
            if (identity) cols.toArray
            else remap.map(cols(_))
          val wrapped = new org.apache.spark.sql.vectorized
            .ColumnarBatch(out)
          wrapped.setNumRows(b.numRows())
          cur = wrapped
          true
        } else false
      override def get()
          : org.apache.spark.sql.vectorized.ColumnarBatch = cur
      override def close(): Unit = ()
    }
  }

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcInputPartition]
    val project = UnsafeProjection.create(required.fields.map { f =>
      val i = emitted.fieldIndex(f.name)
      BoundReference(i, emitted(i).dataType, nullable = true)
    }.toIndexedSeq)
    val joined = new JoinedRow
    // spilled pre-image positions: the bin's slices share their cache
    // files, so load each ONCE into rel → sorted positions — executor
    // memory is bounded by the cache file's target size, regardless of
    // how many rows the whole commit erased
    lazy val spilledPos: Map[String, Array[Long]] = {
      val wanted = p.slices.iterator.filter(_.posRefs.nonEmpty)
        .map(_.rel).toSet
      val buf = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.ArrayBuilder.ofLong]
      p.slices.flatMap(_.posRefs).distinct.foreach { case (path, len) =>
        posReadFunc(GraftSparkInternals.partitionedFile(
          new GenericInternalRow(0), path, len)).foreach { r =>
            val rel = r.getUTF8String(0).toString
            if (wanted.contains(rel))
              buf.getOrElseUpdate(rel,
                new scala.collection.mutable.ArrayBuilder.ofLong) +=
                r.getLong(1)
          }
      }
      buf.iterator.map { case (k, b) =>
        val a = b.result(); java.util.Arrays.sort(a); k -> a
      }.toMap
    }
    val it = p.slices.iterator.flatMap { s =>
      val pf = GraftSparkInternals.partitionedFile(
        partRowOf(s), s.absPath, s.length)
      // VECTORIZED decode even for positioned slices: the rows surface
      // one at a time (ColumnarBatch.rowIterator keeps file order, so
      // the sequential index below is still the parquet row index) but
      // the parquet decode itself runs through the columnar reader —
      // the row-based ParquetRecordReader re-assembles every row
      // eagerly and measured several times slower on the pre-image
      // scans that dominate a CDC drain. Falls back to the row reader
      // when the format can't batch this schema.
      val rows: Iterator[InternalRow] = batchFunc match {
        case Some(bf) => bf(pf).flatMap { b =>
          val jt = b.rowIterator()
          new Iterator[InternalRow] {
            override def hasNext: Boolean = jt.hasNext
            override def next(): InternalRow = jt.next()
          }
        }
        case None => readFunc(pf)
      }
      val pos =
        if (s.posRefs.nonEmpty)
          spilledPos.getOrElse(s.rel, Array.empty[Long])
        else s.positions
      val filtered =
        if (pos.isEmpty && !s.keep) rows
        else {
          // sequential decode order IS the parquet row index — the
          // same addressing the positional sidecars record
          var idx = -1L
          rows.filter { _ =>
            idx += 1
            val hit = java.util.Arrays.binarySearch(pos, idx) >= 0
            if (s.keep) hit else !hit
          }
        }
      val extra = new GenericInternalRow(extraValues(s))
      filtered.map(r => project(joined(r, extra)))
    }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
