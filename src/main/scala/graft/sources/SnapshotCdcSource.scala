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
      opts.get("maxVersionsPerBatch").map(_.toInt))
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
}

private[sources] class SnapshotCdcTable(dir: String, schema0: StructType,
    startVersion: Int, maxVersionsPerBatch: Option[Int] = None)
    extends Table with SupportsRead {
  override def name(): String = s"graft-snapshot-cdc:`$dir`"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SnapshotCdcScanBuilder(dir, schema0, startVersion,
      maxVersionsPerBatch)
}

private[sources] class SnapshotCdcScanBuilder(dir: String,
    full: StructType, startVersion: Int,
    maxVersionsPerBatch: Option[Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = {
    if (requiredSchema.nonEmpty) required = requiredSchema
  }
  override def build(): Scan =
    new SnapshotCdcScan(dir, full, required, startVersion,
      maxVersionsPerBatch)
}

private[sources] class SnapshotCdcScan(dir: String, full: StructType,
    required: StructType, startVersion: Int,
    maxVersionsPerBatch: Option[Int]) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-snapshot-cdc $dir [${required.fieldNames.mkString(",")}]"
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new SnapshotCdcMicroBatchStream(dir, full, required, startVersion,
      maxVersionsPerBatch)
}

/** One file slice of a CDC batch. `keep` inverts the positions'
  * meaning: false = `positions` are SKIPPED (insert slices carrying
  * MoR-doomed rows), true = ONLY `positions` are emitted (delete
  * slices — the pre-images). */
private[graft] case class CdcFileSlice(absPath: String, length: Long,
    partValues: Array[Any], positions: Array[Long], keep: Boolean,
    changeType: String, commitVersion: Int)

private[graft] case class CdcInputPartition(slices: Seq[CdcFileSlice])
    extends InputPartition

private[graft] class SnapshotCdcMicroBatchStream(dir: String,
    full: StructType, required: StructType, startVersion: Int,
    maxVersionsPerBatch: Option[Int] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val spark = SparkSession.active
  @volatile private var availableNowTarget: Option[Int] = None

  private def tableFields: Array[StructField] =
    full.fields.filterNot(f => SnapshotCdc.isExtra(f.name))

  private def partCols: Seq[String] =
    SnapshotTable.currentPartCols(spark, dir).filter(c =>
      tableFields.map(_.name).contains(c))

  override def initialOffset(): Offset = SnapshotOffset(startVersion)
  override def deserializeOffset(json: String): Offset =
    SnapshotOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(SnapshotTable.latestVersion(spark, dir))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control, same contract as the append source: cap each
    * micro-batch to `maxVersionsPerBatch` snapshot versions so a deep
    * changelog replay is paced, not one table-sized batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowTarget.getOrElse(
      SnapshotTable.latestVersion(spark, dir))
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
    // per commit (for _commit_version), collect delete pre-images.
    // The pre-image positions accumulate on the DRIVER, and
    // preImagePositionsAt's cap is per COMMIT — a deep window (far
    // startVersion, no maxVersionsPerBatch) could hold versions × cap
    // positions, so an AGGREGATE budget guards the batch as a whole,
    // failing loudly toward pacing (same posture as the per-commit cap).
    val maxBatchPositions = 2000000L
    var batchPositions = 0L
    var prevFiles =
      if (from == 0) Set.empty[String]
      else SnapshotTable.manifest(spark, dir, from).files.toSet
    val inserts = Seq.newBuilder[(String, Int)] // (rel, version added)
    val deletes = Seq.newBuilder[(String, Array[Long], Int)]
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
        SnapshotTable.preImagePositionsAt(spark, dir, v).toSeq
          .sortBy(_._1).foreach { case (rel, pos) =>
            batchPositions += pos.length
            if (batchPositions > maxBatchPositions)
              throw new IllegalStateException(
                s"graft-snapshot-cdc at $dir: batch v$from..v$to " +
                  s"accumulates >$maxBatchPositions delete pre-image " +
                  "positions on the driver — pace the stream with " +
                  ".option(\"maxVersionsPerBatch\", n) or consume the " +
                  "range with the batch feed (changeRowsBetween) " +
                  "version by version")
            deletes += ((rel, pos, v))
          }
    }
    val added = inserts.result()
    val delList = deletes.result()
    // inserts stream as visible at `to`: live MoR deletes reaching the
    // added files ship their doomed positions with the split
    val doomedOf = SnapshotTable.deletePositionsFor(spark, dir, to,
      added.map(_._1))
    // file lengths in one listStatus per PARTITION DIRECTORY instead of
    // one getFileStatus RPC per slice (a wide window touches thousands)
    val rels = (added.map(_._1) ++ delList.map(_._1)).distinct
    val lenOf: Map[String, Long] = rels
      .groupBy(_.split("/").init.mkString("/"))
      .flatMap { case (parentRel, rs) =>
        val parent =
          if (parentRel.isEmpty) new Path(dir)
          else new Path(s"$dir/$parentRel")
        val byName = fs.listStatus(parent).iterator
          .map(st => st.getPath.getName -> st.getLen).toMap
        rs.map(r => r -> byName(r.split("/").last))
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
        lenOf(rel), values, positions, keep, changeType, v)
    }
    val deleteSlices = delList.map { case (rel, pos, v) =>
      sliceOf(rel, pos, keep = true, "delete", v)
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
    bins.result().toArray
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
    new SnapshotCdcReaderFactory(readFunc, batchFunc, emitted, required,
      extraReq,
      pcs.zipWithIndex.filter { case (c, _) =>
        partReq.fieldNames.contains(c) }.map(_._2).toArray)
  }
}

private[graft] class SnapshotCdcReaderFactory(
    readFunc: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow],
    batchFunc: Option[
      org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]],
    emitted: StructType, required: StructType, extraReq: StructType,
    partValueIdx: Array[Int])
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
    val it = p.slices.iterator.flatMap { s =>
      val rows = readFunc(GraftSparkInternals.partitionedFile(
        partRowOf(s), s.absPath, s.length))
      val filtered =
        if (s.positions.isEmpty && !s.keep) rows
        else {
          // sequential decode order IS the parquet row index — the
          // same addressing the positional sidecars record
          var idx = -1L
          val pos = s.positions
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
