package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftSparkInternals, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.SnapshotTable

/** [[SnapshotTable]] as a NATIVE Structured Streaming SOURCE (round-12
  * plan #4): `spark.readStream.format("graft-snapshot").option("path",
  * dir).load()` — each micro-batch is the MANIFEST DIFF between two
  * snapshot versions (offset = version number), so the stream gets the
  * table's own isolation guarantees instead of a raw directory
  * listing's races:
  *
  *  - an IN-FLIGHT writer's files (staged, moved into the tree, root
  *    not yet CAS-published) are NEVER read — only a published root
  *    names files, so the stream can't observe a torn commit (the
  *    directory-listing file source has no such line);
  *  - exactly the APPENDED files flow, resolved from two root reads —
  *    no per-batch listing, no O(live files) work at 100 TB;
  *  - offsets are checkpointable versions: restart resumes at the next
  *    unseen commit.
  *
  * Reading uses Spark's own parquet machinery via
  * [[org.apache.spark.sql.GraftSparkInternals]] (the closure
  * FileSourceScanExec ships), with column pruning pushed into the scan
  * (`SupportsPushDownRequiredColumns`), files BIN-PACKED into
  * ~maxPartitionBytes input splits in partition-key order — a backfill
  * batch over many small files schedules O(bytes / split) tasks, not
  * O(files) — and VECTORIZED decode (round-15): splits read whole
  * ColumnarBatches whenever ParquetFileFormat guarantees them for the
  * schema (the same `supportBatch` gate FileSourceScanExec runs),
  * falling back to the row closure otherwise.
  *
  * MERGE-ON-READ composition (round-15, replacing the round-14 loud
  * failure): a live equality/positional delete reaching files in the
  * streamed range is APPLIED — planning computes the doomed row
  * positions per file ([[SnapshotTable.deletePositionsFor]]) and ships
  * them with the split, whose reader skips those row indices (those
  * splits decode row-based; unreached splits stay columnar). So a
  * backfill of a mergeMor-fed table emits exactly its merged content.
  * Deletes committed AFTER a file was streamed are not retracted —
  * append streams don't un-emit; retraction is the batch CDC path's
  * job ([[SnapshotTable.changedPartitionsBetween]]).
  *
  * Remaining contract edges, stated: copy-on-write OVERWRITE commits
  * stream their replacement files (full partition content — the same
  * semantics as [[SnapshotTable.readFilesAdded]], whose docs own the
  * rationale); partition-spec-evolved tables must stream from a
  * version whose added files carry the current spec. */
class SnapshotSourceProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  private def dirOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot requires .option(\"path\", <snapshot table dir>)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val dir = dirOf(options)
    SnapshotTable.tableSchema(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot schema at $dir — the table needs at least one " +
          "data commit"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = CaseInsensitiveMap(properties.asScala.toMap)
    new SnapshotSourceTable(opts.getOrElse("path",
      throw new IllegalArgumentException("missing path")), schema,
      opts.get("maxVersionsPerBatch").map(_.toInt))
  }
}

private[sources] class SnapshotSourceTable(dir: String, schema0: StructType,
    maxVersionsPerBatch: Option[Int] = None)
    extends Table with SupportsRead {
  override def name(): String = s"graft-snapshot:`$dir`"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SnapshotScanBuilder(dir, schema0, maxVersionsPerBatch)
}

private[sources] class SnapshotScanBuilder(dir: String, full: StructType,
    maxVersionsPerBatch: Option[Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // column pruning pushed into the parquet scan — an id-only consumer
    // of a wide table never decodes the wide columns
    if (requiredSchema.nonEmpty) required = requiredSchema
  }
  override def build(): Scan =
    new SnapshotScan(dir, full, required, maxVersionsPerBatch)
}

private[sources] class SnapshotScan(dir: String, full: StructType,
    required: StructType, maxVersionsPerBatch: Option[Int]) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-snapshot $dir [${required.fieldNames.mkString(",")}]"
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new SnapshotMicroBatchStream(dir, full, required, maxVersionsPerBatch)
}

/** Offset = snapshot version (0 = before the first commit). */
private[graft] case class SnapshotOffset(version: Int) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}
private[graft] object SnapshotOffset {
  private val Re = """\{\s*"version"\s*:\s*(\d+)\s*\}""".r
  def parse(json: String): SnapshotOffset = json match {
    case Re(v) => SnapshotOffset(v.toInt)
    case other => throw new IllegalArgumentException(
      s"bad graft-snapshot offset: $other")
  }
}

/** One data file of the batch's manifest diff. `partValues` are
  * catalyst values (Int/Long/UTF8String/epoch-day Int) parsed from the
  * file's partition path segments at PLAN time. `doomed` are the
  * SORTED in-file row indices live MoR deletes erase from this file
  * (empty for files no delete reaches — the overwhelmingly common
  * case); the reader skips them at decode time. */
private[graft] case class SnapshotFileSlice(absPath: String,
    length: Long, partValues: Array[Any],
    doomed: Array[Long] = Array.empty)

/** One input split: BIN-PACKED file slices (files sorted by partition
  * key then packed to ~maxPartitionBytes), so a large backfill batch
  * doesn't schedule one task per small file. */
private[graft] case class SnapshotInputPartition(
    slices: Seq[SnapshotFileSlice]) extends InputPartition

private[graft] class SnapshotMicroBatchStream(dir: String,
    full: StructType, required: StructType,
    maxVersionsPerBatch: Option[Int] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val spark = SparkSession.active
  // Trigger.AvailableNow pins the target version ONCE, so the run
  // drains exactly the commits that existed at start and terminates
  // even under concurrent writers
  @volatile private var availableNowTarget: Option[Int] = None

  private def partCols: Seq[String] =
    SnapshotTable.currentPartCols(spark, dir).filter(c =>
      full.fieldNames.contains(c))

  override def initialOffset(): Offset = SnapshotOffset(0)
  override def deserializeOffset(json: String): Offset =
    SnapshotOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(SnapshotTable.latestVersion(spark, dir))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** ADMISSION CONTROL (the maxFilesPerTrigger analog at the commit
    * grain): `maxVersionsPerBatch` caps each micro-batch to that many
    * snapshot versions, so a months-deep backfill becomes a paced
    * sequence of bounded batches instead of one table-sized one —
    * under AvailableNow the run still drains to the pinned target,
    * just in capped steps. */
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

  /** Catalyst value of one partition-path segment. */
  private def partValue(raw: Option[String], dt: DataType): Any =
    raw match {
      case None | Some("__HIVE_DEFAULT_PARTITION__") => null
      case Some(v) => dt match {
        case IntegerType => v.toInt
        case LongType => v.toLong
        case StringType => UTF8String.fromString(v)
        case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
        case other => throw new UnsupportedOperationException(
          s"graft-snapshot: unsupported partition column type $other")
      }
    }

  // MicroBatchScanExec.inputPartitions is a lazy val PER PLAN NODE,
  // and physical planning consults it on several transient node copies
  // (DataSourceV2Strategy's supportsColumnar probe, then each
  // preparation rule) — without memoization the delete-position jobs
  // below re-run 4× per micro-batch. The plan for a (from, to] window
  // is deterministic (manifests are immutable per version), so one
  // entry keyed by the offset pair is exact; a single slot suffices
  // because batches advance monotonically.
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
    val files = SnapshotTable.addedFilesBetween(spark, dir, from, to)
    // live MoR deletes reaching the range: doomed row indices per file,
    // shipped with the split (empty map when the table carries none)
    val doomedOf = SnapshotTable.deletePositionsFor(spark, dir, to, files)
    val pcs = partCols.map(c => c -> full(c).dataType)
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // file lengths in one listStatus per PARTITION DIRECTORY instead
    // of one getFileStatus RPC per file (a backfill touches thousands)
    val lenOf: Map[String, Long] = files
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
    val slices = files.sorted.map { rel => // partition-key path order
      val segs = rel.split("/").init.collect {
        case s if s.contains("=") =>
          s.takeWhile(_ != '=') -> s.dropWhile(_ != '=').tail
      }.toMap
      val values = pcs.map { case (c, dt) =>
        partValue(segs.get(c), dt) }.toArray
      val p = new Path(s"$dir/$rel")
      SnapshotFileSlice(fs.makeQualified(p).toString,
        lenOf(rel), values,
        doomedOf.getOrElse(rel, Array.empty))
    }
    // bin-pack path-ordered (≈ partition-ordered) files to the
    // session's split size, so a backfill over many small files
    // schedules O(bytes / maxPartitionBytes) tasks, not O(files)
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val bins = Seq.newBuilder[SnapshotInputPartition]
    var cur = Vector.empty[SnapshotFileSlice]
    var curBytes = 0L
    slices.foreach { s =>
      if (cur.nonEmpty && curBytes + s.length > maxBytes) {
        bins += SnapshotInputPartition(cur); cur = Vector.empty
        curBytes = 0L
      }
      cur :+= s; curBytes += s.length
    }
    if (cur.nonEmpty) bins += SnapshotInputPartition(cur)
    bins.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val pcs = partCols
    val partReq = StructType(required.fields.filter(f =>
      pcs.contains(f.name)))
    val dataReq = StructType(required.fields.filterNot(f =>
      pcs.contains(f.name)))
    val dataSchema = StructType(full.fields.filterNot(f =>
      pcs.contains(f.name)))
    // rows come out of the parquet closure as dataReq ++ partReq; remap
    // to the scan's declared order when they differ
    val emitted = StructType(dataReq.fields ++ partReq.fields)
    val readFunc = GraftSparkInternals.parquetReaderFunc(spark,
      dataSchema, partReq, dataReq)
    // the vectorized closure — None when the format can't guarantee
    // whole batches for this schema (then every split reads row-based)
    val batchFunc = GraftSparkInternals.parquetBatchReaderFunc(spark,
      dataSchema, partReq, dataReq)
    new SnapshotReaderFactory(readFunc, batchFunc, emitted, required,
      // partValues arrive in partCols order; the closure expects them
      // in partReq's order — same order by construction (both filter
      // `required`/partCols consistently), but map defensively
      pcs.zipWithIndex.filter { case (c, _) =>
        partReq.fieldNames.contains(c) }.map(_._2).toArray)
  }
}

private[graft] class SnapshotReaderFactory(
    readFunc: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow],
    batchFunc: Option[
      org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]],
    emitted: StructType, required: StructType, partValueIdx: Array[Int])
    extends PartitionReaderFactory {

  private def partRowOf(s: SnapshotFileSlice) =
    new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(partValueIdx.map(s.partValues(_)))

  /** Columnar decode whenever the format guarantees batches AND no
    * slice carries doomed positions (a MoR-reached split filters
    * per-row, so it decodes row-based; unreached splits — the common
    * case — stay vectorized). */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    batchFunc.nonEmpty && partition.asInstanceOf[SnapshotInputPartition]
      .slices.forall(_.doomed.isEmpty)

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[SnapshotInputPartition]
    val f = batchFunc.get
    val it = p.slices.iterator.flatMap { s =>
      f(GraftSparkInternals.partitionedFile(partRowOf(s),
        s.absPath, s.length))
    }
    // batches come out as emitted order (dataReq ++ partReq); when the
    // scan declared a different column order, re-wrap the batch with
    // its vectors permuted — zero-copy, the vectors themselves move
    val identity = emitted.fieldNames.sameElements(required.fieldNames)
    val remap =
      if (identity) null
      else required.fieldNames.map(emitted.fieldIndex)
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var cur: org.apache.spark.sql.vectorized.ColumnarBatch = _
      override def next(): Boolean =
        if (it.hasNext) {
          val b = it.next()
          cur =
            if (remap == null) b
            else {
              val wrapped = new org.apache.spark.sql.vectorized
                .ColumnarBatch(remap.map(b.column(_)))
              wrapped.setNumRows(b.numRows())
              wrapped
            }
          true
        } else false
      override def get()
          : org.apache.spark.sql.vectorized.ColumnarBatch = cur
      override def close(): Unit = ()
    }
  }

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SnapshotInputPartition]
    // files of one split read sequentially (lazy concat — one open
    // reader at a time); each file contributes its own partition values
    val it = p.slices.iterator.flatMap { s =>
      val pf = GraftSparkInternals.partitionedFile(partRowOf(s),
        s.absPath, s.length)
      // VECTORIZED decode even for MoR-reached slices (same rationale
      // as the CDC reader): batch decode, row-wise emission —
      // rowIterator keeps file order, so the doomed-position index
      // below still addresses parquet row indices exactly.
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
      if (s.doomed.isEmpty) rows
      else {
        // a MoR delete reaches this file: skip exactly the doomed
        // in-file row indices (sequential decode order IS the parquet
        // row index — same addressing deleteWhere records)
        var idx = -1L
        val doomed = s.doomed
        rows.filter { _ =>
          idx += 1
          java.util.Arrays.binarySearch(doomed, idx) < 0
        }
      }
    }
    val identity = emitted.fieldNames.sameElements(required.fieldNames)
    val project =
      if (identity) null
      else UnsafeProjection.create(required.fields.map { f =>
        val i = emitted.fieldIndex(f.name)
        BoundReference(i, emitted(i).dataType, nullable = true)
      }.toIndexedSeq)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val r = it.next()
          cur = if (project == null) r else project(r)
          true
        } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
