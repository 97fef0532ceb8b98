package org.apache.spark.sql

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** The narrow bridge graft's DataSource-V2 streaming source uses to
  * reach Spark's own parquet read machinery (`private[sql]` surface,
  * hence this file's package): instead of hand-rolling a parquet
  * decoder inside the source's PartitionReader, the source plans with
  * the SAME `PartitionedFile => Iterator[InternalRow]` closure
  * FileSourceScanExec ships to executors — full type support (INT96 /
  * µs timestamps, dates, decimals), predicate-safe NULL handling, and
  * one maintained read path instead of two.
  *
  * The ROW function is built with the VECTORIZED reader disabled on a
  * cloned session: the vectorized path can yield ColumnarBatch objects
  * through the Iterator[InternalRow] interface (FileSourceScanExec
  * special-cases that), which a row-based DSv2 PartitionReader must
  * never receive. The BATCH function (round-14 VERDICT #3's named
  * upgrade path) is the same closure built vectorized, exposed only
  * when ParquetFileFormat itself guarantees whole batches for the
  * schema (`supportBatch` — the exact test FileSourceScanExec runs
  * before declaring a columnar scan), so the caller's columnar
  * PartitionReader can cast unconditionally. */
object GraftSparkInternals { // public: graft.sources is the one caller

  private def cloned(spark: SparkSession, vectorized: Boolean)
      : org.apache.spark.sql.classic.SparkSession = {
    val session = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()
    session.conf.set("spark.sql.parquet.enableVectorizedReader",
      vectorized.toString)
    session
  }

  /** A serializable per-file reader: rows come out as `requiredSchema`
    * fields followed by `partitionSchema` fields (the partition values
    * are appended from [[PartitionedFile.partitionValues]]). */
  def parquetReaderFunc(spark: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType)
      : PartitionedFile => Iterator[InternalRow] = {
    val session = cloned(spark, vectorized = false)
    new ParquetFileFormat().buildReaderWithPartitionValues(
      session, dataSchema, partitionSchema, requiredSchema,
      Nil, Map.empty,
      session.sessionState.newHadoopConfWithOptions(Map.empty))
  }

  /** The VECTORIZED per-file reader: yields whole [[ColumnarBatch]]es
    * of `requiredSchema` fields followed by `partitionSchema` fields
    * (partition values ride as constant column vectors). None when the
    * parquet format cannot guarantee batches for this schema (nested /
    * non-atomic types, vectorization disabled session-wide) — the
    * caller falls back to [[parquetReaderFunc]], exactly as
    * FileSourceScanExec falls back to a row scan. */
  def parquetBatchReaderFunc(spark: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType)
      : Option[PartitionedFile => Iterator[ColumnarBatch]] = {
    val session = cloned(spark, vectorized = true)
    val fmt = new ParquetFileFormat()
    val resultSchema =
      StructType(requiredSchema.fields ++ partitionSchema.fields)
    if (!fmt.supportBatch(session, resultSchema)) None
    else {
      // ParquetFileFormat demands the caller state the batch contract
      // explicitly whenever the vectorized reader is on
      val opts = Map(
        org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "true")
      val f = fmt.buildReaderWithPartitionValues(
        session, dataSchema, partitionSchema, requiredSchema,
        Nil, opts,
        session.sessionState.newHadoopConfWithOptions(Map.empty))
      // with supportBatch true the vectorized reader emits ColumnarBatch
      // through the Iterator[InternalRow] interface (the erased-cast
      // contract FileSourceScanExec itself relies on)
      Some(pf => f(pf).asInstanceOf[Iterator[ColumnarBatch]])
    }
  }

  def partitionedFile(partitionValues: InternalRow, absolutePath: String,
      length: Long): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPathString(absolutePath),
      0L, length, Array.empty, 0L, length, Map.empty)
}
