package org.apache.spark.sql

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** The narrow bridge graft's DataSource-V2 streaming source uses to
  * reach Spark's own parquet read machinery (`private[sql]` surface,
  * hence this file's package): instead of hand-rolling a parquet
  * decoder inside the source's PartitionReader, the source plans with
  * the SAME `PartitionedFile => Iterator[InternalRow]` closure
  * FileSourceScanExec ships to executors — full type support (INT96 /
  * µs timestamps, dates, decimals), predicate-safe NULL handling, and
  * one maintained read path instead of two.
  *
  * The function is built with the VECTORIZED reader disabled on a
  * cloned session: the vectorized path can yield ColumnarBatch objects
  * through the Iterator[InternalRow] interface (FileSourceScanExec
  * special-cases that), which a row-based DSv2 PartitionReader must
  * never receive. Row-based parquet decoding is the honest v1 cost of
  * the streaming source; the upgrade path is a columnar
  * PartitionReaderFactory over the same closure. */
object GraftSparkInternals { // public: graft.sources is the one caller

  /** A serializable per-file reader: rows come out as `requiredSchema`
    * fields followed by `partitionSchema` fields (the partition values
    * are appended from [[PartitionedFile.partitionValues]]). */
  def parquetReaderFunc(spark: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType)
      : PartitionedFile => Iterator[InternalRow] = {
    val session = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()
    session.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    new ParquetFileFormat().buildReaderWithPartitionValues(
      session, dataSchema, partitionSchema, requiredSchema,
      Nil, Map.empty,
      session.sessionState.newHadoopConfWithOptions(Map.empty))
  }

  def partitionedFile(partitionValues: InternalRow, absolutePath: String,
      length: Long): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPathString(absolutePath),
      0L, length, Array.empty, 0L, length, Map.empty)
}
