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

  /** One `column <op> literal` bound found in a predicate's top-level
    * conjuncts. `op` ∈ {">", ">=", "<", "<=", "="} with the column on
    * the LEFT (flipped if the literal was). Numeric literals carry
    * `num`; strings and DATE literals carry their lexicographic ISO
    * rendering in `str`. */
  final case class PredBound(column: String, op: String,
      numeric: Boolean, num: Double, str: String)

  /** The derivable bounds of a predicate [[Column]], read from its
    * ColumnNode tree (Spark 4 hides the expression behind the node
    * indirection; the node classes are private[sql], hence this
    * file's package). Only shapes whose semantics are certain yield a
    * bound — `AND` splits, `column <cmp> literal` (either order)
    * records, everything else (OR, casts of columns, function calls,
    * IN) contributes nothing, so a consumer pruning by these bounds
    * can only over-read, never drop a matching row. */
  def predicateBounds(c: Column): Seq[PredBound] = {
    import org.apache.spark.sql.internal._
    def conjuncts(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UnresolvedFunction
          if f.functionName.equalsIgnoreCase("and") =>
        f.arguments.flatMap(conjuncts)
      case other => Seq(other)
    }
    def nameOf(n: ColumnNode): Option[String] = n match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        Some(a.nameParts.head)
      case _ => None
    }
    def litOf(n: ColumnNode): Option[(Boolean, Double, String)] = n match {
      case l: Literal => l.value match {
        case null => None
        case v: java.lang.Number =>
          Some((true, v.doubleValue(), v.toString))
        case v: String => Some((false, Double.NaN, v))
        case v: java.sql.Date =>
          Some((false, Double.NaN, v.toLocalDate.toString))
        case v: java.time.LocalDate => Some((false, Double.NaN, v.toString))
        case _ => None
      }
      case cast: Cast
          if cast.dataType == org.apache.spark.sql.types.DateType =>
        litOf(cast.child).flatMap { case (_, _, s) =>
          scala.util.Try(java.time.LocalDate.parse(s)).toOption
            .map(d => (false, Double.NaN, d.toString))
        }
      case _ => None
    }
    val flip = Map(">" -> "<", "<" -> ">", ">=" -> "<=", "<=" -> ">=",
      "=" -> "=", "==" -> "=")
    conjuncts(c.node).flatMap {
      case f: UnresolvedFunction if flip.contains(f.functionName) &&
          f.arguments.size == 2 =>
        val a = f.arguments.head
        val b = f.arguments(1)
        val op = if (f.functionName == "==") "=" else f.functionName
        (nameOf(a), litOf(b), nameOf(b), litOf(a)) match {
          case (Some(n), Some(v), _, _) =>
            Seq(PredBound(n, op, v._1, v._2, v._3))
          case (_, _, Some(n), Some(v)) =>
            Seq(PredBound(n, flip(op), v._1, v._2, v._3))
          case _ => Nil
        }
      case _ => Nil
    }
  }

  def partitionedFile(partitionValues: InternalRow, absolutePath: String,
      length: Long): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPathString(absolutePath),
      0L, length, Array.empty, 0L, length, Map.empty)
}
