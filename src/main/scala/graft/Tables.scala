package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * Each table is one parquet file under the scale-factor directory. At
  * cluster scale these would be directories of many files — the API is
  * identical, so nothing here changes at 100 TB; Spark parallelism comes
  * from parquet row-groups / file splits, not from this code.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.ts has changed physical parquet type across fixture
    * regenerations (INT64 TIMESTAMP(NANOS) through round 6;
    * TIMESTAMP(MICROS) from round 7), so the loader branches on the
    * LOADED schema instead of assuming one encoding:
    *
    *  - LongType — the NANOS case: Spark's vectorized reader rejects
    *    TIMESTAMP(NANOS) unless `spark.sql.legacy.parquet.nanosAsLong`
    *    (set here and in [[graft.Engine.configure]]; a no-op for µs/ms
    *    files) delivers it as a raw long, which we floor-truncate to µs.
    *  - TimestampNTZType — µs/ms files written without UTC adjustment;
    *    cast to the session-zone timestamp the operators expect (exact:
    *    session zone is UTC per Engine.configure, so the wall-clock
    *    reading IS the instant).
    *  - TimestampType — µs/ms files written isAdjustedToUTC; pass through.
    *
    * Every downstream operator therefore always sees `ts: TIMESTAMP` at
    * µs precision. The DuckDB oracle side is encoding-agnostic too:
    * `CAST(ts AS TIMESTAMP)` floor-truncates ns→µs and is the identity
    * on µs/ms — see Oracles.scala. TablesSpec pins all three branches
    * against the next regeneration. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ branch's cast interprets the wall-clock reading in the
    // SESSION time zone — pin it to UTC here, not only in
    // Engine.configure, so a caller that skips configure in a non-UTC
    // JVM still gets unshifted instants (the ns-long branch is
    // zone-independent; this makes the NTZ branch match).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other (expected INT64 ns-long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Raw path of a table (for metadata-level fingerprinting — see
    * [[graft.operators.ModelStore.corpusFingerprint]]). */
  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"
  def embeddingsPath(sfDir: String): String = path(sfDir, "embeddings")
  def lineitemPath(sfDir: String): String = path(sfDir, "lineitem")
  def documentsPath(sfDir: String): String = path(sfDir, "documents")
}
