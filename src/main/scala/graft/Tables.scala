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
  /** events.ts is parquet INT64 TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; with `spark.sql.legacy.parquet.nanosAsLong` (set by
    * [[graft.Engine.configure]]) it arrives as a long we truncate to
    * microseconds. DuckDB preserves TIMESTAMP_NS on read, so every oracle
    * over events applies the matching truncation explicitly
    * (`CAST(ts AS TIMESTAMP)` floor-truncates ns→µs) — see Oracles.scala;
    * comparison stays exact even if events carry sub-µs components. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
