package graft

import org.apache.spark.sql.SparkSession

/** Session configuration shared by every entry point.
  *
  * All settings are runtime-settable SQL confs, so this is safe to call on a
  * session the driver built. Idempotent.
  */
object Engine {
  def configure(spark: SparkSession): SparkSession = {
    // Reference semantics are non-ANSI: malformed dates → null, not error
    // (jobs/silver/claims_to_iceberg.py:60-63 relies on to_date returning
    // null for unparseable input).
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // events.parquet stores ts as INT64 TIMESTAMP(NANOS); Spark refuses it
    // unless read as long — Tables.events converts back to a timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
