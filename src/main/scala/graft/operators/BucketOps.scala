package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (builder brief: "repartition()/bucketing
  * for co-located joins"). Writing both fact tables bucketed AND sorted
  * by the join key lets every subsequent join on that key plan WITHOUT a
  * shuffle on either side — at 100 TB this converts the dominant
  * fact-fact join cost (two full-data exchanges per query) into zero,
  * paid once at write time. The bucket count would be sized so one
  * bucket ≈ one executor-core's working set (thousands at scale; small
  * here). */
object BucketOps {

  /** Persist `df` as a managed table bucketed+sorted on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed: warehouse dir

  /** Join two same-bucketed tables on their bucket key — plans as a
    * zero-exchange sort-merge join (the spec asserts no
    * ShuffleExchange). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
