package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (builder brief: "salting for skew, AQE
  * for runtime re-plan").
  *
  * AQE's skew-join handles sort-merge cases adaptively at runtime
  * (enabled in Engine.configure); explicit salting remains the tool of
  * choice when a known-hot key must never land on one reducer — e.g. the
  * UNKNOWN provider bucket that the silver cleanse deliberately funnels
  * every null/blank provider into, which at 100 TB is a classic
  * mega-key.
  */
object SkewOps {

  /** Replicate-and-scatter equi-join: the build side is replicated
    * `salt` ways (explode over 0..salt-1), the probe side scatters each
    * row to one replica via a deterministic hash of `scatterBy` — one
    * hot key becomes `salt` evenly-loaded reducers instead of one
    * straggler. Result is row-identical to `fact.join(dim, key)`
    * (inner); `scatterBy` only picks the replica, never changes
    * membership. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
      scatterBy: Column): DataFrame = {
    require(salt > 0, "salt must be positive")
    val scattered = fact.withColumn("__salt",
      pmod(xxhash64(scatterBy), lit(salt.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    scattered.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for hot grouping keys —
    * partial aggregate on (key, salt-of-row), then final aggregate on
    * key. Spark's partial/final HashAggregate already does this for
    * algebraic aggregates; this explicit form is for the cases partial
    * aggregation can't save: exact COUNT(DISTINCT x) on a hot key, where
    * the expand+shuffle sends every distinct value of the mega-key to
    * one reducer. Phase 1 dedups (key, x) within salt buckets, phase 2
    * counts — both shuffles are spread over `salt` reducers. */
  def saltedDistinctCount(df: DataFrame, key: String, distinctOn: String,
      salt: Int): DataFrame = {
    val bucketed = df.withColumn("__salt",
      pmod(xxhash64(col(distinctOn)), lit(salt.toLong)).cast("int"))
    bucketed
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(distinctOn)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"distinct_$distinctOn"))
  }
}
