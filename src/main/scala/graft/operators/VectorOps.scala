package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * variant as the scale path (candidate generation by random-hyperplane
  * signature, exact re-rank inside buckets).
  */
object VectorOps {

  /** Per-vector L2 norms + per-label rollup input; exact-oracle-checked. */
  def embeddingNorms(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        l2Norm(col("embedding")).as("l2_norm"))
      .orderBy(col("vec_id"))
  }

  /** Exact brute-force cosine top-k: queries (vec_id < 5) × corpus.
    *
    * The query side is tiny and broadcast, so the corpus streams through
    * one codegen'd stage — at 100 TB the cost is one corpus scan per
    * query batch, the correct baseline. Ranking uses cosine rounded to 9
    * decimals with vec_id tiebreak so ordering is stable across engines.
    */
  def annBruteForce(spark: SparkSession, sfDir: String, k: Int = 5)
      : DataFrame = {
    Engine.configure(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("qv"), col("embedding")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Random-hyperplane LSH signature: `planes` pseudo-random hyperplanes
    * derived deterministically from (plane index, dimension) via a hash —
    * no RNG, so signatures are reproducible across runs and engines.
    * Vectors agreeing on all `planes` sign bits land in one bucket. */
  def lshSignature(v: org.apache.spark.sql.Column, planes: Int, dims: Int)
      : org.apache.spark.sql.Column = {
    // plane p component d: map xxhash64(p, d) to a value in [-1, 1]
    def planeComponent(p: Int, d: Int) = {
      val h = xxhash64(lit(p), lit(d))
      (h % 1000003L).cast("double") / 1000003.0
    }
    val bits = (0 until planes).map { p =>
      val proj = (0 until dims).map { d =>
        element_at(v, d + 1).cast("double") * planeComponent(p, d)
      }.reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: signature → bucket self-join → exact cosine
    * re-rank within bucket. Trades recall for turning the O(n²) cross
    * join into a per-bucket join — the 100 TB path. Returns candidate
    * pairs above `minCos`. */
  def annLsh(spark: SparkSession, sfDir: String, planes: Int = 12,
      minCos: Double = 0.2): DataFrame = {
    Engine.configure(spark)
    val dims = 64
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        lshSignature(col("embedding"), planes, dims).as("bucket"))
    val a = emb.select(col("vec_id").as("id_a"),
      col("embedding").as("va"), col("bucket"))
    val b = emb.select(col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("bucket"))
    a.join(b, "bucket").filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("va"), col("vb")).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
      .orderBy(col("id_a"), col("id_b"))
  }
}
