package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.{Engine, Tables}
import graft.functions.Exact._
import graft.functions.TextFunctions._

/** Text-analysis / deduplication queries over the `documents` table —
  * the training-data-pipeline operator family (builder brief): token
  * counting, language ID, quality scoring, exact + n-gram-Jaccard
  * near-dedup. All per-row work is codegen'd Column expressions; the only
  * shuffles are the final small aggregations and the blocked self-join.
  */
object TextOps {

  /** Per-language token statistics. Sums are over longs (exact). */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars"),
        tokenCount(col("text")).as("n_tokens"),
        charCount(col("text")).as("n_nonspace_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_tokens")).cast(DoubleType)
          .divide(count(lit(1))).as("avg_tokens"),
        sum(col("n_nonspace_chars")).cast(DoubleType)
          .divide(sum(col("n_tokens")).cast(DoubleType)).as("avg_word_len"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))
  }

  /** Declared-vs-detected language confusion matrix for the marker-based
    * language-ID heuristic. */
  def langConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    Tables.documents(spark, sfDir)
      .select(col("lang"), langId(col("text")).as("detected_lang"))
      .groupBy(col("lang"), col("detected_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("detected_lang"))
  }

  /** Per-source quality-score rollup (exact decimal mean). */
  def textQualityBySource(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    Tables.documents(spark, sfDir)
      .select(col("source"), textQuality(col("text")).as("q"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("q").cast(Wide)).cast(DoubleType)
          .divide(count(lit(1))).as("avg_quality"),
        min(col("q")).as("min_quality"),
        max(col("q")).as("max_quality"),
        countIf(col("q") >= 0.8).as("high_quality_docs"))
      .orderBy(col("source"))
  }

  /** Exact-dedup summary: md5 over normalized text, one aggregate pass.
    * At 100 TB this is groupBy(128-bit hash) — shuffle bytes ∝ distinct
    * documents, with map-side partial aggregation. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val hashed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), contentHash(col("text")).as("h"))
    hashed.groupBy(col("h")).agg(
        count(lit(1)).as("copies"), min(col("doc_id")).as("keep_id"))
      .agg(
        count(lit(1)).as("distinct_texts"),
        sum(col("copies")).as("total_docs"),
        countIf(col("copies") > 1).as("dup_groups"),
        (sum(col("copies")) - count(lit(1))).as("redundant_docs"))
  }

  /** Near-duplicate pairs by exact n-gram (3-shingle) Jaccard within
    * (lang, source) blocks. The blocked self-join bounds pair count by
    * block size² — the same blocking that makes this viable at scale
    * (full O(n²) is never materialized). Jaccard is a ratio of integer
    * set sizes: engine-exact, no float hazard. */
  def nearDupPairs(spark: SparkSession, sfDir: String,
      threshold: Double = 0.08): DataFrame = {
    Engine.configure(spark)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        shingles(col("text"), 3).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("lang"),
      col("source"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("lang"),
      col("source"), col("sh").as("sh_b"))
    a.join(b, Seq("lang", "source"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("lang"), col("source"),
        col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
