package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** Deterministic SCD1 upsert over the partitioned silver layout
  * (round-10 VERDICT #4). The reference is append-only and lists MERGE
  * as roadmap (reference README.md:192); real claims pipelines correct
  * records. Semantics: latest version (batch_id) wins per claim_id;
  * replaying the same batch is a no-op (base wins version ties), so the
  * operator is idempotent.
  *
  * Scale shape — cost ∝ CHANGE, not table size:
  *  1. Affected partitions come from the UPDATES alone (tiny driver
  *     state). Precondition, validated by the fixture and documented as
  *     the operator contract: a key's partition columns are stable
  *     across versions (a claim correction keeps its service period —
  *     the reference's (service_year, service_month) layout assumes
  *     exactly this). A correction that moves a claim across periods
  *     needs a key→partition index (a catalog concern) and is out of
  *     scope here.
  *  2. Only those partitions are read (PartitionFilter pruning via
  *     [[IncrementalGold.partitionSlice]]) and merged with the updates;
  *     one keyed shuffle bounded by the affected slice resolves
  *     winners.
  *  3. The merged result is written to a staging dir and committed by
  *     SWAPPING exactly the affected partition directories — a
  *     metadata-level rename per partition, the same commit shape a
  *     table format (Iceberg/Delta) performs in its snapshot log.
  *     Untouched partitions' files are never rewritten (spec-pinned
  *     byte-identical).
  */
object Upsert {

  /** HDFS-style relative dir for one (service_year, service_month)
    * partition; None → Spark's null-partition sentinel. */
  private[graft] def partitionRelPath(p: (Option[Int], Option[Int]))
      : String = {
    def v(o: Option[Int]) = o.map(_.toString)
      .getOrElse("__HIVE_DEFAULT_PARTITION__")
    s"service_year=${v(p._1)}/service_month=${v(p._2)}"
  }

  /** Upsert `updates` (silver-shaped rows carrying batch_id) into the
    * partitioned parquet table at `tableDir`. Latest batch_id wins per
    * claim_id; base wins ties (idempotent replay). Returns the affected
    * partitions. */
  def scd1(spark: SparkSession, tableDir: String, updates: DataFrame,
      key: String = "claim_id", version: String = "batch_id")
      : Seq[(Option[Int], Option[Int])] = {
    val parts = updates
      .select(col("service_year"), col("service_month")).distinct()
      .collect()
      .map(r => (
        Option(r.getAs[Integer]("service_year")).map(_.intValue),
        Option(r.getAs[Integer]("service_month")).map(_.intValue)))
      .toSeq
    if (parts.isEmpty) return Nil
    val base = spark.read.parquet(tableDir)
    val slice = IncrementalGold.partitionSlice(base, parts)
    // __src: base wins version ties so re-applying a batch is a no-op
    val merged = slice.withColumn("__src", lit(1))
      .unionByName(updates.withColumn("__src", lit(0)))
    val w = Window.partitionBy(col(key))
      .orderBy(col(version).desc, col("__src").desc)
    val latest = merged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__src")
    // stage the rewritten partitions, then commit by directory swap
    val stagingDir = s"${tableDir.replaceAll("[/\\\\]+$", "")}__upsert_staging"
    val staging = new Path(stagingDir)
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(staging)) fs.delete(staging, true)
    latest.write.mode("overwrite")
      .partitionBy(IncrementalGold.PartCols: _*).parquet(stagingDir)
    parts.foreach { p =>
      val rel = partitionRelPath(p)
      val src = new Path(s"$stagingDir/$rel")
      val dst = new Path(s"$tableDir/$rel")
      if (fs.exists(src)) {
        if (fs.exists(dst)) fs.delete(dst, true)
        fs.mkdirs(dst.getParent)
        fs.rename(src, dst)
      }
    }
    fs.delete(staging, true)
    parts
  }

  /** `q_upsert_claims`: the MERGE the reference lists as roadmap, as an
    * oracle-checked query. Fixture: batch 1 = the full claims silver;
    * batch 2 = CORRECTIONS (amount restated +500 for every 10th order
    * of the 1998+ periods — recent periods, the realistic correction
    * window, which leaves pre-1998 partitions untouched for the spec's
    * byte-identity pin) plus NEW claims (every 17th 1998+ order,
    * key-shifted by 10⁸ so ids are fresh), both run through the SAME
    * cleanse chain as the base. After the upsert the table holds, per
    * claim_id, exactly the latest batch's row. The DuckDB oracle
    * replays both batches through the cleanse CTEs and takes the
    * per-key latest via a window — row-level value equality over the
    * whole table. */
  def upsertClaimsE2e(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val leaf = sfDir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last
    val base = s"target/upsert_claims/$leaf"
    val root = new Path(base)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    val tableDir = s"$base/silver"
    runUpsertFixture(spark, sfDir, tableDir)
    spark.read.parquet(tableDir)
      .select(col("claim_id"), col("batch_id"), col("claim_amount"),
        col("service_year"), col("service_month"))
      .orderBy(col("claim_id"))
  }

  /** The shared base-ingest + upsert chain (query + spec). */
  private[graft] def runUpsertFixture(spark: SparkSession, sfDir: String,
      tableDir: String,
      afterBase: () => Unit = () => ()): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    def chain(src: DataFrame, clock: String): DataFrame =
      SilverCleanse.withBatchMetadata(
        SilverCleanse.clean(RawClaims.fromOrders(Engine.spread(src)),
          passthrough = Nil),
        to_timestamp(lit(clock)))
    Bronze.writeSilver(chain(orders, "2024-01-01 00:00:00"), tableDir)
    afterBase()
    val k = col("o_orderkey")
    val recent = col("o_orderdate") >= lit("1998-01-01").cast("date")
    val corrections = orders.filter(recent && k % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 500)
    val inserts = orders.filter(recent && k % 17 === 0)
      .withColumn("o_orderkey", k + lit(100000000L))
    val updates = chain(corrections.unionByName(inserts),
      "2024-01-02 00:00:00")
    scd1(spark, tableDir, updates)
    updates
  }
}
