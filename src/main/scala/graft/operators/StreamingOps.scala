package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.{Engine, Tables}
import graft.functions.Exact._

/** Structured-Streaming-shaped operators. The reference has no true
  * streaming (SURVEY.md §2.8) — its closest analog is Airflow-scheduled
  * incremental batch append; `Trigger.AvailableNow` reproduces exactly
  * that "process what arrived, then stop" contract. The aggregation
  * logic is written once as DataFrame transforms and serves BATCH and
  * STREAM frames unchanged (Spark's unified model), which is how the
  * batch oracle differential covers the streaming semantics too.
  */
object StreamingOps {

  /** Tumbling 1-hour windows per event type: the canonical streaming
    * aggregation shape (groupBy(window(...))). Works on a batch OR
    * streaming DataFrame. Exact-decimal value sums (Exact.dsum) keep the
    * result independent of partial-aggregation order — which at 100 TB
    * also makes stream restarts/retries reproducible. */
  def eventWindows(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Batch entry over the events table (oracle-checked); window_start is
    * epoch-aligned so DuckDB's date_trunc('hour') agrees exactly. */
  def eventWindowsBatch(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    eventWindows(Tables.events(spark, sfDir))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Streaming variant with a 1-hour watermark: file-source stream →
    * windowed aggregate. Late data beyond the watermark is dropped —
    * the state-bound knob the batch analog doesn't need. */
  def eventWindowsStream(spark: SparkSession, srcDir: String,
      schema: StructType): DataFrame = {
    Engine.configure(spark)
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    eventWindows(stream.withWatermark("ts", "1 hour"))
  }

  /** Streaming exact-dedup with CUSTOM STATE via flatMapGroupsWithState
    * (the `KeyValueGroupedDataset` stateful path of the builder brief):
    * the first row per key is emitted, every later duplicate is dropped,
    * with one boolean of state per key. Unlike `dropDuplicates` on a
    * stream this form extends to richer policies (keep-best-quality,
    * emit-count-updates) by enriching the state type. Works on batch
    * Datasets too (state starts empty per key), which is how the spec
    * cross-checks it against `dropDuplicates`. */
  def dedupFirstSeen[T](grouped: org.apache.spark.sql.KeyValueGroupedDataset[String, T])(
      implicit enc: org.apache.spark.sql.Encoder[T])
      : org.apache.spark.sql.Dataset[T] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val stateEnc: org.apache.spark.sql.Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    grouped.flatMapGroupsWithState[Boolean, T](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: String, rows: Iterator[T], state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          if (rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
        }
    }
  }

  /** Streaming bronze: CSV file source → batch-metadata stamp → parquet
    * sink, Trigger.AvailableNow — the faithful Structured Streaming
    * restatement of the reference's hourly bronze DAG (SURVEY.md §2.8).
    * Caller starts the returned writer (`.start().awaitTermination()`). */
  def bronzeCsvStream(spark: SparkSession, srcDir: String,
      schema: StructType, sink: String, checkpoint: String)
      : DataStreamWriter[Row] = {
    Engine.configure(spark)
    val incoming = spark.readStream.schema(schema)
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(srcDir) // same reader options as batch S1
    SilverCleanse.withBatchMetadata(incoming)
      .writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
  }
}
