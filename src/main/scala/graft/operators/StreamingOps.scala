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

  /** Streaming NEAR-dup pair detection — the banded-simhash extension of
    * [[dedupFirstSeen]] (round-2 VERDICT item 4): signatures are computed
    * per document in the stream (codegen'd
    * [[graft.functions.TextFunctions.simhash48]]), exploded into the same
    * 4×12-bit bands as the batch [[TextOps.simhashPairs]], and grouped
    * per band value with `flatMapGroupsWithState`; state = the (doc_id,
    * signature) list seen in that band bucket. Each arriving document is
    * compared against its bucket's state by exact hamming distance and
    * every match ≤ `maxHamming` is emitted as a pair.
    *
    * Parity with the batch operator: a pair is emitted iff the two
    * signatures agree on ≥1 band AND hamming ≤ maxHamming — exactly the
    * batch candidate+verify contract — so on the same files the emitted
    * pair SET equals the batch result (the spec asserts it). Pairs
    * agreeing on several bands emit once per band (at-least-once;
    * downstream `dropDuplicates` restores exactly-once — cross-band
    * dedup would need a second stateful stage keyed on the pair).
    *
    * Scale bounds: state per band bucket is capped at `maxBucket`
    * signatures (the same recall-vs-safety knob as the batch
    * BoundedCollectSet; beyond it, new signatures still PAIR against the
    * tracked set but stop enrolling — no unbounded state). 16 bytes per
    * tracked signature: a band bucket costs at most 16·maxBucket bytes
    * of store. */
  def simhashPairsStream(docs: DataFrame, maxHamming: Int = 12,
      maxBucket: Int = 1000): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.functions.TextFunctions.{simhash48, shinglesOf, tokens}
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.withColumn("t", tokens(col("text")))
      .select(col("doc_id"), simhash48(shinglesOf(col("t"), 3)).as("simhash"))
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("simhash"), j * 12).bitwiseAND(lit(4095L))): _*))
        .as(Seq("band_idx", "band_val")))
      .select(concat_ws(":", col("band_idx"), col("band_val")).as("band"),
        col("doc_id"), col("simhash"))
      .as[(String, Long, Long)]
    banded.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Long)], (Long, Long, Int)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Long, Long)],
            state: GroupState[Seq[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Vector.empty)
          val out = Seq.newBuilder[(Long, Long, Int)]
          rows.foreach { case (_, docId, sig) =>
            seen.foreach { case (d2, s2) =>
              if (d2 != docId) {
                val ham = java.lang.Long.bitCount(sig ^ s2)
                if (ham <= maxHamming)
                  out += ((math.min(docId, d2), math.max(docId, d2), ham))
              }
            }
            if (seen.size < maxBucket) seen = seen :+ ((docId, sig))
          }
          state.update(seen)
          out.result().iterator
      }
      .toDF("doc_a", "doc_b", "hamming")
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
