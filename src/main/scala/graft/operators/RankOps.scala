package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Distributed EXACT rank selection (quantile_disc semantics) for
  * low-cardinality group keys — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(lowCardKey))`.
  *
  * The window form hash-partitions on the GROUP key alone, so with a
  * handful of languages/event-types every key's ENTIRE value population
  * sorts inside ONE task — correct and fast at sf0.1, a single-reducer
  * wall at 100× (round-6 VERDICT item 3). Exact rank selection does not
  * need co-located groups; it needs a TOTAL ORDER and rank arithmetic:
  *
  *  1. range-partition + locally sort the skinny (key, value, tiebreak)
  *     frame on the full total order — one key's population spans MANY
  *     partitions, each holding a contiguous run;
  *  2. pass 1: per-partition per-key run lengths (mapPartitions; output
  *     is partitions × keys rows — metadata, collected to the driver
  *     like any model state). From these: each key's total n → target
  *     ranks ⌈n·d/B⌉, and each (partition, key)'s global rank OFFSET =
  *     that key's rows in earlier partitions;
  *  3. pass 2: re-walk the same partitions, counting local rank per
  *     key; emit rows whose offset+local rank hits a target. Same exact
  *     answer as the window form, no per-key reducer.
  *
  * Both passes read ONE staged materialization ([[Engine.stage]]) of the
  * sorted frame: repartitionByRange picks its range boundaries by
  * sampling, so re-evaluating the plan between passes could re-draw
  * boundaries and silently invalidate the offsets. The staged payload is
  * three scalars per row — squarely inside the staging size doctrine.
  * mapPartitions (not an Expression/window) is the right tool here:
  * per-partition run-length accounting is genuinely imperative
  * partition-sequential logic, the (d) case of the custom-operator
  * preference order.
  */
object RankOps {

  /** Deciles (B = `buckets`, reporting d = 1..B−1) of `valueCol` per
    * `keyCol`, exact rank selection at rank ⌈n·d/B⌉ under the total
    * order (value, tie1, tie2). Input columns are cast: key → string,
    * value/ties → long. Returns (keyCol, "decile", valueCol) rows.
    *
    * `tie2` may be a constant column for call sites with one tiebreaker;
    * the (tie1, tie2) pair must make the total order strict (unique per
    * row) for deterministic ties. */
  /** Hard bound on DISTINCT group keys: pass-1 state is partitions ×
    * keys rows on the driver, which is metadata for the operator's
    * design domain (languages, event types) but a silent driver flood
    * for an id-like key. The guard fails the job loudly INSIDE pass 1
    * (executor-side, before any collect materializes) — a range
    * partition holds a contiguous key run, so any partition exceeding
    * `MaxKeys` proves the whole frame does. */
  val MaxKeys = 10000

  def decilesOf(spark: SparkSession, vals: DataFrame, keyCol: String,
      valueCol: String, tie1: String, tie2: Option[String],
      buckets: Int = 10): DataFrame = {
    import spark.implicits._
    val prepared = vals.select(
      col(keyCol).cast("string").as("k"),
      col(valueCol).cast("long").as("v"),
      col(tie1).cast("long").as("t1"),
      tie2.map(col(_).cast("long")).getOrElse(lit(0L)).as("t2"))
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = Engine.stage(
      prepared.repartitionByRange(parts, $"k", $"v", $"t1", $"t2")
        .sortWithinPartitions($"k", $"v", $"t1", $"t2"))
    val sortedDs = sorted.as[(String, Long, Long, Long)]
    // pass 1: per-(partition, key) run lengths — metadata-sized
    val runs: Array[(Int, String, Long)] = sortedDs.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { r =>
        m.update(r._1, m.getOrElse(r._1, 0L) + 1L)
        if (m.size > MaxKeys)
          throw new IllegalArgumentException(
            s"decilesOf: more than $MaxKeys distinct values of a group " +
              "key — this operator's driver state is partitions × keys; " +
              "an id-like key needs approxQuantile or a per-key " +
              "aggregation instead")
      }
      m.iterator.map { case (k, c) => (pid, k, c) }
    }.collect()
    // contiguous ranges mean k keys over p partitions yield at most
    // k + p − 1 runs, so this enforces total distinct keys ≤ MaxKeys
    require(runs.length < MaxKeys + parts,
      s"decilesOf: ${runs.length} (partition, key) runs imply more than " +
        s"$MaxKeys distinct group keys — use approxQuantile or a per-key " +
        "aggregation for id-like keys")
    // driver arithmetic over partitions × keys rows
    val targets: Map[String, Map[Long, Seq[Int]]] =
      runs.groupBy(_._2).map { case (k, rs) =>
        val n = rs.map(_._3).sum
        k -> (1 until buckets)
          .map(d => ((n * d + buckets - 1) / buckets, d))
          .groupBy(_._1).map { case (r, ds) => r -> ds.map(_._2) }
      }
    val offsets: Map[(Int, String), Long] =
      runs.groupBy(_._2).flatMap { case (k, rs) =>
        var cum = 0L
        rs.sortBy(_._1).map { case (pid, _, c) =>
          val e = (pid, k) -> cum; cum += c; e
        }
      }
    val bTargets = spark.sparkContext.broadcast(targets)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: same staged partitions, emit rank hits
    val hits = sortedDs.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var curKey: String = null
      var local = 0L
      var off = 0L
      var tg: Map[Long, Seq[Int]] = Map.empty
      it.flatMap { case (k, v, _, _) =>
        if (k != curKey) {
          curKey = k
          local = 0L
          off = bOffsets.value.getOrElse((pid, k), 0L)
          tg = bTargets.value.getOrElse(k, Map.empty)
        }
        local += 1L
        tg.getOrElse(off + local, Nil).map(d => (k, d, v))
      }
    }.toDF("k", "decile", "v")
    hits.select(col("k").as(keyCol), col("decile"),
        col("v").as(valueCol))
      .orderBy(col(keyCol), col("decile"))
  }
}
