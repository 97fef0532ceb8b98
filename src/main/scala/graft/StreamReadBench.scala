package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SnapshotTable
import graft.sources.{SnapshotInputPartition, SnapshotMicroBatchStream, SnapshotOffset}

/** Streaming-source decode A/B: ROW closure vs VECTORIZED
  * (ColumnarBatch) decode over the same planned splits — the round-14
  * "honest v1 cost" (row-based parquet decode, a 2-5× constant on
  * backfill scans) vs the round-15 columnar PartitionReaderFactory.
  * Both paths drain every split of one backfill batch through the
  * SAME factory (createReader vs createColumnarReader), so the A/B
  * isolates decode — planning, bin-packing and file set are identical.
  *
  * Usage: `sbt "runMain graft.StreamReadBench"` → one JSON line,
  * archived as bench_archive/stream_read_ab_r15.json.
  */
object StreamReadBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("stream-read-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "target/stream_read_bench/t"
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    val n = 4000000L
    val base = spark.range(n).select(
      format_string("K%09d", col("id")).as("claim_id"),
      lit("b1").as("batch_id"),
      (col("id") % 1000).cast("double").as("claim_amount"),
      lit(2000).as("service_year"),
      ((col("id") % 6) + 1).cast("int").as("service_month"))
    SnapshotTable.append(spark, dir,
      base.repartitionByRange(8, col("claim_id")))

    val schema = SnapshotTable.tableSchema(spark, dir).get
    val stream = new SnapshotMicroBatchStream(dir, schema, schema)
    val splits = stream.planInputPartitions(SnapshotOffset(0),
      SnapshotOffset(SnapshotTable.latestVersion(spark, dir)))
    val factory = stream.createReaderFactory()
    require(splits.forall(factory.supportColumnarReads),
      "the A/B needs a schema the vectorized reader supports")

    def drainRows(): Long = {
      var rows = 0L
      splits.foreach { p =>
        val r = factory.createReader(p)
        while (r.next()) { r.get(); rows += 1 }
        r.close()
      }
      rows
    }
    def drainBatches(): Long = {
      var rows = 0L
      splits.foreach { p =>
        val r = factory.createColumnarReader(p)
        while (r.next()) rows += r.get().numRows()
        r.close()
      }
      rows
    }
    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e6, rows)
    }
    // warm both paths once (codegen/JIT), then min-of-2 timed
    drainRows(); drainBatches()
    val rowRuns = Seq.fill(2)(timed(drainRows()))
    val batchRuns = Seq.fill(2)(timed(drainBatches()))
    val rowMs = rowRuns.map(_._1).min
    val batchMs = batchRuns.map(_._1).min
    require(rowRuns.forall(_._2 == n) && batchRuns.forall(_._2 == n),
      s"both paths must decode all $n rows")
    println(s"""{"metric":"stream_read_row_vs_columnar","unit":"ms",""" +
      s""""rows":$n,"splits":${splits.length},""" +
      f""""row_ms":$rowMs%.1f,"columnar_ms":$batchMs%.1f,""" +
      f""""speedup":${rowMs / batchMs}%.2f}""")
    spark.stop()
  }
}
