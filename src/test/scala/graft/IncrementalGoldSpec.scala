package graft

import java.io.File
import org.apache.spark.sql.functions._
import graft.operators.IncrementalGold

/** Pins for the incremental partition-aware gold publish (round-10
  * VERDICT #1): the three properties that make it trustworthy at scale —
  * (1) the incremental pass SCANS only changed partitions (PartitionFilters
  * + inputFiles), (2) untouched gold partitions' files are byte-identical
  * across the pass (dynamic overwrite never rewrites them), and (3) the
  * final gold table is bit-identical to a full recompute (the same
  * contract the DuckDB oracle checks end-to-end for q_incremental_gold).
  */
class IncrementalGoldSpec extends SparkSpec {

  private val base = "target/test_incr_gold"
  private val silverDir = s"$base/silver"
  private val goldDir = s"$base/gold"

  /** Recursive (path → length) listing, data files only (skip _SUCCESS
    * etc. — Spark rewrites commit markers even for untouched output). */
  private def dataFiles(dir: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new File(dir)
    if (!root.exists()) Map.empty
    else walk(root)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.length()).toMap
  }

  // shared fixture: run the two-batch chain ONCE, snapshotting gold
  // files between the publishes
  private lazy val fixture: (Map[String, Long], Map[String, Long]) = {
    val root = new File(base)
    if (root.exists()) {
      def del(f: File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(del); f.delete()
      }
      del(root)
    }
    var afterB1: Map[String, Long] = Map.empty
    IncrementalGold.runTwoBatchFixture(spark, sfDir, silverDir, goldDir,
      afterBatch1 = () => afterB1 = dataFiles(goldDir))
    (afterB1, dataFiles(goldDir))
  }

  test("incremental publish: second pass touches only changed partitions' files") {
    val (afterB1, afterB2) = fixture
    assert(afterB1.nonEmpty && afterB2.nonEmpty)
    val unchanged = afterB1.keys.filter { p =>
      // batch 2 = 1997+ orders; date-unparseable claims land in the
      // null partition, which batch 2 also touches
      val changed = p.contains("service_year=1997") ||
        p.contains("service_year=1998") ||
        p.contains("service_year=__HIVE_DEFAULT_PARTITION__")
      !changed
    }.toSeq
    assert(unchanged.nonEmpty, afterB1.keys.mkString("\n"))
    // untouched partitions: same files, same sizes — dynamic overwrite
    // never rewrote them
    unchanged.foreach { p =>
      assert(afterB2.contains(p), s"untouched file disappeared: $p")
      assert(afterB2(p) == afterB1(p), s"untouched file rewritten: $p")
    }
    // changed partitions exist after pass 2 and are NEW files
    assert(afterB2.keys.exists(_.contains("service_year=1997")))
    assert(afterB2.keys.exists(
      _.contains("service_year=__HIVE_DEFAULT_PARTITION__")))
  }

  test("incremental publish: change detection sees only 1997+ and null partitions") {
    fixture // materialize
    val silver = spark.read.parquet(silverDir)
    val (parts, maxBatch) =
      IncrementalGold.changedPartitions(silver, "20240101_000000")
    assert(parts.nonEmpty)
    assert(parts.forall { case (y, _) => y.forall(_ >= 1997) },
      parts.toString)
    assert(parts.exists(_._1.isEmpty), "null partition must be detected")
    assert(maxBatch.contains("20240102_000000"))
    // watermark state advanced to batch 2
    assert(IncrementalGold.lastPublished(spark, goldDir)
      .contains("20240102_000000"))
  }

  test("incremental publish: the recompute slice scan is partition-pruned (zero off-slice files opened)") {
    fixture
    val silver = spark.read.parquet(silverDir)
    val (parts, _) =
      IncrementalGold.changedPartitions(silver, "20240101_000000")
    val slice = IncrementalGold.partitionSlice(silver, parts)
    val scan = slice.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    // the predicate must prune at listing time: the scan SELECTS only
    // changed partitions (NB df.inputFiles reports the whole file
    // index, pre-pruning — selectedPartitions is the real selection)
    val files = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString).toSeq
    assert(files.nonEmpty)
    (1992 to 1996).foreach { y =>
      assert(!files.exists(_.contains(s"service_year=$y")),
        s"off-slice year $y file opened:\n${files.mkString("\n")}")
    }
    assert(files.exists(_.contains("service_year=1997")))
    assert(scan.selectedPartitions.partitionCount == parts.size)
  }

  test("incremental publish result is bit-identical to the full recompute") {
    fixture
    val silver = spark.read.parquet(silverDir)
    // all three published views must equal their full recomputes
    IncrementalGold.GoldViews.foreach { case (view, rollup) =>
      val incr = spark.read.parquet(s"$goldDir/$view")
        .collect().map(r => r.getValuesMap[Any](r.schema.fieldNames))
        .map(_.toSeq.sortBy(_._1)).toSet
      val full = rollup(silver)
        .collect().map(r => r.getValuesMap[Any](r.schema.fieldNames))
        .map(_.toSeq.sortBy(_._1)).toSet
      assert(incr == full, view)
      assert(incr.nonEmpty, view)
    }
  }

  test("no-op publish: no new batches -> no partitions republished, files untouched") {
    fixture
    val before = dataFiles(goldDir)
    val again = IncrementalGold.publishIncremental(spark, silverDir, goldDir)
    assert(again.isEmpty)
    assert(dataFiles(goldDir) == before)
  }

  // ------------------------------------------------------------------
  // Streaming publisher (round 11): the same two-batch chain with every
  // publish driven by the file-stream change feed (foreachBatch).
  // ------------------------------------------------------------------

  private val sBase = "target/test_stream_gold"
  private val sSilver = s"$sBase/silver"
  private val sGold = s"$sBase/gold"

  private def wipe(dir: String): Unit = {
    def del(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del); f.delete()
    }
    val root = new File(dir)
    if (root.exists()) del(root)
  }

  private lazy val streamFixture: (Map[String, Long], Map[String, Long]) = {
    wipe(sBase)
    var afterB1: Map[String, Long] = Map.empty
    IncrementalGold.runTwoBatchFixture(spark, sfDir, sSilver, sGold,
      afterBatch1 = () => afterB1 = dataFiles(sGold),
      publish = (sd, gd) =>
        IncrementalGold.publishGoldStream(spark, sd, gd,
          s"$sBase/checkpoint"))
    (afterB1, dataFiles(sGold))
  }

  test("streaming publish: gold is bit-identical to the batch cadence publish") {
    fixture; streamFixture // materialize both chains
    IncrementalGold.GoldViews.foreach { case (view, _) =>
      def rows(dir: String) = spark.read.parquet(s"$dir/$view")
        .collect().map(r => r.getValuesMap[Any](r.schema.fieldNames))
        .map(_.toSeq.sortBy(_._1)).toSet
      val streamed = rows(sGold)
      assert(streamed.nonEmpty, view)
      assert(streamed == rows(goldDir), view)
    }
  }

  test("streaming publish: second micro-batch rewrites only changed partitions") {
    val (afterB1, afterB2) = streamFixture
    assert(afterB1.nonEmpty && afterB2.nonEmpty)
    val unchanged = afterB1.keys.filter { p =>
      !(p.contains("service_year=1997") || p.contains("service_year=1998") ||
        p.contains("service_year=__HIVE_DEFAULT_PARTITION__"))
    }.toSeq
    assert(unchanged.nonEmpty)
    unchanged.foreach { p =>
      assert(afterB2.get(p).contains(afterB1(p)),
        s"untouched gold file rewritten by the stream: $p")
    }
    assert(afterB2.keys.exists(_.contains("service_year=1997")))
  }

  test("snapshot publish: manifest-diff detection matches the data-derived change set") {
    import graft.operators.SnapshotTable
    val nBase = "target/test_snap_gold"
    wipe(nBase)
    val table = s"$nBase/silver"
    val gold = s"$nBase/gold"
    var goldAfterB1: Map[String, Long] = Map.empty
    IncrementalGold.runTwoBatchSnapshotFixture(spark, sfDir, table, gold,
      afterBatch1 = () => goldAfterB1 = dataFiles(gold))
    // detection from the manifest diff alone must equal the batch-2
    // partitions as derived from the DATA
    val fromMeta = SnapshotTable
      .changedPartitionsBetween(spark, table, 1, 2).toSet
    val fromData = SnapshotTable.readFilesAdded(spark, table, 1, 2)
      .select("service_year", "service_month").distinct().collect()
      .map(r => (
        Option(r.getAs[Integer]("service_year")).map(_.intValue),
        Option(r.getAs[Integer]("service_month")).map(_.intValue))).toSet
    assert(fromMeta == fromData, s"meta=$fromMeta data=$fromData")
    assert(fromMeta.nonEmpty)
    // untouched gold partitions' files survive the second publish
    val after = dataFiles(gold)
    val untouched = goldAfterB1.keys.filter { p =>
      !(p.contains("service_year=1997") || p.contains("service_year=1998") ||
        p.contains("service_year=__HIVE_DEFAULT_PARTITION__"))
    }.toSeq
    assert(untouched.nonEmpty)
    untouched.foreach(p => assert(after.get(p).contains(goldAfterB1(p)), p))
    // publish watermark is the snapshot version; re-publish is a no-op
    assert(IncrementalGold.lastPublished(spark, gold).contains("v2"))
    assert(IncrementalGold.publishIncrementalSnapshot(spark, table, gold)
      .isEmpty)
    // published gold equals the full recompute over the live snapshot
    val silver = SnapshotTable.read(spark, table)
    IncrementalGold.GoldViews.foreach { case (view, rollup) =>
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getValuesMap[Any](r.schema.fieldNames))
        .map(_.toSeq.sortBy(_._1)).toSet
      assert(rows(spark.read.parquet(s"$gold/$view")) ==
        rows(rollup(silver)), view)
    }
  }

  test("streaming publish: drained checkpoint -> rerun is a no-op on gold") {
    streamFixture
    val before = dataFiles(sGold)
    // no new silver files: AvailableNow finds nothing past the
    // checkpoint, no micro-batch fires, gold untouched
    IncrementalGold.publishGoldStream(spark, sSilver, sGold,
      s"$sBase/checkpoint")
    assert(dataFiles(sGold) == before)
    // watermark state still at batch 2
    assert(IncrementalGold.lastPublished(spark, sGold)
      .contains("20240102_000000"))
  }
}
