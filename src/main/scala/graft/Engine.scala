package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session configuration shared by every entry point.
  *
  * All settings are runtime-settable SQL confs, so this is safe to call on a
  * session the driver built. Idempotent.
  */
object Engine {
  /** Install [[graft.fs.FastLocalFileSystem]] as the `file://`
    * implementation for this context. This environment ships no
    * native-hadoop library, so the default RawLocalFileSystem forks
    * `chmod` once per created file and `ls -ld` once per listed file —
    * measured (round-17 JobProfile) at 3.2 s of a 12.5 s
    * q_snapshot_merge_mor run. The replacement answers the same
    * metadata calls with POSIX syscalls; the checksum wrapper is kept,
    * so on-disk layout (.crc sidecars included) is byte-identical. A
    * cluster store (HDFS/S3) is untouched: only the `file` scheme is
    * remapped, which at 100 TB scale is test/driver plumbing, not the
    * data path. Idempotent; evicts at most one pre-wiring cached
    * LocalFileSystem instance (closing a LocalFileSystem only drops it
    * from Hadoop's cache — it holds no state open streams depend on). */
  private def installFastLocalFs(spark: SparkSession): Unit = {
    val impl = "graft.fs.FastLocalFileSystem"
    val hc = spark.sparkContext.hadoopConfiguration
    if (hc.get("fs.file.impl") != impl) hc.set("fs.file.impl", impl)
    val uri = java.net.URI.create("file:///")
    val cached = org.apache.hadoop.fs.FileSystem.get(uri, hc)
    if (!cached.isInstanceOf[graft.fs.FastLocalFileSystem]) {
      cached.close() // drops the pre-wiring instance from the FS cache
      org.apache.hadoop.fs.FileSystem.get(uri, hc) // caches ours
    }
  }

  def configure(spark: SparkSession): SparkSession = {
    installFastLocalFs(spark)
    // Reference semantics are non-ANSI: malformed dates → null, not error
    // (jobs/silver/claims_to_iceberg.py:60-63 relies on to_date returning
    // null for unparseable input).
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // Historical events.parquet fixtures stored ts as INT64
    // TIMESTAMP(NANOS), which Spark refuses unless read as long; the conf
    // is a no-op for µs/ms fixtures. Tables.events branches on the loaded
    // schema and always yields ts: TIMESTAMP at µs precision.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // InferFiltersFromGenerate rewrites explode(attr) into a pre-filter
    // size(<full original expression>) > 0, INLINING the generator's
    // defining expression — for our higher-order-function shingle/band
    // arrays that re-evaluates the whole interpreted HOF chain once per
    // row (measured ~4 s of 8 s in nearDupPairs at sf0.1). The filter is
    // purely an optimization for inner explode (Generate itself emits
    // nothing for empty arrays), so excluding the rule is semantics-free.
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Library entry point: a session configured the way every operator
    * expects (UTC, non-ANSI null-on-malformed dates, AQE, shuffle
    * partitions sized to the machine instead of the 200 default — on a
    * real cluster pass an explicit master/parallelism). */
  def session(appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]")
      : SparkSession =
    configure(SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      // build-time only (a reused session keeps its own): the
      // multi-distinct split rule for verbatim-SQL users. withExtensions,
      // not the spark.sql.extensions conf — the conf is static, read from
      // the SparkContext, and silently ignored when the builder attaches
      // to an existing context.
      .withExtensions(new GraftExtensions)
      .getOrCreate())

  /** Guarantee at least the session's default parallelism before a
    * per-row-expensive narrow pipeline (interpreted higher-order
    * functions, md5 chains, multi-format date parsing).
    *
    * At 100 TB a parquet scan yields thousands of splits and this is a
    * NO-OP — the guard keeps us from ever adding a gratuitous full-data
    * shuffle at scale. It kicks in only for small single-row-group
    * inputs (the driver's test files), whose whole narrow pipeline would
    * otherwise execute on ONE core: a round-robin repartition of a few
    * MB buys 32× parallelism on everything downstream.
    *
    * The split-count estimate is PLAN-SIDE: logical stats (file sizes
    * for a parquet relation) plus the per-file open-cost padding, through
    * the same packing formula the file source uses —
    * ceil(paddedBytes / min(maxPartitionBytes, max(openCostInBytes,
    * paddedBytes/parallelism))). Without the padding, a many-small-files
    * input (64 × 1 MB) estimates far fewer splits than the scan actually
    * plans and would eat a redundant full-data round-robin on every
    * query. `inputFiles` is a listing-cache metadata read (empty for
    * non-file plans → padding degrades to zero). The previous
    * `df.rdd.getNumPartitions` probe answered the question exactly but
    * forced full physical planning + an RDD-lineage conversion per call
    * and hid the subtree from AQE (round-2 VERDICT item 5). */
  def spread(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val want = BigInt(sc.defaultParallelism)
    val conf = df.sparkSession.sessionState.conf
    val statBytes = df.queryExecution.analyzed.stats.sizeInBytes
    // A leaf without real stats (non-file relation) reports the
    // defaultSizeInBytes sentinel (Long.MaxValue unless overridden); the
    // estimate below would then be huge and the repartition silently
    // skipped — the exact single-core problem spread exists to fix. No
    // real input reaches the sentinel (it is ~9 EB), so >= means UNKNOWN:
    // repartition, accepting a possibly-redundant shuffle over a
    // possibly-serial pipeline.
    if (statBytes >= BigInt(conf.defaultSizeInBytes)) {
      df.repartition(want.toInt)
    } else {
      val openCost = BigInt(conf.filesOpenCostInBytes)
      val bytes = statBytes + BigInt(df.inputFiles.length) * openCost
      val splitSize = (openCost max (bytes / want))
        .min(BigInt(conf.filesMaxPartitionBytes))
      val estSplits = if (splitSize > 0) (bytes + splitSize - 1) / splitSize
        else BigInt(1)
      if (estSplits < want) df.repartition(want.toInt) else df
    }
  }

  /** Materialize a multiply-referenced intermediate frame: non-eager
    * `localCheckpoint`, so the frame's partitions are computed ONCE (on
    * the first job that touches them), stored by the block manager
    * (memory, spilling to disk), and every later reference — including
    * other references inside the same job — reads the stored blocks
    * instead of re-executing the subtree. Exchange reuse under AQE is
    * best-effort; this is the guaranteed form, and it also truncates
    * lineage, so the consumer's plan shows `Scan ExistingRDD` leaves
    * rather than N repeated file scans (PlanSpec pins that shape for the
    * LSH dedup operators).
    *
    * Costs, stated honestly: the staged frame is stored at
    * MEMORY_AND_DISK on the executors that computed it (size the knob's
    * inputs accordingly — callers here stage metadata-shaped or
    * distinct-text-shaped frames, never the raw corpus ride-along
    * columns); and unlike a persist of the logical plan, a lost executor
    * FAILS the job instead of recomputing (localCheckpoint severs the
    * lineage needed to recompute) — at cluster scale prefer re-running
    * the query over silently doubling every upstream stage on every
    * reference.
    *
    * LIFECYCLE: every staged RDD is tracked. Blocks live until
    * [[unstage]] (targeted, for iterative loops that retire a round's
    * frame) or [[clearStaged]] (everything, for a long-lived session
    * between queries) — relying on GC + ContextCleaner alone leaks
    * MEMORY_AND_DISK blocks forward in any serial workload (round-4
    * VERDICT: untouched queries inflated ~25% behind heavy staged ones).
    * Call [[clearStaged]] when a query's results have been fully
    * consumed; a staged frame must NOT be re-read after its blocks are
    * freed (the severed lineage cannot recompute — re-build the frame
    * instead). */
  def stage(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(eager = false)
    stagedRddOf(out).foreach { r =>
      val buf = staged.computeIfAbsent(df.sparkSession,
        _ => scala.collection.mutable.ArrayBuffer.empty)
      buf.synchronized { buf += r }
      // same buffer-level discipline as `staged`: concurrent stage()
      // calls on one session must not lose/corrupt schema entries
      val sbuf = schemas.computeIfAbsent(df.sparkSession,
        _ => scala.collection.mutable.ArrayBuffer.empty)
      sbuf.synchronized { sbuf += df.schema }
    }
    out
  }

  /** Schemas of every frame staged by `spark` since its last
    * [[clearStaged]] — the test hook that pins the staging SIZE
    * doctrine (stage collapse keys / signatures / scalars; corpus
    * ride-along arrays only with a measured justification). */
  private[graft] def stagedSchemas(spark: SparkSession)
      : Seq[org.apache.spark.sql.types.StructType] =
    Option(schemas.get(spark))
      .map(b => b.synchronized { b.toSeq }).getOrElse(Nil)

  private val schemas = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable
      .ArrayBuffer[org.apache.spark.sql.types.StructType]]())

  import org.apache.spark.rdd.RDD
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.execution.LogicalRDD

  // Keyed by owning SparkSession so clearStaged can only free frames its
  // caller's session staged — a global registry let any caller free
  // frames another session still held, and a freed staged frame is
  // unrecoverable (localCheckpoint severed the lineage). Weak keys: a
  // dropped session's entry (its blocks die with its context) must not
  // pin the session object.
  private val staged = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.ArrayBuffer[RDD[InternalRow]]]())

  /** The block-manager-backed RDD behind a [[stage]]d frame (its logical
    * plan is the `LogicalRDD` leaf localCheckpoint wrapped it in). */
  private def stagedRddOf(df: DataFrame): Option[RDD[InternalRow]] =
    df.queryExecution.logical match {
      case l: LogicalRDD => Some(l.rdd)
      case _             => None
    }

  /** Free one staged frame's blocks (non-blocking). For iterative
    * drivers ([[graft.operators.GraphOps.connectedComponentsOf]]) that
    * stage a frame per round: retire round i−1 as soon as round i is
    * materialized, so peak block storage is O(1) rounds, not O(rounds).
    * The frame must not be referenced again afterwards. */
  def unstage(df: DataFrame): Unit = stagedRddOf(df).foreach { r =>
    r.unpersist(blocking = false)
    Option(staged.get(df.sparkSession)).foreach { buf =>
      buf.synchronized { buf -= r }
    }
  }

  /** Free all staged blocks owned by `spark`. A long-lived session (the
    * serial Bench JVM, a query service) calls this between queries;
    * without it every staged query leaks its blocks forward for the life
    * of the JVM (ContextCleaner only frees on GC of the RDD object,
    * which lazy val / closure references defer indefinitely).
    * `blocking = true` waits for removal — what a benchmark wants
    * BETWEEN timed queries, so deferred cleanup never bleeds into the
    * next measurement. Scoped to the calling session: frames staged by
    * OTHER sessions in the JVM are untouched (freeing them would be a
    * use-after-free — severed lineage cannot recompute). */
  def clearStaged(spark: SparkSession, blocking: Boolean): Unit = {
    Option(staged.remove(spark)).foreach { buf =>
      buf.synchronized { buf.foreach(_.unpersist(blocking)) }
    }
    schemas.remove(spark)
  }

  /** [[clearStaged]] across EVERY session in the JVM — only safe when
    * the caller owns them all (the serial Bench/Verify mains, a test
    * suite's tear-down). Library code holding a session must use the
    * session-scoped overload. */
  def clearStaged(blocking: Boolean = false): Unit = {
    val sessions = staged.synchronized {
      // iteration must hold the synchronizedMap mutex; copy out first
      scala.jdk.CollectionConverters.CollectionHasAsScala(
        staged.keySet).asScala.toSeq
    }
    sessions.foreach(clearStaged(_, blocking))
  }
}
