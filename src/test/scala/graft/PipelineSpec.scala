package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Bronze, Pipeline}

/** Bronze CSV ingest + bronze→silver→gold pipeline semantics (M1/M4). */
class PipelineSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private val csvHeader = "claim_id,member_id,provider_name,claim_amount,service_date"

  test("ingestCsv honors header/multiline/escape options") {
    val dir = tmp("csv_in")
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"),
      csvHeader + "\n" +
        "C1,M1,\"multi\nline provider\",100.5,2024-01-15\n" +
        "C2,M2,\"quoted \"\"name\"\"\",50,01/20/2024\n")
    val df = Bronze.ingestCsv(spark, dir)
    assert(df.count() == 2)
    assert(df.columns.toSeq == csvHeader.split(",").toSeq)
    val providers = df.select("provider_name").collect().map(_.getString(0)).toSet
    assert(providers.contains("multi\nline provider"))
    assert(providers.contains("quoted \"name\""))
  }

  test("writeBronze stamps batch metadata and gates on empty input") {
    val dir = tmp("csv_in2")
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"),
      csvHeader + "\nC1,M1,P,1,2024-01-01\n")
    val sink = tmp("bronze") + "/claims"
    val clock = to_timestamp(lit("2024-06-01 12:00:00"))
    assert(Bronze.writeBronze(Bronze.ingestCsv(spark, dir), sink, clock))
    val out = Bronze.readBronze(spark, sink)
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getAs[String]("source_file") == "csv")
    assert(r.getAs[String]("batch_id") == "20240601_120000")
    // header-only file → 0 rows → gate skips, sink untouched
    val empty = tmp("csv_empty")
    Files.writeString(java.nio.file.Paths.get(s"$empty/a.csv"), csvHeader + "\n")
    assert(!Bronze.writeBronze(Bronze.ingestCsv(spark, empty), sink, clock))
    assert(Bronze.readBronze(spark, sink).count() == 1)
  }

  test("managed silver table: DDL + writeTo append + partition pruning") {
    val table = "silver_claims_managed"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Bronze.createSilverTable(spark, table)
    val silver = graft.operators.SilverCleanse
      .fromOrders(Tables.orders(spark, sfDir))
      .drop("o_orderpriority")
    assert(Bronze.appendToSilverTable(silver, table))
    val back = spark.table(table)
    assert(back.count() == silver.count())
    // append-only semantics: second append doubles
    assert(Bronze.appendToSilverTable(silver, table))
    assert(spark.table(table).count() == 2 * silver.count())
    // partition pruning: a year/month predicate must show up as a
    // PartitionFilter on the scan, not a post-scan filter
    val pruned = spark.table(table)
      .filter(col("service_year") === 1997 && col("service_month") === 3)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(service_year"), scan)
    assert(pruned.count() > 0)
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("pipeline end-to-end: cleanse, quality gate, partitioned silver, append") {
    val csvDir = tmp("csv_pipe")
    Files.writeString(java.nio.file.Paths.get(s"$csvDir/batch1.csv"),
      csvHeader + "\n" +
        "  C1 ,M1,  acme ,100.5,2024-01-15\n" + // clean row (padded id)
        "C2,M2,,50,01/20/2024\n" + // blank provider → UNKNOWN; US date
        "C3,M3,prov,-7,20/01/2024\n" + // negative → 0.0 → score 0.7; EU date
        ",M4,prov,10,2024-01-01\n" + // null claim_id → dropped (score 0)
        "C5,,prov,10,2024-01-01\n" + // null member → score 0.3 → gated out
        "C6,M6,prov,10,not-a-date\n") // bad date → score 0.5 → kept
    val lake = tmp("lake")
    val clock = to_timestamp(lit("2024-06-01 12:00:00"))
    val silver = Pipeline.run(spark, csvDir, lake, clock)
    val rows = silver.collect().map(r =>
      r.getAs[String]("claim_id") -> r).toMap
    assert(rows.keySet == Set("C1", "C2", "C3", "C6"))
    assert(rows("C1").getAs[String]("provider_name") == "ACME")
    assert(rows("C2").getAs[String]("provider_name") == "UNKNOWN")
    assert(rows("C2").getAs[java.sql.Date]("service_date").toString == "2024-01-20")
    assert(rows("C3").getAs[Double]("claim_amount") == 0.0)
    assert(rows("C3").getAs[Double]("data_quality_score") == 0.7)
    assert(rows("C6").getAs[Double]("data_quality_score") == 0.5)
    assert(rows("C6").isNullAt(rows("C6").fieldIndex("service_year")))
    assert(rows("C1").getAs[String]("batch_id") == "20240601_120000")
    // physical layout: partitioned by service_year/service_month
    val parts = new java.io.File(s"$lake/silver/claims").listFiles()
      .map(_.getName).filter(_.startsWith("service_year="))
    assert(parts.contains("service_year=2024"))
    assert(parts.exists(_.startsWith("service_year=__HIVE_DEFAULT_PARTITION__")))
    // append semantics: second run doubles silver (reference is
    // append-only everywhere — SURVEY.md §1.3)
    Pipeline.run(spark, csvDir, lake, clock)
    assert(spark.read.parquet(s"$lake/silver/claims").count() == 12)
  }

  test("pipeline silver carries processing_timestamp; gold SQL views build on it") {
    val csvDir = tmp("csv_gold")
    Files.writeString(java.nio.file.Paths.get(s"$csvDir/b.csv"),
      csvHeader + "\n" + (1 to 12).map(i =>
        s"C$i,M${i % 3},prov,${i * 10},2024-01-0${i % 9 + 1}").mkString("\n"))
    val lake = tmp("lake_gold")
    val clock = to_timestamp(lit("2024-06-01 12:00:00"))
    val silver = Pipeline.run(spark, csvDir, lake, clock)
    assert(silver.columns.contains("processing_timestamp")) // silver:76
    assert(silver.select("processing_timestamp").distinct().count() == 1)
    // the verbatim-SQL gold views resolve against the pipeline's own view
    graft.operators.GoldSql.createViews(spark)
    graft.operators.GoldSql.ViewNames.foreach { v =>
      assert(spark.table(v).collect() != null, v) // resolves + executes
    }
    assert(spark.table("gold_recent_activity").count() == 3)
  }

  test("e2eGold: file-backed chain == in-memory cleanse rollup") {
    import org.apache.spark.sql.functions._
    import graft.functions.Exact.countIf
    // the CSV -> bronze -> silver file round-trips must be value-exact:
    // the e2e gold rollup equals the same rollup over the pure
    // in-memory cleanse (no files anywhere)
    val viaFiles = operators.Pipeline.e2eGold(spark, sfDir).collect()
      .map(_.toSeq)
    val inMem = operators.SilverCleanse
      .fromOrders(Tables.orders(spark, sfDir))
      .groupBy(col("service_year"), col("service_month"),
        col("claim_amount_category"))
      .agg(count(lit(1)).as("total_claims"),
        countDistinct(col("member_id")).as("unique_members"),
        sum(col("claim_amount").cast("decimal(38,4)")).cast("double")
          .as("total_amount"),
        countIf(col("data_quality_score") < 1.0).as("n_flagged"))
      .orderBy(col("service_year"), col("service_month"),
        col("claim_amount_category"))
      .collect().map(_.toSeq)
    assert(viaFiles.nonEmpty && viaFiles.toSeq == inMem.toSeq)
  }

  test("snapshot-native pipeline: silver gets time travel + CDC, gold watermark advances") {
    val base = "target/test_pipeline_snap"
    val root = new java.io.File(base)
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del); f.delete()
    }
    if (root.exists()) del(root)
    operators.Pipeline.runSnapshotChain(spark, sfDir, base)
    val silverDir = s"$base/lake/silver/claims"
    // two batches -> two snapshot versions; v1 is the pre-1997 ingest
    // alone, v2 the full table — time travel on the PIPELINE's silver
    assert(operators.SnapshotTable.latestVersion(spark, silverDir) == 2)
    val v1 = operators.SnapshotTable.read(spark, silverDir, Some(1))
    val v2 = operators.SnapshotTable.read(spark, silverDir, Some(2))
    assert(v1.filter(col("batch_id") =!= "20240101_000000").isEmpty)
    assert(v1.count() > 0 && v2.count() > v1.count())
    // the CDC feed between the pipeline's two versions is exactly batch 2
    val feed = operators.SnapshotTable.readFilesAdded(spark, silverDir, 1, 2)
    assert(feed.filter(col("batch_id") =!= "20240102_000000").isEmpty)
    assert(feed.count() == v2.count() - v1.count())
    // the gold publish watermark rode the snapshot versions
    assert(operators.IncrementalGold.lastPublished(spark, s"$base/lake/gold")
      .contains("v2"))
  }
}
