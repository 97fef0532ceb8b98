package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Catalog/metadata operators (SURVEY.md §2.1 S8): the reference's
  * SHOW CATALOGS / SHOW SCHEMAS / SHOW TABLES / DESCRIBE smoke checks
  * (sql/trino_checks.sql:8-20) restated over the Spark catalog. Temp
  * views play Hive-metastore tables — the same `spark.catalog` calls
  * work unchanged against a real metastore at scale. */
object CatalogOps {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register the star schema as temp views (the metastore analog).
    * `events` goes through Tables.events (schema-branched ts
    * normalization), so the registered view exposes the same
    * `ts: TIMESTAMP` schema every operator sees. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    TableNames.foreach { n =>
      val df = if (n == "events") Tables.events(spark, sfDir)
        else Tables.load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  /** SHOW TABLES (trino_checks.sql:14-17). */
  def listTables(spark: SparkSession): DataFrame =
    spark.sql("SHOW TABLES")

  /** DESCRIBE <table> (trino_checks.sql:20). */
  def describeTable(spark: SparkSession, name: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE $name")

  /** SHOW SCHEMAS analog. */
  def listDatabases(spark: SparkSession): DataFrame =
    spark.sql("SHOW DATABASES")

  /** SHOW CATALOGS (trino_checks.sql:8) — Spark's catalog-plugin list;
    * `spark_catalog` plays Trino's hive/iceberg pair. */
  def listCatalogs(spark: SparkSession): DataFrame =
    spark.sql("SHOW CATALOGS")
}
