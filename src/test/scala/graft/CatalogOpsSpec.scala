package graft

import graft.operators.CatalogOps

/** Catalog metadata ops (SURVEY.md §2.1 S8). */
class CatalogOpsSpec extends SparkSpec {

  test("SHOW TABLES lists every registered star-schema table") {
    CatalogOps.registerTables(spark, sfDir)
    val names = CatalogOps.listTables(spark).collect()
      .map(_.getAs[String]("tableName")).toSet
    CatalogOps.TableNames.foreach(n => assert(names.contains(n), n))
  }

  test("DESCRIBE matches the DataFrame schema") {
    CatalogOps.registerTables(spark, sfDir)
    val desc = CatalogOps.describeTable(spark, "orders").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val schema = Tables.orders(spark, sfDir).schema
    schema.fields.foreach { f =>
      assert(desc.get(f.name).contains(f.dataType.simpleString),
        s"${f.name}: ${desc.get(f.name)} vs ${f.dataType.simpleString}")
    }
  }

  test("SHOW DATABASES returns the default database") {
    val dbs = CatalogOps.listDatabases(spark).collect()
      .map(_.getString(0)).toSet
    assert(dbs.contains("default"))
  }

  test("SHOW CATALOGS lists the session catalog") {
    val cats = CatalogOps.listCatalogs(spark).collect()
      .map(_.getString(0)).toSet
    assert(cats.contains("spark_catalog"), cats)
  }

  test("registered events view exposes the µs-timestamp schema, not raw ns") {
    CatalogOps.registerTables(spark, sfDir)
    val t = spark.table("events").schema("ts").dataType
    assert(t == org.apache.spark.sql.types.TimestampType, t)
  }
}
