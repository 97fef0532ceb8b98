package graft

import org.apache.spark.sql.functions._
import graft.operators.DqEngine
import graft.operators.DqEngine._

/** Semantics of the declarative DQ expectation engine (SURVEY.md §2.10). */
class DqEngineSpec extends SparkSpec {
  import spark.implicits._

  test("silver suite: 23 expectations, all pass on cleansed claims") {
    val report = DqEngine.silverReport(spark, sfDir).collect()
    assert(report.length == 23)
    // idx is the suite file order
    assert(report.map(_.getAs[Int]("idx")).toSeq == (0 until 23))
    val failures = report.filterNot(_.getAs[Boolean]("success"))
      .map(r => r.getAs[String]("expectation_type") -> r.getAs[String]("column_name"))
    assert(failures.isEmpty, s"unexpected failures: ${failures.toSeq}")
  }

  test("engine detects violations: nulls, dups, out-of-range, bad set") {
    val dirty = Seq(
      (null.asInstanceOf[String], 2000000.0, "X"),
      ("a", -5.0, "ZERO"),
      ("a", 10.0, "LOW")
    ).toDF("claim_id", "claim_amount", "claim_amount_category")
    val suite = Seq(
      NotNull("claim_id"),
      Unique("claim_id"),
      BetweenNum("claim_amount", 0, 1000000),
      InSet("claim_amount_category", Seq("ZERO", "LOW", "MEDIUM", "HIGH", "VERY_HIGH")),
      RowCountBetween(0L, 2L), // 3 rows → fail
      ColumnExists("claim_id"),
      ColumnExists("not_a_column"))
    val r = DqEngine.run(dirty, suite).collect()
      .map(row => (row.getAs[Int]("idx"), row.getAs[Double]("observed"),
        row.getAs[Boolean]("success")))
    assert(r(0) == ((0, 1.0, false))) // one null claim_id
    assert(r(1) == ((1, 1.0, false))) // 'a' duplicated (nulls not counted)
    assert(r(2) == ((2, 2.0, false))) // -5 and 2e6 out of range
    assert(r(3) == ((3, 1.0, false))) // 'X' not in set
    assert(r(4) == ((4, 3.0, false))) // row count 3 > 2
    assert(r(5) == ((5, 1.0, true))) // claim_id exists
    assert(r(6) == ((6, 0.0, false))) // not_a_column missing
  }

  test("one-pass plan: the suite aggregates in a single Aggregate") {
    val base = operators.SilverCleanse.fromOrders(Tables.orders(spark, sfDir))
      .withColumn("processing_timestamp", lit("2024-01-01 00:00:00").cast("timestamp"))
    val plan = DqEngine.run(base).queryExecution.optimizedPlan.toString
    // distinct aggregates expand the plan, but there must be no join or
    // repeated scan: exactly one Relation in the whole tree
    assert("Relation".r.findAllIn(plan).length == 1, plan)
  }
}
