package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}
import graft.functions.Exact

/** Declarative data-quality expectation engine — the reference's
  * distinctive operator family (dq/expectations/silver_claims.json, 23
  * expectations in Great-Expectations 0.17 format; the reference ships
  * the suite as inert data, README.md:158-159 defers execution to future
  * work — here it actually runs).
  *
  * Design: every expectation contributes ONE aggregate expression; the
  * whole suite executes as a SINGLE aggregate pass over the table
  * (partial+final HashAggregate — one scan at any scale), then the 1-row
  * aggregate is exploded into a per-expectation report via inline().
  * Each expectation also carries its DuckDB SQL mirror, so the
  * differential oracle is GENERATED from the same suite definition —
  * the Spark plan and oracle can't drift apart.
  *
  * Report schema: idx INT, expectation_type STRING, column_name STRING,
  * observed DOUBLE, success BOOLEAN.
  */
object DqEngine {

  sealed trait Expectation {
    def kind: String
    def column: String
    /** Aggregate expression for the observed metric (over the table). */
    def observed(df: DataFrame): Column
    /** Success predicate over the observed value. */
    def success(obs: Column): Column
    /** DuckDB aggregate over the `base` relation, mirroring observed. */
    def observedSql: String
    /** DuckDB predicate over the observed SQL value, mirroring success. */
    def successSql(o: String): String
  }

  /** Schema-level: evaluated against df.schema at plan time; the oracle
    * runs against a relation with the same fixed schema, so both sides
    * are constants. */
  final case class ColumnExists(column: String) extends Expectation {
    val kind = "expect_column_to_exist"
    def observed(df: DataFrame): Column =
      lit(if (df.columns.contains(column)) 1.0 else 0.0)
    def success(obs: Column): Column = obs === 1.0
    def observedSql: String = "1.0"
    def successSql(o: String): String = s"$o = 1.0"
  }

  final case class OfType(column: String, geType: String,
      sparkType: DataType) extends Expectation {
    val kind = "expect_column_values_to_be_of_type"
    def observed(df: DataFrame): Column = lit(
      if (df.schema.fields.exists(f => f.name == column && f.dataType == sparkType)) 1.0 else 0.0)
    def success(obs: Column): Column = obs === 1.0
    def observedSql: String = "1.0"
    def successSql(o: String): String = s"$o = 1.0"
  }

  final case class NotNull(column: String) extends Expectation {
    val kind = "expect_column_values_to_not_be_null"
    def observed(df: DataFrame): Column = Exact.countIf(col(column).isNull)
    def success(obs: Column): Column = obs === 0.0
    def observedSql = s"count(CASE WHEN $column IS NULL THEN 1 END)"
    def successSql(o: String) = s"$o = 0"
  }

  final case class Unique(column: String) extends Expectation {
    val kind = "expect_column_values_to_be_unique"
    def observed(df: DataFrame): Column =
      count(col(column)) - countDistinct(col(column))
    def success(obs: Column): Column = obs === 0.0
    def observedSql = s"count($column) - count(DISTINCT $column)"
    def successSql(o: String) = s"$o = 0"
  }

  /** Numeric range; nulls are ignored (GE semantics). Observed = count
    * of out-of-range values, success = none. */
  final case class BetweenNum(column: String, min: Double, max: Double)
      extends Expectation {
    val kind = "expect_column_values_to_be_between"
    def observed(df: DataFrame): Column =
      Exact.countIf(col(column) < min || col(column) > max)
    def success(obs: Column): Column = obs === 0.0
    def observedSql =
      s"count(CASE WHEN $column < $min OR $column > $max THEN 1 END)"
    def successSql(o: String) = s"$o = 0"
  }

  final case class BetweenDate(column: String, minIso: String, maxIso: String)
      extends Expectation {
    val kind = "expect_column_values_to_be_between"
    def observed(df: DataFrame): Column = Exact.countIf(
      col(column) < to_date(lit(minIso)) || col(column) > to_date(lit(maxIso)))
    def success(obs: Column): Column = obs === 0.0
    def observedSql = s"count(CASE WHEN $column < DATE '$minIso' " +
      s"OR $column > DATE '$maxIso' THEN 1 END)"
    def successSql(o: String) = s"$o = 0"
  }

  /** Non-null values must round-trip as dates (trivially true for a
    * DATE column — kept for suite fidelity with the GE original, which
    * ran dateutil over the raw strings). */
  final case class DateParseable(column: String) extends Expectation {
    val kind = "expect_column_values_to_be_dateutil_parseable"
    def observed(df: DataFrame): Column = Exact.countIf(
      col(column).isNotNull && to_date(col(column).cast("string")).isNull)
    def success(obs: Column): Column = obs === 0.0
    def observedSql = s"count(CASE WHEN $column IS NOT NULL AND " +
      s"TRY_CAST(CAST($column AS VARCHAR) AS DATE) IS NULL THEN 1 END)"
    def successSql(o: String) = s"$o = 0"
  }

  final case class LengthBetween(column: String, min: Int, max: Int)
      extends Expectation {
    val kind = "expect_column_value_lengths_to_be_between"
    def observed(df: DataFrame): Column =
      Exact.countIf(length(col(column)) < min || length(col(column)) > max)
    def success(obs: Column): Column = obs === 0.0
    def observedSql = s"count(CASE WHEN length($column) < $min " +
      s"OR length($column) > $max THEN 1 END)"
    def successSql(o: String) = s"$o = 0"
  }

  final case class InSet(column: String, values: Seq[String])
      extends Expectation {
    val kind = "expect_column_values_to_be_in_set"
    def observed(df: DataFrame): Column = Exact.countIf(
      col(column).isNotNull && !col(column).isin(values: _*))
    def success(obs: Column): Column = obs === 0.0
    def observedSql = {
      val set = values.map(v => s"'$v'").mkString(", ")
      s"count(CASE WHEN $column IS NOT NULL AND $column NOT IN ($set) THEN 1 END)"
    }
    def successSql(o: String) = s"$o = 0"
  }

  final case class RowCountBetween(min: Long, max: Long) extends Expectation {
    val kind = "expect_table_row_count_to_be_between"
    val column = ""
    def observed(df: DataFrame): Column = count(lit(1))
    def success(obs: Column): Column = obs >= min.toDouble && obs <= max.toDouble
    def observedSql = "count(*)"
    def successSql(o: String) = s"$o BETWEEN $min AND $max"
  }

  final case class UniqueProportion(column: String, min: Double, max: Double)
      extends Expectation {
    val kind = "expect_column_proportion_of_unique_values_to_be_between"
    def observed(df: DataFrame): Column =
      countDistinct(col(column)).cast(DoubleType) /
        count(col(column)).cast(DoubleType)
    def success(obs: Column): Column = obs >= min && obs <= max
    def observedSql = s"CAST(count(DISTINCT $column) AS DOUBLE) " +
      s"/ CAST(count($column) AS DOUBLE)"
    def successSql(o: String) = s"$o >= $min AND $o <= $max"
  }

  /** Mean via the exact-decimal path (Exact.davg) so the observed double
    * is bit-identical across engines. */
  final case class MeanBetween(column: String, min: Double, max: Double)
      extends Expectation {
    val kind = "expect_column_mean_to_be_between"
    def observed(df: DataFrame): Column = Exact.davg(col(column))
    def success(obs: Column): Column = obs >= min && obs <= max
    def observedSql = s"CAST(sum(CAST($column AS DECIMAL(38,4))) AS DOUBLE)" +
      s" / count(*)"
    def successSql(o: String) = s"$o >= $min AND $o <= $max"
  }

  /** The reference's 23-expectation silver_claims suite
    * (dq/expectations/silver_claims.json:11-232), in file order.
    * Transplant deviation: the service_date sanity range is shifted from
    * [2020-01-01, 2030-12-31] to [1990-01-01, 2005-12-31] because the
    * star-schema dates live in 1995-2001 — the check's INTENT (dates
    * within the plausible envelope of the data) is preserved. */
  val silverSuite: Seq[Expectation] = Seq(
    ColumnExists("claim_id"),
    NotNull("claim_id"),
    Unique("claim_id"),
    ColumnExists("member_id"),
    NotNull("member_id"),
    ColumnExists("claim_amount"),
    BetweenNum("claim_amount", 0, 1000000),
    OfType("claim_amount", "float64", DoubleType),
    ColumnExists("service_date"),
    DateParseable("service_date"),
    BetweenDate("service_date", "1990-01-01", "2005-12-31"),
    ColumnExists("provider_name"),
    NotNull("provider_name"),
    LengthBetween("provider_name", 1, 100),
    ColumnExists("claim_amount_category"),
    InSet("claim_amount_category",
      Seq("ZERO", "LOW", "MEDIUM", "HIGH", "VERY_HIGH")),
    ColumnExists("data_quality_score"),
    BetweenNum("data_quality_score", 0.0, 1.0),
    ColumnExists("processing_timestamp"),
    NotNull("processing_timestamp"),
    RowCountBetween(0L, 10000000L),
    UniqueProportion("claim_id", 0.99, 1.0),
    MeanBetween("data_quality_score", 0.7, 1.0),
  )

  /** Execute a suite in ONE aggregate pass; explode into the report. */
  def run(df: DataFrame, suite: Seq[Expectation] = silverSuite): DataFrame = {
    val obsCols = suite.zipWithIndex.map { case (e, i) =>
      e.observed(df).cast(DoubleType).as(s"obs_$i")
    }
    val agg = df.agg(obsCols.head, obsCols.tail: _*)
    val reportRows = suite.zipWithIndex.map { case (e, i) =>
      struct(
        lit(i).as("idx"),
        lit(e.kind).as("expectation_type"),
        lit(e.column).as("column_name"),
        col(s"obs_$i").as("observed"),
        e.success(col(s"obs_$i")).as("success"))
    }
    agg.select(inline(array(reportRows: _*))).orderBy(col("idx"))
  }

  /** The silver suite over the cleansed claims, with an injected fixed
    * processing_timestamp (SURVEY.md §7.4: frozen clock keeps the
    * differential deterministic). */
  def silverReport(spark: org.apache.spark.sql.SparkSession, sfDir: String)
      : DataFrame = {
    graft.Engine.configure(spark)
    val base = SilverCleanse.fromOrders(graft.Tables.orders(spark, sfDir))
      .withColumn("processing_timestamp",
        lit("2024-01-01 00:00:00").cast("timestamp"))
    run(base, silverSuite)
  }

  /** DuckDB mirror of [[run]] for a suite over a relation named `base`;
    * caller prefixes the CTEs that define `base`. */
  def oracleSelectSql(suite: Seq[Expectation] = silverSuite): String = {
    val obs = suite.zipWithIndex.map { case (e, i) =>
      s"${e.observedSql} AS obs_$i"
    }.mkString(",\n    ")
    val rows = suite.zipWithIndex.map { case (e, i) =>
      val o = s"CAST(obs_$i AS DOUBLE)"
      s"SELECT $i AS idx, '${e.kind}' AS expectation_type, " +
        s"'${e.column}' AS column_name, $o AS observed, " +
        s"${e.successSql(o)} AS success FROM obs"
    }.mkString("\n  UNION ALL\n  ")
    s"""obs AS (
  SELECT
    $obs
  FROM base)
SELECT * FROM (
  $rows
) r ORDER BY idx"""
  }
}
