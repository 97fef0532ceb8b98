package graft

import org.apache.spark.sql.functions._
import graft.functions.Cleansing

/** Unit tests for the silver scalar functions — the dirty-value cases of
  * FIXTURES.md §A, including the order-sensitive score cascade and the
  * `<=` bucket boundaries. */
class CleansingSpec extends SparkSpec {
  import spark.implicits._

  test("amountCategory boundaries: exactly 100/1000/10000 take lower bucket") {
    val got = Seq(0.0, 50.0, 100.0, 100.01, 1000.0, 1000.01, 10000.0, 10000.01)
      .toDF("a")
      .select(Cleansing.amountCategory($"a").as("c")).as[String].collect()
    assert(got.toSeq == Seq("ZERO", "LOW", "LOW", "MEDIUM", "MEDIUM", "HIGH",
      "HIGH", "VERY_HIGH"))
  }

  test("clampAmount: null and negative to 0.0") {
    val got = Seq(Some(-5.0), None, Some(7.5)).toDF("a")
      .select(Cleansing.clampAmount($"a").as("c")).as[Double].collect()
    assert(got.toSeq == Seq(0.0, 0.0, 7.5))
  }

  test("cleanProvider: null/blank to UNKNOWN, else UPPER(TRIM)") {
    val got = Seq(Some("  acme co "), Some("   "), Some(""), None)
      .toDF("p").select(Cleansing.cleanProvider($"p").as("c"))
      .as[String].collect()
    assert(got.toSeq == Seq("ACME CO", "UNKNOWN", "UNKNOWN", "UNKNOWN"))
  }

  test("parseServiceDate: three formats, first-match-wins, garbage → null") {
    val got = Seq("2023-07-15", "07/15/2023", "25/12/2023", "not-a-date")
      .toDF("d").select(Cleansing.parseServiceDate($"d").cast("string").as("c"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("2023-07-15", "2023-07-15", "2023-12-25", null))
  }

  test("parseServiceDate: day<=12 EU date mis-parses as US (reference hazard)") {
    // '05/04/2023' is ambiguous; MM/dd wins because it is tried first
    // (claims_to_iceberg.py:60-63) — May 4th, not April 5th.
    val got = Seq("05/04/2023").toDF("d")
      .select(Cleansing.parseServiceDate($"d").cast("string")).head.getString(0)
    assert(got == "2023-05-04")
  }

  test("qualityScore cascade order: claim_id > member_id > date > amount") {
    def score(cid: Option[String], mid: Option[String], dt: Option[String],
        amt: Double): Double =
      Seq((cid, mid, dt, amt)).toDF("cid", "mid", "dt", "amt")
        .select(Cleansing.qualityScore($"cid", $"mid",
          to_date($"dt"), $"amt")).head.getDouble(0)
    assert(score(None, Some("m"), Some("2023-01-01"), 5.0) == 0.0)
    // null member dominates null date AND zero amount
    assert(score(Some("c"), None, None, 0.0) == 0.3)
    // null date dominates zero amount (negative+null-date case of FIXTURES §A)
    assert(score(Some("c"), Some("m"), None, 0.0) == 0.5)
    assert(score(Some("c"), Some("m"), Some("2023-01-01"), 0.0) == 0.7)
    assert(score(Some("c"), Some("m"), Some("2023-01-01"), 5.0) == 1.0)
  }
}
