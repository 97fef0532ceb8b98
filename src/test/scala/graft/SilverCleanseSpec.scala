package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{RawClaims, SilverCleanse}

/** End-to-end silver pipeline semantics on a tiny frame + the injected
  * star-schema transplant. */
class SilverCleanseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("gate semantics: null claim_id dropped pre-score; score<0.5 dropped") {
    val orders = Seq(
      (97L * 2, 1L, "O", 500.0, ts("1995-03-15"), "1-URGENT"), // claim_id null → dropped
      (13L, 2L, "O", 500.0, ts("1995-03-16"), "1-URGENT"),     // member null → 0.3 → dropped
      (3L, 3L, "O", 500.0, ts("1995-03-17"), "1-URGENT"),      // %4==3 → unparseable date → 0.5 kept
      (2L, 4L, "O", 500.0, ts("1995-03-18"), "1-URGENT")       // clean → 1.0
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val silver = SilverCleanse.fromOrders(orders)
    val rows = silver.orderBy("claim_id").collect()
    assert(rows.length == 2)
    val byId = rows.map(r => r.getAs[String]("claim_id") ->
      r.getAs[Double]("data_quality_score")).toMap
    assert(byId == Map("C3" -> 0.5, "C2" -> 1.0))
    // missing-date row keeps null derived date parts
    val r3 = rows.find(_.getAs[String]("claim_id") == "C3").get
    assert(r3.isNullAt(r3.fieldIndex("service_year")))
  }

  test("negative amount clamps to 0 and scores 0.7 (ZERO category)") {
    val orders = Seq(
      (23L * 4, 1L, "O", 999.0, ts("1996-02-02"), "5-LOW") // %23==0 → negative
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val r = SilverCleanse.fromOrders(orders).head
    assert(r.getAs[Double]("claim_amount") == 0.0)
    assert(r.getAs[String]("claim_amount_category") == "ZERO")
    assert(r.getAs[Double]("data_quality_score") == 0.7)
  }

  test("provider cleansing: upper-trim and UNKNOWN defaults") {
    val orders = Seq(
      (11L * 3, 1L, "O", 10.0, ts("1996-02-02"), "5-LOW"), // %11==0 → null → UNKNOWN
      (12L, 1L, "O", 10.0, ts("1996-02-02"), "5-LOW"),     // %11==1 → blank → UNKNOWN
      (2L, 1L, "O", 10.0, ts("1996-02-02"), "5-LOW")       // ' prov_2 ' → PROV_2
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val got = SilverCleanse.fromOrders(orders)
      .select("provider_name").as[String].collect().sorted
    assert(got.toSeq == Seq("PROV_2", "UNKNOWN", "UNKNOWN"))
  }

  test("batch metadata stamps constant batch_id from injected clock") {
    val df = Seq(("a")).toDF("x")
    val clock = to_timestamp(lit("2024-05-06 07:08:09"))
    val got = SilverCleanse.withBatchMetadata(df, clock).head
    assert(got.getAs[String]("batch_id") == "20240506_070809")
    assert(got.getAs[String]("source_file") == "csv")
  }

  test("raw injection is total: every orders row lands in exactly one regime") {
    val raw = RawClaims.fromOrders(Tables.orders(spark, sfDir))
    assert(raw.count() == Tables.orders(spark, sfDir).count())
  }
}
