package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewOps

/** Salted-join / salted-distinct skew handling: result equivalence with
  * the unsalted forms, and actual scatter of the hot key. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 5000 rows, 80% on the single hot key 1 — the UNKNOWN-provider shape
  private lazy val fact = spark.range(5000)
    .select(when($"id" % 5 =!= 0, lit(1L)).otherwise($"id" % 50).as("k"),
      $"id".as("payload"))
  private lazy val dim = spark.range(50)
    .select($"id".as("k"), concat(lit("attr_"), $"id").as("attr"))

  test("saltedJoin is row-identical to the plain join") {
    val plain = fact.join(dim, "k")
      .select($"k", $"payload", $"attr").collect()
      .map(_.toSeq).sortBy(_.toString)
    val salted = SkewOps.saltedJoin(fact, dim, "k", 8, $"payload")
      .select($"k", $"payload", $"attr").collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(salted.sameElements(plain) && plain.length == 5000)
  }

  test("the hot key actually scatters across salt buckets") {
    val buckets = fact.filter($"k" === 1)
      .withColumn("__salt", pmod(xxhash64($"payload"), lit(8L)).cast("int"))
      .groupBy($"__salt").count().collect()
    assert(buckets.length == 8)
    val counts = buckets.map(_.getAs[Long]("count"))
    // evenly-ish: no bucket more than 3x the ideal share
    assert(counts.max < (counts.sum / 8) * 3, counts.toSeq)
  }

  test("saltedDistinctCount == exact countDistinct per key") {
    val exact = fact.groupBy($"k")
      .agg(countDistinct($"payload").as("d")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedDistinctCount(fact, "k", "payload", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == exact)
  }
}
