package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

/** Multimodal binary-column plumbing: payload/metadata columns and the
  * partition-batched (stubbed) decode path. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("withPayload: binary column with exact byte metadata") {
    val df = MultimodalOps.withPayload(
      Seq((1L, "héllo"), (2L, "ab")).toDF("doc_id", "text"))
    val r = df.orderBy("doc_id").collect()
    assert(r(0).getAs[Array[Byte]]("payload").length == 6) // é is 2 bytes
    assert(r(0).getAs[Long]("n_bytes") == 6L)
    assert(r(1).getAs[Long]("n_bytes") == 2L)
    assert(r(0).getAs[String]("checksum").matches("[0-9a-f]{32}"))
  }

  test("decodeFeatures: typed output, deterministic stub, partition-safe") {
    val payloads = MultimodalOps.withPayload(
      Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")).repartition(3)
    val feats = MultimodalOps.decodeFeatures(spark, payloads)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 3)
    assert(feats(1L).features.toSeq ==
      Seq(3.0f, 'a'.toFloat, 'c'.toFloat, ('a' ^ 'b' ^ 'c').toFloat))
    assert(feats(2L).n_bytes == 0)
    assert(feats(2L).features.toSeq == Seq(0.0f, 0.0f, 0.0f, 0.0f))
    // schema is the case-class encoding (plumbing contract for a real codec)
    val ds = MultimodalOps.decodeFeatures(spark, payloads)
    assert(ds.schema.fieldNames.toSeq == Seq("doc_id", "n_bytes", "features"))
  }

  test("multimodalMeta groups only metadata (payload pruned from shuffle)") {
    val df = MultimodalOps.multimodalMeta(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("source", "n_docs", "total_bytes",
      "max_bytes", "distinct_payloads"))
    rows.foreach(r => assert(r.getAs[Long]("total_bytes") >=
      r.getAs[Long]("max_bytes")))
  }
}
