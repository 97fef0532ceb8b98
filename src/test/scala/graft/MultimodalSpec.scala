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

  test("resizeImages: fixed-size buffers regardless of input payload size") {
    val payloads = MultimodalOps.withPayload(
      Seq((1L, "a longer payload than 3x3"), (2L, "ab"), (3L, ""))
        .toDF("doc_id", "text")).repartition(2)
    val out = MultimodalOps.resizeImages(spark, payloads, width = 3, height = 3)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.size == 3)
    out.values.foreach { r =>
      assert(r.width == 3 && r.height == 3 && r.pixels.length == 9)
    }
    assert(out(2L).pixels.take(2).toSeq == "ab".getBytes.toSeq) // content kept
    assert(out(2L).pixels.drop(2).forall(_ == 0))               // zero-padded
  }

  test("sampleFrames: 1:N expansion, every k-th fixed-size chunk, synthetic ts") {
    val payloads = MultimodalOps.withPayload(
      Seq((1L, "0123456789abcdef0123456789abcdef"), (2L, "shrt"))
        .toDF("doc_id", "text")).repartition(2)
    val frames = MultimodalOps.sampleFrames(spark, payloads,
      frameBytes = 8, every = 2, frameMs = 40L).collect()
    val byDoc = frames.groupBy(_.doc_id)
    // doc 1: 32 bytes / 8 = 4 frames, sampled every 2nd → idx 0 and 2
    assert(byDoc(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(byDoc(1L).find(_.frame_idx == 2).get.ts_offset_ms == 80L)
    assert(byDoc(1L).find(_.frame_idx == 2).get.frame.toSeq ==
      "0123456789abcdef0123456789abcdef".getBytes.slice(16, 24).toSeq)
    // doc 2: 4 bytes < one frame → no frames emitted
    assert(!byDoc.contains(2L))
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
