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

  // --- REAL image codec path (javax.imageio, pure JDK) ---

  /** Deterministic seeded test image: every pixel's channels derive
    * from (doc, x, y) arithmetic — the expected channel sums are
    * computable in the test without touching the codec. */
  private def testImage(doc: Int, w: Int, h: Int) = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (doc * 37 + x * 11 + y * 3) % 256
      val g = (doc * 17 + x * 5 + y * 13) % 256
      val b = (doc * 29 + x * 7 + y * 19) % 256
      im.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    im
  }

  private def pngBytes(im: java.awt.image.BufferedImage): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", buf)
    buf.toByteArray
  }

  test("decodeImages: REAL PNG/JPEG decode, exact channel means, corrupt rows counted") {
    import spark.implicits._
    val imgs = (1 to 12).map(i => (i, testImage(i, 8 + i % 5, 6 + i % 3)))
    // expected means from the raster directly — independent of the
    // operator's decode path (PNG is lossless, so they must agree
    // EXACTLY)
    val expected = imgs.map { case (i, im) =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until im.getHeight; x <- 0 until im.getWidth) {
        val rgb = im.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      }
      val n = im.getWidth.toLong * im.getHeight
      i.toLong -> (im.getWidth, im.getHeight, sr.toDouble / n,
        sg.toDouble / n, sb.toDouble / n)
    }.toMap
    val jpegId = 100L
    val jpegBytes = {
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(testImage(7, 10, 10), "jpg", buf)
      buf.toByteArray
    }
    val corrupt = Seq((200L, "not an image".getBytes("UTF-8")),
      (201L, Array[Byte](1, 2, 3)))
    val payloads = (imgs.map { case (i, im) => (i.toLong, pngBytes(im)) } ++
      Seq((jpegId, jpegBytes)) ++ corrupt).toDF("doc_id", "payload")
    val out = MultimodalOps.decodeImages(spark, payloads.repartition(4))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out.size == 15)
    expected.foreach { case (id, (w, h, mr, mg, mb)) =>
      val f = out(id)
      assert(f.decoded && f.width == w && f.height == h, s"doc $id")
      assert(f.mean_r == mr && f.mean_g == mg && f.mean_b == mb, s"doc $id")
      assert(f.mean_luma == (mr + mg + mb) / 3.0 ||
        math.abs(f.mean_luma - (mr + mg + mb) / 3.0) < 1e-9, s"doc $id")
    }
    // the JPEG decodes (lossy values — shape checks only)
    val j = out(jpegId)
    assert(j.decoded && j.width == 10 && j.height == 10)
    assert(j.mean_r >= 0.0 && j.mean_r <= 255.0)
    // corrupt payloads are COUNTED, not thrown
    corrupt.foreach { case (id, _) =>
      assert(!out(id).decoded && out(id).width == 0, s"doc $id")
    }
  }

  test("decodeAudio: REAL WAV/PCM decode, exact rms/peak, non-audio counted") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // deterministic 16-bit mono PCM: a seeded sawtooth per doc
    def samples(doc: Int, n: Int): Array[Short] =
      Array.tabulate(n)(i => (((doc * 7919 + i * 131) % 20001) - 10000).toShort)
    def wavBytes(s: Array[Short], rate: Float): Array[Byte] = {
      val raw = new Array[Byte](s.length * 2)
      s.indices.foreach { i =>
        raw(i * 2) = (s(i) & 0xff).toByte          // little-endian
        raw(i * 2 + 1) = ((s(i) >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, s.length.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
    val docs = (1 to 6).map(i => (i.toLong, samples(i, 4000 + i * 100)))
    val expected = docs.map { case (id, s) =>
      val sumSq = s.map(x => x.toLong * x).sum
      id -> (s.length.toLong, math.sqrt(sumSq.toDouble / s.length),
        s.map(x => math.abs(x.toInt)).max)
    }.toMap
    val payloads = (docs.map { case (id, s) => (id, wavBytes(s, 16000f)) } ++
      Seq((100L, "definitely not audio".getBytes("UTF-8"))))
      .toDF("doc_id", "payload")
    val out = MultimodalOps.decodeAudio(spark, payloads.repartition(3))
      .collect().map(f => f.doc_id -> f).toMap
    expected.foreach { case (id, (frames, rms, peak)) =>
      val f = out(id)
      assert(f.decoded && f.channels == 1 && f.sample_rate == 16000, s"doc $id")
      assert(f.n_frames == frames, s"doc $id")
      assert(f.duration_ms == frames * 1000L / 16000L, s"doc $id")
      assert(f.rms == rms, s"doc $id: ${f.rms} vs $rms")
      assert(f.peak == peak, s"doc $id")
    }
    assert(!out(100L).decoded && out(100L).n_frames == 0L)
  }

  test("resizeImagesReal: decode→bilinear→PNG round-trip, bounded output, corrupt safe") {
    import spark.implicits._
    val payloads = Seq(
      (1L, pngBytes(testImage(3, 32, 24))),
      (2L, pngBytes(testImage(4, 5, 5))), // upscale path
      (3L, "garbage".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = MultimodalOps.resizeImagesReal(spark, payloads, 16, 16)
      .collect().map(r => r.doc_id -> r).toMap
    for (id <- Seq(1L, 2L)) {
      val r = out(id)
      assert(r.width == 16 && r.height == 16)
      // the re-encoded buffer IS a 16×16 image (decode it back)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.pixels))
      assert(back.getWidth == 16 && back.getHeight == 16)
    }
    assert(out(3L).width == 0 && out(3L).pixels.isEmpty)
    // determinism: a second run yields byte-identical PNG buffers
    val again = MultimodalOps.resizeImagesReal(spark, payloads, 16, 16)
      .collect().map(r => r.doc_id -> r).toMap
    Seq(1L, 2L).foreach(id =>
      assert(java.util.Arrays.equals(out(id).pixels, again(id).pixels)))
  }
}
