package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** Multimodal-column plumbing: media (image/audio/video) handled as
  * opaque BINARY payloads with typed metadata, plus a feature-extraction
  * path over `mapPartitions` with case-class Encoders — the Scala
  * counterpart of a Pandas-UDF `mapInPandas` batch decode.
  *
  * Codec status (round 9): the IMAGE path is a REAL decoder —
  * `javax.imageio` ships with every JDK (PNG/JPEG/GIF/BMP), so
  * [[decodeImages]]/[[resizeImagesReal]] decode genuine image bytes
  * with no added dependency; MultimodalSpec round-trips generated
  * PNGs/JPEGs and pins the corrupt-payload counting contract. The
  * AUDIO path is real too — `javax.sound.sampled` decodes WAV/AIFF
  * PCM ([[decodeAudio]]). Only the VIDEO path below remains a
  * DETERMINISTIC STUB (the JDK has no video codec): its Spark-side
  * plumbing — binary
  * column, schema, partition-batched iteration, typed output — is
  * real and tested; swap the fake for a JNI/codec call and nothing
  * else changes.
  */
object MultimodalOps {

  /** Typed feature row produced by the decode path. */
  final case class MediaFeature(doc_id: Long, n_bytes: Int,
      features: Array[Float])

  /** Attach the opaque payload + typed metadata columns. The UTF-8 bytes
    * of `text` stand in for media bytes; with a real corpus this column
    * comes straight from the source (parquet BINARY), and every
    * downstream expression is unchanged. */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("checksum", md5(col("payload")))

  /** Per-source payload statistics (oracle-checked): metadata-only
    * aggregation — at scale this never touches the heavy bytes beyond
    * the length/hash projections, and column pruning drops the payload
    * from the shuffle. */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    withPayload(Engine.spread(Tables.documents(spark, sfDir)))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        countDistinct(col("checksum")).as("distinct_payloads"))
      .orderBy(col("source"))
  }

  /** STUB decoder: a real implementation would hand `bytes` to an image/
    * audio codec and emit its feature vector. Deterministic fake so the
    * plumbing is testable: [length, first byte, last byte, xor-fold]. */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = Array(
    bytes.length.toFloat,
    bytes.headOption.getOrElse(0: Byte).toFloat,
    bytes.lastOption.getOrElse(0: Byte).toFloat,
    bytes.foldLeft(0)((a, b) => a ^ b).toFloat)

  /** Partition-batched decode: one iterator pass per partition (the
    * batch shape a vectorized decoder wants — amortize codec init across
    * the partition, never materialize the whole partition in memory). */
  def decodeFeatures(spark: SparkSession, payloads: DataFrame)
      : Dataset[MediaFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would construct the codec ONCE here
        it.map { case (id, bytes) =>
          MediaFeature(id, bytes.length, fakeDecode(bytes))
        }
      }
  }

  // ---------------------------------------------------------------
  // REAL codecs — pure JDK, no added dependency. The long-standing
  // "this container has no codecs" caveat is only true for VIDEO:
  // every JDK ships PNG/JPEG/GIF/BMP readers (javax.imageio) and
  // WAV/AIFF PCM parsing (javax.sound.sampled). The video path keeps
  // its documented stub.
  // ---------------------------------------------------------------

  /** Decoded-image feature row. `decoded=false` rows carry zeros: a
    * corrupt or non-image payload is COUNTED, never a job failure —
    * the only survivable contract when one bad file among billions
    * must not kill a 100 TB scan. Channel means divide exact integer
    * sums by the pixel count (one double division at the end), so
    * results are bit-stable across partitionings. */
  final case class ImageFeature(doc_id: Long, decoded: Boolean,
      width: Int, height: Int, mean_r: Double, mean_g: Double,
      mean_b: Double, mean_luma: Double)

  /** Partition-batched REAL image decode over (doc_id, payload) rows:
    * ImageIO disk-caching is disabled once per partition (temp-file
    * churn would dominate small images), each payload decodes from its
    * in-memory bytes, and per-channel INTEGER sums reduce each raster.
    * Luma = (r+g+b)/3 per pixel summed exactly, divided once. The
    * iterator never materializes a partition of rasters — one image is
    * in flight per row, the mapPartitions batch shape a vectorized
    * decoder also wants. */
  def decodeImages(spark: SparkSession, payloads: DataFrame)
      : Dataset[ImageFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition
        it.map { case (id, bytes) =>
          // NonFatal, not just IOException: ImageIO plugins throw
          // RuntimeExceptions (IAE, ArrayIndexOutOfBounds, NegativeArray
          // Size) on adversarial payloads — the counted-never-thrown
          // contract must survive those too (round-9 ADVICE)
          val img =
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
            catch { case scala.util.control.NonFatal(_) => None }
          img match {
            case Some(im) =>
              val (w, h) = (im.getWidth, im.getHeight)
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = im.getRGB(x, y)
                  sr += (rgb >> 16) & 0xff
                  sg += (rgb >> 8) & 0xff
                  sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              ImageFeature(id, decoded = true, w, h,
                sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
                (sr + sg + sb).toDouble / (3L * n))
            case None =>
              ImageFeature(id, decoded = false, 0, 0, 0.0, 0.0, 0.0, 0.0)
          }
        }
      }
  }

  /** REAL image resize through the same JDK codec: decode, bilinear
    * scale to width×height, re-encode PNG (lossless, so the output
    * bytes are deterministic). Non-decodable payloads yield an EMPTY
    * buffer with dims (0,0) — counted, not thrown, same contract as
    * [[decodeImages]]. Output size per row is bounded by the target
    * dims regardless of input size. */
  def resizeImagesReal(spark: SparkSession, payloads: DataFrame,
      width: Int = 16, height: Int = 16): Dataset[ResizedImage] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img =
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
            catch { case scala.util.control.NonFatal(_) => None }
          img match {
            case Some(im) =>
              val out = new java.awt.image.BufferedImage(width, height,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(im, 0, 0, width, height, null)
              } finally g.dispose()
              val buf = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", buf)
              ResizedImage(id, width, height, buf.toByteArray)
            case None => ResizedImage(id, 0, 0, Array.emptyByteArray)
          }
        }
      }
  }

  /** Decoded-audio feature row — same counted-failure contract as
    * [[ImageFeature]]. `rms` is sqrt of an exact integer
    * sum-of-squares over the PCM samples divided by their count;
    * `peak` is the max absolute sample. */
  final case class AudioFeature(doc_id: Long, decoded: Boolean,
      channels: Int, sample_rate: Int, n_frames: Long,
      duration_ms: Long, rms: Double, peak: Int)

  /** Partition-batched REAL audio decode — `javax.sound.sampled` is
    * also pure JDK: WAV/AIFF/AU containers with 8- or 16-bit PCM
    * decode with no added dependency (compressed audio — MP3/AAC —
    * has no JDK codec and stays out of scope). Feature reduction is
    * exact integer arithmetic per sample (sum of squares as Long,
    * max |sample|), one sqrt at the end. Non-audio or non-PCM
    * payloads are counted `decoded=false`, never thrown — one bad
    * file among billions must not kill the scan. */
  def decodeAudio(spark: SparkSession, payloads: DataFrame)
      : Dataset[AudioFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        it.map { case (id, bytes) =>
          val fail = AudioFeature(id, decoded = false, 0, 0, 0L, 0L, 0.0, 0)
          try {
            val in = AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = in.getFormat
            val bits = fmt.getSampleSizeInBits
            // supported: 8-bit PCM (either signedness) and SIGNED
            // 16-bit PCM. Unsigned 16-bit routes to the counted-failure
            // row (round-9 ADVICE: the old guard admitted it but the
            // 16-bit assembly below decodes signed — wrong rms/peak; no
            // JDK container parser ever produces unsigned 16-bit, so
            // restricting is the honest contract, not a capability loss)
            val pcm = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
              (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED &&
                bits == 8)
            if (!pcm || (bits != 8 && bits != 16)) fail
            else {
              val data = in.readAllBytes()
              val ch = fmt.getChannels
              val bytesPerSample = bits / 8
              val n = data.length / bytesPerSample
              var i = 0
              var sumSq = 0L
              var peak = 0
              while (i < n) {
                val s =
                  if (bits == 8) {
                    if (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
                      (data(i) & 0xff) - 128
                    else data(i).toInt
                  } else {
                    // 16-bit here is PCM_SIGNED only (guard above)
                    val off = i * 2
                    val lo = data(off + (if (fmt.isBigEndian) 1 else 0)) & 0xff
                    val hi = data(off + (if (fmt.isBigEndian) 0 else 1)).toInt
                    (hi << 8) | lo
                  }
                sumSq += s.toLong * s
                if (math.abs(s) > peak) peak = math.abs(s)
                i += 1
              }
              val frames = n.toLong / ch
              AudioFeature(id, decoded = true, ch,
                fmt.getSampleRate.toInt, frames,
                frames * 1000L / fmt.getSampleRate.toLong,
                if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n), peak)
            }
          } catch {
            // NonFatal: container parsers can throw RuntimeExceptions on
            // malformed headers, not only the two checked types
            case scala.util.control.NonFatal(_) => fail
          }
        }
      }
  }

  /** A resized image: fixed-size pixel buffer + original dims. */
  final case class ResizedImage(doc_id: Long, width: Int, height: Int,
      pixels: Array[Byte])

  /** One sampled video frame (1:N — cardinality-changing decode). */
  final case class SampledFrame(doc_id: Long, frame_idx: Int,
      ts_offset_ms: Long, frame: Array[Byte])

  /** STUB resize: a real implementation decodes `bytes`, bilinear-resizes
    * to width×height, and re-encodes. Deterministic fake — truncate/
    * zero-pad to exactly width*height bytes — so the CONTRACT (output
    * buffer is always width*height regardless of input size) is testable. */
  private def fakeResize(bytes: Array[Byte], width: Int, height: Int)
      : Array[Byte] = java.util.Arrays.copyOf(bytes, width * height)

  /** Partition-batched image resize: 1:1 over payload rows, fixed-size
    * output buffers. Same mapPartitions batch shape as [[decodeFeatures]]
    * (codec/scaler constructed once per partition); output size is
    * width*height per row, so executor memory per task is
    * rows-in-flight × buffer — bounded, spill-free, independent of input
    * payload sizes. */
  def resizeImages(spark: SparkSession, payloads: DataFrame,
      width: Int = 16, height: Int = 16): Dataset[ResizedImage] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          ResizedImage(id, width, height, fakeResize(bytes, width, height))
        }
      }
  }

  /** Partition-batched video frame sampling: 1:N flatMap — each payload
    * (stand-in for a container stream) yields every `every`-th fixed-size
    * chunk as a "frame" with its index and a synthetic timestamp offset
    * (`frameMs` per source frame). A real implementation demuxes and
    * decodes keyframes; the cardinality-changing iterator plumbing —
    * lazy per-row expansion, no whole-video materialization — is exactly
    * what that needs and is what this stub exercises. */
  def sampleFrames(spark: SparkSession, payloads: DataFrame,
      frameBytes: Int = 8, every: Int = 2, frameMs: Long = 40L)
      : Dataset[SampledFrame] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes
          (0 until nFrames by every).iterator.map { f =>
            SampledFrame(id, f, f * frameMs,
              java.util.Arrays.copyOfRange(bytes, f * frameBytes,
                (f + 1) * frameBytes))
          }
        }
      }
  }
}
