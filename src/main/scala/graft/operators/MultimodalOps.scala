package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** Multimodal-column plumbing: media (image/audio/video) handled as
  * opaque BINARY payloads with typed metadata, plus a feature-extraction
  * path over `mapPartitions` with case-class Encoders — the Scala
  * counterpart of a Pandas-UDF `mapInPandas` batch decode.
  *
  * The DECODE STEP IS A DETERMINISTIC STUB (this container has no
  * image/audio codecs — builder brief): the Spark-side plumbing —
  * binary column, schema, partition-batched iteration, typed output —
  * is real and tested; swap `fakeDecode` for a JNI/codec call and
  * nothing else changes.
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
