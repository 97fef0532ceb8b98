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
}
