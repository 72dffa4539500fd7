package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.4): image/audio/video as
  * opaque BINARY payloads with typed metadata, plus decode / feature-
  * extract / frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * STUB — a deterministic fake that derives "features" from the raw
  * bytes. Everything around it is real and scale-shaped: the schema
  * (binary + metadata struct), the partition-preserving `mapPartitions`
  * batch processing (the Scala analog of `mapInPandas` — one iterator
  * per partition, constant memory), and the expression-level paths.
  */
object Multimodal {

  final case class MediaRow(id: Long, payload: Array[Byte], mime: String,
                            width: Int, height: Int)
  final case class MediaFeatures(id: Long, n_bytes: Int, checksum: Long,
                                 features: Array[Float])

  /** Wrap a text corpus as fake media rows: payload = UTF-8 bytes,
    * metadata derived deterministically. Real pipelines would read
    * binaryFile sources (`spark.read.format("binaryFile")`).
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        (pmod(crc32(encode(col(textCol), "UTF-8")), lit(1280)) + 64).cast("int").as("width"),
        (pmod(crc32(encode(col(textCol), "UTF-8")), lit(720)) + 64).cast("int").as("height")
      ).as("meta"))

  /** STUB decode + feature extraction: a real pipeline would decode the
    * image/audio here (libjpeg/ffmpeg via a vectorized UDF); this stub
    * derives a deterministic `dim`-float feature vector from byte
    * content. Runs as `mapPartitions` — batch-at-a-time, partition-
    * parallel, zero driver involvement (the shape that matters at scale).
    */
  def decodeFeaturesStub(ds: Dataset[MediaRow], dim: Int = 8)
                        (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val bytes = m.payload
        val checksum = bytes.foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 1000000007L)
        // STUB: stand-in for the decoded-content feature extractor.
        val feats = Array.tabulate(dim) { i =>
          if (bytes.isEmpty) 0f
          else bytes.indices.collect { case j if j % dim == i => (bytes(j) & 0xff).toFloat }
            .sum / bytes.length
        }
        MediaFeatures(m.id, bytes.length, checksum, feats)
      }
    }
  }

  /** STUB frame sampling: split the payload into `n` equal byte slices
    * ("frames"). Real video would frame-decode; the plumbing (explode →
    * one row per frame, metadata carried) is the real part.
    */
  def sampleFrames(df: DataFrame, n: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_bytes",
        substring(col("payload"),
          (col("frame_idx") * (octet_length(col("payload")) / n) + 1).cast("int"),
          greatest((octet_length(col("payload")) / n).cast("int"), lit(1))))
      .select(col("id"), col("frame_idx"), col("frame_bytes"),
        octet_length(col("frame_bytes")).as("frame_n_bytes"))
}
