package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** Multimodal-column plumbing (SURVEY.md §2.4): binary payloads with
  * typed metadata, partition-parallel decode (stubbed kernel), frame
  * sampling. The decode STUB is deterministic, so outputs are asserted
  * exactly; the Spark-side shapes (schema, mapPartitions batching,
  * explode) are the real subject.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit val sp: org.apache.spark.sql.SparkSession = spark

  private val docs = Seq((1L, "hello world"), (2L, "abcdefgh"), (3L, "x"))
    .toDF("doc_id", "text")

  test("attachPayload: binary payload + typed metadata struct") {
    val m = Multimodal.attachPayload(docs, "doc_id", "text")
    assert(m.schema("payload").dataType.typeName == "binary")
    val meta = m.select("meta.n_bytes", "meta.width", "meta.height")
      .as[(Int, Int, Int)].collect()
    assert(meta.forall { case (n, w, h) => n > 0 && w >= 64 && h >= 64 })
    // payload round-trips the text bytes
    val back = m.select(col("id"), decode(col("payload"), "UTF-8").as("t"))
      .orderBy("id").as[(Long, String)].collect()
    assert(back.toSeq == Seq((1L, "hello world"), (2L, "abcdefgh"), (3L, "x")))
  }

  test("decodeFeaturesStub: deterministic features, stable checksum, fixed dim") {
    val media = Multimodal.attachPayload(docs, "doc_id", "text")
      .select(col("id"), col("payload"), col("meta.mime").as("mime"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[Multimodal.MediaRow]
    val f1 = Multimodal.decodeFeaturesStub(media, dim = 8).orderBy("id").collect()
    val f2 = Multimodal.decodeFeaturesStub(media, dim = 8).orderBy("id").collect()
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq, "stub must be deterministic")
    assert(f1.forall(_.features.length == 8))
    assert(f1.map(_.n_bytes).toSeq == Seq(11, 8, 1))
  }

  test("sampleFrames: n byte-slice frames per payload, metadata carried") {
    val m = Multimodal.attachPayload(docs.where($"doc_id" === 1L), "doc_id", "text")
    val frames = Multimodal.sampleFrames(m, 4)
    assert(frames.count() == 4)
    val idx = frames.select("frame_idx").as[Int].collect().sorted
    assert(idx.sameElements(Array(0, 1, 2, 3)))
    assert(frames.where(col("frame_n_bytes") <= 0).count() == 0)
  }
}
