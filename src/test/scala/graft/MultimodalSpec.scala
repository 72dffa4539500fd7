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

  test("decodeImageFeatures: golden 2x2 PNG decodes to exact channel means") {
    // 2x2 image: red, green | blue, white — means are exact quarters.
    val px = Array(Array(0xff0000, 0x00ff00), Array(0x0000ff, 0xffffff))
    val bytes = Multimodal.pngBytes(2, 2, (x, y) => px(y)(x))
    val df = Seq((7L, bytes)).toDF("doc_id", "payload")
    val f = Multimodal.decodeImageFeatures(df, "doc_id", "payload")
      .as[Multimodal.ImageFeatures].collect().head
    assert((f.width, f.height, f.n_pixels) == (2, 2, 4L))
    assert(f.mean_r == (255 + 255) / 4.0) // red + white
    assert(f.mean_g == (255 + 255) / 4.0) // green + white
    assert(f.mean_b == (255 + 255) / 4.0) // blue + white
  }

  test("syntheticPng round-trips through the real codec to closed-form features") {
    val ids = Seq(0L, 1L, 17L, 255L, 499L)
    val df = ids.map(i => (i, Multimodal.syntheticPng(i))).toDF("doc_id", "payload")
    val out = Multimodal.decodeImageFeatures(df, "doc_id", "payload")
      .as[Multimodal.ImageFeatures].orderBy("doc_id").collect()
    ids.sorted.zip(out).foreach { case (id, f) =>
      assert(f.width == 16 + (id % 16).toInt && f.height == 16 + (id % 8).toInt)
      assert(f.mean_r == ((id * 31) % 256).toDouble, s"id=$id")
      assert(f.mean_g == ((id * 17) % 256).toDouble, s"id=$id")
      assert(f.mean_b == ((id * 7) % 256).toDouble, s"id=$id")
    }
  }

  test("resizePng: solid color survives a real bilinear downscale exactly") {
    val bytes = Multimodal.pngBytes(16, 16, (_, _) => 0x336699)
    val df = Seq((1L, bytes)).toDF("doc_id", "payload")
    val resized = Multimodal.resizePng(df, "doc_id", "payload", 4, 4)
    val f = Multimodal.decodeImageFeatures(resized, "doc_id", "payload")
      .as[Multimodal.ImageFeatures].collect().head
    assert((f.width, f.height) == (4, 4))
    assert((f.mean_r, f.mean_g, f.mean_b) == (0x33.toDouble, 0x66.toDouble, 0x99.toDouble))
  }

  test("JPEG decodes through the same path (lossy: exact dims, close means)") {
    val img = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(0x40, 0x80, 0xC0)); g.fillRect(0, 0, 32, 24) }
    finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JDK must have a JPEG writer")
    val df = Seq((5L, bos.toByteArray)).toDF("doc_id", "payload")
    val f = Multimodal.decodeImageFeatures(df, "doc_id", "payload")
      .as[Multimodal.ImageFeatures].collect().head
    assert((f.width, f.height) == (32, 24), "dimensions survive lossy codec exactly")
    assert(math.abs(f.mean_r - 0x40) < 8 && math.abs(f.mean_g - 0x80) < 8 &&
      math.abs(f.mean_b - 0xC0) < 8, s"means close to source: $f")
  }

  test("decodeWavFeatures: square wave's RMS == amplitude, exact crossings") {
    // 800 samples, half-period 8: value alternates +a/-a every 8 samples.
    val a = 8192
    val samples = Array.tabulate(800)(i => (if ((i / 8) % 2 == 0) a else -a).toShort)
    val bytes = Multimodal.wavBytes(samples)
    val df = Seq((3L, bytes)).toDF("doc_id", "payload")
    val f = Multimodal.decodeWavFeatures(df, "doc_id", "payload")
      .as[Multimodal.WavFeatures].collect().head
    assert(f.n_samples == 800L)
    assert(math.abs(f.rms - a / 32768.0) < 1e-12)
    assert(f.peak == a / 32768.0)
    // sign flips at every multiple of 8 except t=0 → 800/8 - 1
    assert(f.zero_crossings == 99L)
  }

  test("sampleFrames: n byte-slice frames per payload, metadata carried") {
    val m = Multimodal.attachPayload(docs.where($"doc_id" === 1L), "doc_id", "text")
    val frames = Multimodal.sampleFrames(m, 4)
    assert(frames.count() == 4)
    val idx = frames.select("frame_idx").as[Int].collect().sorted
    assert(idx.sameElements(Array(0, 1, 2, 3)))
    assert(frames.where(col("frame_n_bytes") <= 0).count() == 0)
  }

  test("sampleFrames decoder seam: a registered VideoFrameDecoder class " +
      "replaces the byte-slice stub (same output schema, decoder-defined " +
      "frames), unsetting the conf restores the stub, and a bad class " +
      "name fails the CALL driver-side") {
    val m = Multimodal.attachPayload(docs.where($"doc_id" === 1L), "doc_id", "text")
    val stub = Multimodal.sampleFrames(m, 3)
    try {
      spark.conf.set(graft.llm.VideoFrameDecoder.confKey,
        classOf[FakeFrameDecoder].getName)
      val decoded = Multimodal.sampleFrames(m, 3)
      assert(decoded.schema == stub.schema,
        "both paths must produce the identical frame schema")
      val rows = decoded.select("frame_idx", "frame_bytes")
        .as[(Int, Array[Byte])].collect().sortBy(_._1)
      assert(rows.map(_._1).sameElements(Array(0, 1, 2)))
      // the fake decoder stamps [idx, payload.head] per frame — proof
      // the registered class ran, not the slicer
      val head = m.select("payload").as[Array[Byte]].head().head
      assert(rows.forall { case (i, b) =>
        b.sameElements(Array(i.toByte, head)) },
        "frames must come from the registered decoder")
      // a NULL payload reaches the decoder as an EMPTY payload (never
      // an executor NPE), and the exactly-n contract still holds
      val withNull = Seq((9L, null: Array[Byte])).toDF("id", "payload")
      val nullFrames = Multimodal.sampleFrames(withNull, 2)
        .select("frame_idx", "frame_bytes").as[(Int, Array[Byte])]
        .collect().sortBy(_._1)
      assert(nullFrames.map(_._1).sameElements(Array(0, 1)))
      assert(nullFrames.forall { case (i, b) =>
        b.sameElements(Array(i.toByte, 0.toByte)) },
        "the decoder must see an empty payload for a NULL column")
      // a decoder violating the exactly-n contract fails LOUDLY instead
      // of silently dropping the row (posexplode of [] emits nothing)
      spark.conf.set(graft.llm.VideoFrameDecoder.confKey,
        classOf[ShortFrameDecoder].getName)
      val e = intercept[Exception](Multimodal.sampleFrames(m, 3).count())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("exactly 3 frames")),
        s"want the exactly-n refusal, got: ${e.getMessage}")
      // bad class name: loud at the call, never mid-job
      spark.conf.set(graft.llm.VideoFrameDecoder.confKey, "no.such.Decoder")
      intercept[ClassNotFoundException](Multimodal.sampleFrames(m, 3))
    } finally spark.conf.unset(graft.llm.VideoFrameDecoder.confKey)
    // conf unset: the stub is back
    assert(Multimodal.sampleFrames(m, 3).select("frame_bytes")
      .as[Array[Byte]].collect().toSeq !=
      Seq(0, 1, 2).map(i => Array(i.toByte)))
    assert(Multimodal.sampleFrames(m, 3).count() == 3)
  }

  test("fftAnyN == naive DFT at smooth, prime, and degenerate lengths") {
    def naive(x: Array[Double]): (Array[Double], Array[Double]) = {
      val n = x.length
      val re = new Array[Double](n); val im = new Array[Double](n)
      for (k <- 0 until n; j <- 0 until n) {
        val th = 2.0 * math.Pi * j * k / n
        re(k) += x(j) * math.cos(th)
        im(k) -= x(j) * math.sin(th)
      }
      (re, im)
    }
    for (n <- Seq(1, 6, 17, 800)) { // 17 prime; 800 = 2^5 * 5^2
      val x = Array.tabulate(n)(j => math.sin(0.7 * j) + 0.3 * math.cos(2.1 * j))
      val cosT = Array.tabulate(n)(t => math.cos(2.0 * math.Pi * t / n))
      val sinT = Array.tabulate(n)(t => math.sin(2.0 * math.Pi * t / n))
      val (fr, fi) = graft.llm.Multimodal.fftAnyN(
        x.clone(), new Array[Double](n), cosT, sinT, 1)
      val (nr, ni) = naive(x)
      val err = (0 until n).map(k =>
        math.abs(fr(k) - nr(k)) + math.abs(fi(k) - ni(k))).max
      assert(err < 1e-8 * math.max(1, n), s"n=$n max coefficient error $err")
    }
  }
}

/** Test decoder for the sampleFrames seam: frame i = [i, payload(0)] —
  * distinguishable from any byte slice, deterministic per payload.
  */
class FakeFrameDecoder extends graft.llm.VideoFrameDecoder {
  override def sampleFrames(payload: Array[Byte], n: Int): Array[Array[Byte]] =
    Array.tabulate(n)(i => Array(i.toByte, payload.headOption.getOrElse(0.toByte)))
}

/** Contract violator for the exactly-n gate: returns n-1 frames. */
class ShortFrameDecoder extends graft.llm.VideoFrameDecoder {
  override def sampleFrames(payload: Array[Byte], n: Int): Array[Array[Byte]] =
    Array.tabulate(math.max(n - 1, 0))(i => Array(i.toByte))
}
