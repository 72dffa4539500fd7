package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.4): image/audio/video as
  * opaque BINARY payloads with typed metadata, plus decode / feature-
  * extract / frame-sample stages.
  *
  * Two tiers:
  *
  *   - REAL decode for the codecs the JDK itself ships: PNG/BMP/GIF/
  *     JPEG/TIFF via `javax.imageio.ImageIO` and PCM WAV via
  *     `javax.sound.sampled` — no external libraries, works headless.
  *     [[decodeImageFeatures]], [[resizePng]], [[decodeWavFeatures]]
  *     below run these per partition on executors (constant memory,
  *     zero driver work) and are oracle-checked end-to-end (q65/q6A:
  *     synthesize → encode → decode → features must match a closed-form
  *     SQL oracle; JPEG is spec-checked since it is lossy).
  *   - STUB kernel only for video/ffmpeg, which no JVM-bundled codec
  *     covers: [[decodeFeaturesStub]] keeps the batch shape real
  *     (schema, partitioning, iterator contract) with a clearly-marked
  *     deterministic fake where ffmpeg would be called.
  */
object Multimodal {

  final case class MediaRow(id: Long, payload: Array[Byte], mime: String,
                            width: Int, height: Int)
  final case class MediaFeatures(id: Long, n_bytes: Int, checksum: Long,
                                 features: Array[Double])

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
    * derives a deterministic `dim`-double feature vector from byte
    * content (integer byte sums + one double division — no float32
    * accumulation, so the DuckDB oracle mirrors it bit-for-bit). Runs
    * as `mapPartitions` — batch-at-a-time, partition-parallel, zero
    * driver involvement (the shape that matters at scale).
    */
  def decodeFeaturesStub(ds: Dataset[MediaRow], dim: Int = 8)
                        (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val bytes = m.payload
        val checksum = bytes.foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 1000000007L)
        // STUB: stand-in for the decoded-content feature extractor —
        // feature i = (sum of bytes at positions ≡ i mod dim) / n_bytes.
        val sums = new Array[Long](dim)
        var j = 0
        while (j < bytes.length) { sums(j % dim) += bytes(j) & 0xff; j += 1 }
        val feats = Array.tabulate(dim) { i =>
          if (bytes.isEmpty) 0.0 else sums(i).toDouble / bytes.length
        }
        MediaFeatures(m.id, bytes.length, checksum, feats)
      }
    }
  }

  // ---------------------------------------------------------------- //
  // Real JDK codecs: PNG/BMP via ImageIO, PCM WAV via javax.sound     //
  // ---------------------------------------------------------------- //

  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                                 n_pixels: Long, mean_r: Double,
                                 mean_g: Double, mean_b: Double)

  final case class WavFeatures(doc_id: Long, n_samples: Long, rms: Double,
                               peak: Double, zero_crossings: Long)

  // ImageIO's default scratch cache writes temp FILES per encode/decode;
  // executors must stay on-heap.
  javax.imageio.ImageIO.setUseCache(false)

  /** Encode an RGB image as real PNG bytes (JDK encoder). */
  def pngBytes(width: Int, height: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgbAt(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic PNG for `id`: solid color, size derived
    * from the id — gives q65 a closed-form oracle while the Spark side
    * exercises the REAL encode+decode path.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 16).toInt
    val h = 16 + (id % 8).toInt
    val rgb = (((id * 31) % 256).toInt << 16) |
      (((id * 17) % 256).toInt << 8) | ((id * 7) % 256).toInt
    pngBytes(w, h, (_, _) => rgb)
  }

  val syntheticPngUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long) => syntheticPng(id) }

  /** REAL image decode + feature extraction: `ImageIO.read` per row
    * (PNG/BMP/GIF — the JDK's own readers), then width/height/channel
    * means in one pixel pass. `mapPartitions`, executor-side only.
    * The id column keeps the caller's name.
    */
  def decodeImageFeatures(df: DataFrame, idCol: String, payloadCol: String)
                         (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image payload for id=$id")
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImageFeatures(id, w, h, n, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }

  /** REAL image resize: decode, scale to (outW, outH) with Graphics2D
    * bilinear interpolation, re-encode as PNG. Payload-in/payload-out so
    * stages compose (decode → resize → decode …).
    */
  def resizePng(df: DataFrame, idCol: String, payloadCol: String,
                outW: Int, outH: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image payload for id=$id")
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, outW, outH, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, payloadCol)
  }

  /** Mono 16-bit little-endian PCM WAV bytes at `sampleRate` (JDK
    * encoder — `AudioSystem.write`).
    */
  def wavBytes(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(i * 2) = (samples(i) & 0xff).toByte
      raw(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic WAV for `id`: an 800-sample square wave
    * whose half-period and amplitude are closed-form in the id (every
    * half-period divides 800, amplitudes stay exact in double), so q6A
    * can oracle-check a REAL encode+decode round trip: RMS == peak ==
    * a/32768 exactly, crossings == 800/h − 1.
    */
  val WavHalfPeriods: Array[Int] = Array(2, 4, 5, 8, 10, 16, 20, 25)

  def syntheticWav(id: Long): Array[Byte] = {
    val h = WavHalfPeriods((id % 8).toInt)
    val a = (1000 * (1 + id % 7)).toInt
    wavBytes(Array.tabulate(800)(i => (if ((i / h) % 2 == 0) a else -a).toShort))
  }

  val syntheticWavUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long) => syntheticWav(id) }

  /** REAL WAV decode + audio features: `AudioSystem.getAudioInputStream`
    * parses the RIFF header and yields PCM frames; one pass computes
    * RMS, peak (both normalized to [0,1] full scale) and zero crossings.
    * The id column keeps the caller's name.
    */
  def decodeWavFeatures(df: DataFrame, idCol: String, payloadCol: String)
                       (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"decodeWavFeatures expects mono 16-bit PCM, got $fmt")
          val raw = ais.readAllBytes()
          val bigEndian = fmt.isBigEndian
          val n = raw.length / 2
          var (sumSq, peak, crossings) = (0.0, 0.0, 0L)
          var prevSign = 0
          var i = 0
          while (i < n) {
            val lo = raw(2 * i) & 0xff
            val hi = raw(2 * i + 1) & 0xff
            val s = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort
            val v = s / 32768.0
            sumSq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            val sign = java.lang.Integer.signum(s)
            if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
            if (sign != 0) prevSign = sign
            i += 1
          }
          WavFeatures(id, n, if (n == 0) 0.0 else math.sqrt(sumSq / n), peak, crossings)
        }
      }
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }

  /** Deterministic textured PNG: block-aligned pseudo-random texture
    * keyed by `pattern` (4×4-pixel solid blocks whose colors are a hash
    * of (pattern, block)), so each pattern's block-mean aHash is
    * effectively a random 64-bit value — distinct patterns collide with
    * probability ~2⁻⁶⁴ (a plain gradient family would not: aHash is
    * invariant to uniform luminance offsets, so offset-shifted gradients
    * alias). With `perturb`, one pixel's blue channel shifts by +1 — the
    * payload BYTES change but the perceptual hash must not (the
    * image-near-dup planting device for q7B).
    */
  def syntheticTexturedPng(pattern: Long, perturb: Boolean): Array[Byte] =
    pngBytes(32, 32, (x, y) => {
      val seed = pattern * 1000003L + (x >> 2) * 8191L + (y >> 2) * 131L
      val mixed = (seed ^ (seed >>> 13)) * 2654435761L
      val r = ((mixed >>> 8) & 0xff).toInt
      val g = ((mixed >>> 16) & 0xff).toInt
      var b = ((mixed >>> 24) & 0xff).toInt
      if (perturb && x == 5 && y == 7) b = math.min(b + 1, 255)
      (r << 16) | (g << 8) | b
    })

  /** perturb is keyed to (id / 30) % 2 — DECOUPLED from the pattern
    * (id % 30): 30 is even, so `id % 2` would be constant within every
    * pattern class and no pattern would ever carry both a perturbed and
    * an unperturbed payload, making the byte-distinct-same-phash
    * property vacuous. With the quotient key, consecutive id blocks of
    * the same pattern alternate the perturbation, so every pattern class
    * (given ≥ 31 docs) contains genuinely byte-distinct near-duplicates
    * that must hash equal.
    */
  val syntheticTexturedPngUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long) => syntheticTexturedPng(id % 30, (id / 30) % 2 == 1) }

  final case class PHashRow(doc_id: Long, width: Int, height: Int, phash: Long)

  /** REAL image perceptual hash (block-mean aHash): decode, reduce to a
    * `grid`×`grid` block-mean luminance thumbnail (ITU-R 601 gray in
    * double), emit one bit per block — 1 iff the block mean strictly
    * exceeds the mean of all block means — packed into a LONG. Byte-
    * level changes that don't move block luminance (recompression,
    * single-pixel noise) keep the hash; different content flips bits.
    * Near-dup detection is then hash equality (or banded Hamming, as
    * SimHash) — the image twin of document fingerprinting.
    * `mapPartitions`, executor-side, one decode + one pixel pass per row.
    */
  def imagePerceptualHash(df: DataFrame, idCol: String, payloadCol: String,
                          grid: Int = 8)
                         (implicit spark: SparkSession): DataFrame = {
    require(grid >= 2 && grid * grid <= 64, "grid^2 bits must pack into a LONG")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image payload for id=$id")
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = Array.ofDim[Double](grid * grid)
          val counts = new Array[Long](grid * grid)
          var y = 0
          while (y < h) {
            val by = y * grid / h
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val gray = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
                0.114 * (p & 0xff)
              val bi = by * grid + x * grid / w
              sums(bi) += gray; counts(bi) += 1
              x += 1
            }
            y += 1
          }
          var mean = 0.0
          var i = 0
          while (i < grid * grid) {
            sums(i) = if (counts(i) == 0) 0.0 else sums(i) / counts(i)
            mean += sums(i)
            i += 1
          }
          mean /= (grid * grid)
          var hash = 0L
          i = 0
          while (i < grid * grid) {
            if (sums(i) > mean) hash |= (1L << i)
            i += 1
          }
          PHashRow(id, w, h, hash)
        }
      }
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }

  final case class SpectralFeatures(doc_id: Long, n_samples: Long,
                                    dominant_bin: Long)

  private[graft] def smallestPrimeFactor(n: Int): Int = {
    if (n % 2 == 0) return 2
    var p = 3
    while (p.toLong * p <= n) {
      if (n % p == 0) return p
      p += 2
    }
    n
  }

  /** Forward mixed-radix Cooley-Tukey FFT (X[k] = Σ x[j]·e^{-2πi jk/n})
    * for ANY length: n splits on its smallest prime factor per level,
    * so a smooth length (800 = 2⁵·5², the common audio frame case)
    * runs O(n · Σ prime factors) while a prime length degrades
    * gracefully to that level's naive O(n²) — never worse than the
    * table DFT this replaced. All twiddles index the ONE root-length
    * cos/sin table via stride = rootN / n (e^{-2πi t/n} =
    * e^{-2πi (t·stride)/rootN}), so no per-level trig.
    */
  private[graft] def fftAnyN(re: Array[Double], im: Array[Double],
                      cosT: Array[Double], sinT: Array[Double],
                      stride: Int): (Array[Double], Array[Double]) = {
    val n = re.length
    if (n == 1) return (re, im)
    val p = smallestPrimeFactor(n)
    val or = new Array[Double](n)
    val oi = new Array[Double](n)
    if (p == n) {
      // prime length: naive DFT at this level
      var k = 0
      while (k < n) {
        var sr = 0.0; var si = 0.0
        var j = 0; var t = 0
        while (j < n) {
          val c = cosT(t * stride); val s = sinT(t * stride)
          sr += re(j) * c + im(j) * s
          si += im(j) * c - re(j) * s
          t += k; if (t >= n) t -= n
          j += 1
        }
        or(k) = sr; oi(k) = si
        k += 1
      }
    } else {
      val m = n / p
      val subStride = stride * p
      val subRe = new Array[Array[Double]](p)
      val subIm = new Array[Array[Double]](p)
      var r = 0
      while (r < p) {
        val sr = new Array[Double](m); val si = new Array[Double](m)
        var j = 0
        while (j < m) { sr(j) = re(j * p + r); si(j) = im(j * p + r); j += 1 }
        val (fr, fi) = fftAnyN(sr, si, cosT, sinT, subStride)
        subRe(r) = fr; subIm(r) = fi
        r += 1
      }
      // X[k] = Σ_r e^{-2πi rk/n} · Y_r[k mod m]
      var k = 0
      while (k < n) {
        val k2 = k % m
        var sr = 0.0; var si = 0.0
        var rr = 0; var t = 0
        while (rr < p) {
          val c = cosT(t * stride); val s = sinT(t * stride)
          val yr = subRe(rr)(k2); val yi = subIm(rr)(k2)
          sr += yr * c + yi * s
          si += yi * c - yr * s
          t += k; if (t >= n) t -= n
          rr += 1
        }
        or(k) = sr; oi(k) = si
        k += 1
      }
    }
    (or, oi)
  }

  /** REAL audio frequency analysis: decode PCM (as
    * [[decodeWavFeatures]]), then a full-length transform over the
    * clip and the dominant frequency bin (argmax magnitude over bins
    * 1..N/2, ties to the lowest bin). The spectrum comes from
    * [[fftAnyN]] — mixed-radix Cooley-Tukey over a precomputed
    * N-point cos/sin table, O(N·Σ prime factors) per clip instead of
    * the naive table DFT's O(N²/2) (a ~20× kernel cut at the 800-
    * sample fixture; prime lengths fall back per level, never worse
    * than the DFT) — executor-side, partition-parallel.
    *
    * For q7A's synthetic square waves the period divides N, so the
    * spectrum is exactly line-structured and the dominant bin is the
    * fundamental N/(2·halfPeriod) — a closed-form oracle for a real
    * encode→decode→analyze round trip.
    */
  def wavDominantFrequency(df: DataFrame, idCol: String, payloadCol: String)
                          (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // cos/sin tables keyed by clip length, shared across the partition
        val tables = scala.collection.mutable.HashMap.empty[Int, (Array[Double], Array[Double])]
        it.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"wavDominantFrequency expects mono 16-bit PCM, got $fmt")
          val raw = ais.readAllBytes()
          val bigEndian = fmt.isBigEndian
          val n = raw.length / 2
          val s = new Array[Double](n)
          var i = 0
          while (i < n) {
            val lo = raw(2 * i) & 0xff
            val hi = raw(2 * i + 1) & 0xff
            s(i) = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort / 32768.0
            i += 1
          }
          val (cosT, sinT) = tables.getOrElseUpdate(n, {
            val c = new Array[Double](n); val sn = new Array[Double](n)
            var j = 0
            while (j < n) {
              c(j) = math.cos(2.0 * math.Pi * j / n)
              sn(j) = math.sin(2.0 * math.Pi * j / n)
              j += 1
            }
            (c, sn)
          })
          val (fr, fi) = fftAnyN(s, new Array[Double](n), cosT, sinT, 1)
          var bestBin = 0L; var bestMag = -1.0
          var m = 1
          while (m <= n / 2) {
            val mag = fr(m) * fr(m) + fi(m) * fi(m)
            if (mag > bestMag + 1e-9) { bestMag = mag; bestBin = m.toLong }
            m += 1
          }
          SpectralFeatures(id, n.toLong, bestBin)
        }
      }
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }

  /** Frame sampling with a PLUGGABLE decoder seam (round 19, the
    * [[graft.store.ServerSideCopy]] pattern applied to the one
    * documented multimodal stub): no JVM-bundled video codec exists, so
    * the DEFAULT remains the byte-slice stub — split the payload into
    * `n` equal slices ("frames"); the plumbing (one row per frame,
    * metadata carried, explode shape) is the real part. A deployment
    * WITH a codec on the classpath registers one per session:
    *
    * {{{ spark.conf.set("graft.multimodal.videoDecoder", "my.FfmpegFrames") }}}
    *
    * The named class ([[VideoFrameDecoder]], zero-arg-constructible) is
    * resolved reflectively ON EXECUTORS per JVM — only the class NAME
    * rides the closure, so the decoder itself needs no serialization.
    * Output schema is identical on both paths; a bad class name fails
    * the CALL driver-side, never half-way into a job.
    */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"sampleFrames needs n > 0, got $n")
    df.sparkSession.conf.getOption(VideoFrameDecoder.confKey)
      .filter(_.nonEmpty) match {
      case Some(cls) =>
        VideoFrameDecoder.forName(cls) // fail fast on a bad registration
        val decode = udf((payload: Array[Byte]) => {
          // a NULL payload column reaches the UDF as null — hand the
          // decoder an empty payload instead of an executor NPE, and
          // enforce the exactly-n contract so a misbehaving decoder
          // fails loudly rather than silently dropping the row's id
          // (posexplode of an empty array emits nothing)
          val frames = VideoFrameDecoder.forName(cls).sampleFrames(
            if (payload == null) Array.emptyByteArray else payload, n)
          require(frames != null && frames.length == n,
            s"video decoder $cls must return exactly $n frames, got " +
              s"${if (frames == null) "null" else frames.length.toString}")
          frames
        })
        df.select(col("id"), posexplode(decode(col("payload")))
            .as(Seq("frame_idx", "frame_bytes")))
          .select(col("id"), col("frame_idx"), col("frame_bytes"),
            octet_length(col("frame_bytes")).as("frame_n_bytes"))
      case None =>
        df.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
          .withColumn("frame_bytes",
            substring(col("payload"),
              (col("frame_idx") * (octet_length(col("payload")) / n) + 1).cast("int"),
              greatest((octet_length(col("payload")) / n).cast("int"), lit(1))))
          .select(col("id"), col("frame_idx"), col("frame_bytes"),
            octet_length(col("frame_bytes")).as("frame_n_bytes"))
    }
  }
}

/** The video-decode seam: `sampleFrames(payload, n)` returns the `n`
  * sampled frames (re-encoded bytes; deterministic per payload) of one
  * video payload. Implementations wrap a real codec (ffmpeg/JavaCV) and
  * must be zero-arg-constructible — executors instantiate them
  * reflectively from the class name in the session conf
  * (`graft.multimodal.videoDecoder`), one instance per JVM, so the
  * codec handle itself never serializes.
  */
trait VideoFrameDecoder extends Serializable {
  def sampleFrames(payload: Array[Byte], n: Int): Array[Array[Byte]]
}

object VideoFrameDecoder {
  /** Session-conf key naming the implementation class. */
  val confKey = "graft.multimodal.videoDecoder"

  private val cache =
    scala.collection.concurrent.TrieMap[String, VideoFrameDecoder]()

  private[graft] def forName(cls: String): VideoFrameDecoder =
    cache.getOrElseUpdate(cls,
      Class.forName(cls).getDeclaredConstructor().newInstance()
        .asInstanceOf[VideoFrameDecoder])
}
