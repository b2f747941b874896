package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed partition-wise.
  *
  * The decode step is PLUGGABLE ([[MediaDecoder]]): [[ImageIODecoder]] is a
  * real PNG/JPEG/GIF/BMP codec (javax.imageio — in the JDK, zero extra
  * deps); [[StubDecoder]] remains the deterministic placeholder for media
  * the container has no codecs for (video/audio). The Spark-side plumbing —
  * schema, partition-preserving mapPartitions, one decoder instance per
  * partition, column pruning before the imperative boundary — is identical
  * for both.
  */
final case class MediaMeta(width: Int, height: Int, channels: Int, format: String)

trait MediaDecoder extends Serializable {
  /** Read metadata (for real codecs: from the header where possible). */
  def decodeMeta(payload: Array[Byte]): MediaMeta
  /** Fixed-dim feature vector from the decoded content. */
  def features(payload: Array[Byte], dim: Int): Array[Float]
  /** Downscale and re-encode. `bound` is format-specific: for images the
    * max edge length in pixels, for the stub a byte cap. */
  def resize(payload: Array[Byte], bound: Int): Array[Byte]
}

/** Deterministic placeholder decoder: derives fake dimensions/features from
  * the payload length so the full pipeline is verifiable end-to-end where
  * no real codec exists (video/audio in this container). */
object StubDecoder extends MediaDecoder {
  def decodeMeta(payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta((64L + n % 512L).toInt, (64L + (n * 7L) % 512L).toInt, 3, "stub")
  }
  def features(payload: Array[Byte], dim: Int): Array[Float] = {
    val n = payload.length.toLong
    Array.tabulate(dim)(j => ((n * (j + 1)) % 97L).toFloat / 97.0f)
  }
  def resize(payload: Array[Byte], bound: Int): Array[Byte] =
    payload.take(bound)
}

/** Real image codec on javax.imageio (PNG/JPEG/GIF/BMP — whatever the JDK
  * registry carries). Metadata reads the header via an ImageReader without
  * decoding the raster; features/resize decode fully. */
object ImageIODecoder extends MediaDecoder {

  private def withReader[A](payload: Array[Byte])(
      f: javax.imageio.ImageReader => A): A = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException("no ImageIO codec recognizes payload")
      val r = readers.next()
      r.setInput(iis)
      try f(r) finally r.dispose()
    } finally iis.close()
  }

  def decodeMeta(payload: Array[Byte]): MediaMeta = withReader(payload) { r =>
    val w = r.getWidth(0); val h = r.getHeight(0)
    val fmt = r.getFormatName.toLowerCase
    // prefer header-level sources for the band count: raw type, then
    // the first legal destination type — the former r.read(0) fallback
    // decoded the ENTIRE raster just to count bands, defeating resize's
    // header-only no-op check and double-decoding on the scale path
    // (r19 hunt; full decode kept only as the last resort)
    val channels = Option(r.getRawImageType(0))
      .map(_.getNumComponents)
      .orElse {
        val it = r.getImageTypes(0)
        if (it != null && it.hasNext) Some(it.next().getNumComponents)
        else None
      }
      .getOrElse(r.read(0).getRaster.getNumBands)
    MediaMeta(w, h, channels, fmt)
  }

  private def readImage(payload: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null)
      throw new IllegalArgumentException("no ImageIO codec recognizes payload")
    img
  }

  /** Per-band mean pixel value scaled to [0,1]; component j samples band
    * (j mod bands) — a deterministic, codec-exact baseline embedder. */
  def features(payload: Array[Byte], dim: Int): Array[Float] = {
    val img = readImage(payload)
    val raster = img.getRaster
    val bands = raster.getNumBands
    val sums = new Array[Double](bands)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        var b = 0
        while (b < bands) { sums(b) += raster.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    val n = img.getWidth.toLong * img.getHeight
    // normalize by each band's true sample range — the former /255
    // pushed 16-bit sources to ~257x outside the documented [0,1]
    // contract (r19 hunt)
    val maxVal = Array.tabulate(bands)(b =>
      math.pow(2, raster.getSampleModel.getSampleSize(b)) - 1.0)
    Array.tabulate(dim)(j => (sums(j % bands) / n / maxVal(j % bands)).toFloat)
  }

  /** Proportional downscale so max(w, h) <= bound (no-op when already
    * within), re-encoded as PNG (lossless, deterministic). The no-op path
    * reads only the header (r17 review: the full raster was decoded just
    * to compare dimensions), and the output preserves the source's alpha
    * (r17 review: forcing TYPE_INT_RGB composited transparency onto black
    * and silently changed channels=4 sources to 3 — a semantic change,
    * not a downscale). */
  def resize(payload: Array[Byte], bound: Int): Array[Byte] = {
    val m = decodeMeta(payload) // header-only
    if (math.max(m.width, m.height) <= bound) return payload
    val img = readImage(payload)
    val (w, h) = (img.getWidth, img.getHeight)
    val scale = bound.toDouble / math.max(w, h)
    val nw = math.max(1, math.round(w * scale).toInt)
    val nh = math.max(1, math.round(h * scale).toInt)
    // derive the output type from the SOURCE color model: alpha is
    // preserved (r17) and a grayscale source stays 1-channel gray —
    // forcing TYPE_INT_RGB silently changed channels 1 -> 3, the same
    // semantic-change class the r17 alpha fix documents (r19 hunt)
    val outType =
      if (img.getColorModel.hasAlpha) BufferedImage.TYPE_INT_ARGB
      else if (img.getColorModel.getColorSpace.getType ==
          java.awt.color.ColorSpace.TYPE_GRAY) BufferedImage.TYPE_BYTE_GRAY
      else BufferedImage.TYPE_INT_RGB
    val out = new BufferedImage(nw, nh, outType)
    val g = out.createGraphics()
    try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }
}

/** Real WAV (RIFF/PCM) audio codec on javax.sound.sampled — in the JDK,
  * zero extra deps. The image-shaped [[MediaMeta]] is reinterpreted for
  * audio: width = sample rate in Hz, height = frame count,
  * channels = channels, format = "wav". Video remains on [[StubDecoder]]
  * (no container codec available). */
object WavDecoder extends MediaDecoder {
  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

  def decodeMeta(payload: Array[Byte]): MediaMeta = {
    val ff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payload))
    val f = ff.getFormat
    MediaMeta(f.getSampleRate.toInt, ff.getFrameLength, f.getChannels, "wav")
  }

  /** Per-segment RMS energy over 16-bit PCM samples (all channels pooled),
    * normalized to [0,1] by 1/32768 — the classic fixed-dim audio energy
    * profile. Segments with no frames yield 0. */
  def features(payload: Array[Byte], dim: Int): Array[Float] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val f = ais.getFormat
      require(f.getSampleSizeInBits == 16, "16-bit PCM expected")
      val bytes = ais.readAllBytes()
      val nSamples = bytes.length / 2
      val le = !f.isBigEndian
      val sumSq = new Array[Double](dim)
      val cnt = new Array[Long](dim)
      var i = 0
      while (i < nSamples) {
        val lo = bytes(2 * i) & 0xFF; val hi = bytes(2 * i + 1) & 0xFF
        val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toDouble
        val seg = math.min(dim - 1, (i.toLong * dim / math.max(nSamples, 1)).toInt)
        sumSq(seg) += s * s; cnt(seg) += 1
        i += 1
      }
      Array.tabulate(dim)(j =>
        if (cnt(j) == 0) 0f
        else (math.sqrt(sumSq(j) / cnt(j)) / 32768.0).toFloat)
    } finally ais.close()
  }

  /** Clip to the first `bound` frames and re-encode as WAV (no-op when the
    * clip is already within the bound) — the audio analog of an image
    * downscale. */
  def resize(payload: Array[Byte], bound: Int): Array[Byte] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val f = ais.getFormat
      val total = ais.getFrameLength
      if (total <= bound) return payload
      val frameSize = f.getFrameSize
      val buf = ais.readNBytes(bound * frameSize)
      val clipped = new AudioInputStream(
        new ByteArrayInputStream(buf), f, buf.length / frameSize)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(clipped, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    } finally ais.close()
  }
}

object Multimodal {

  private def q(n: String): org.apache.spark.sql.Column =
    col("`" + n.replace("`", "``") + "`")

  /** Metadata emitted per decoded payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Attach a binary payload column derived from a string column (for
    * pipelines whose media arrive embedded as encoded text/bytes). */
  def withBinaryPayload(df: DataFrame, srcCol: String, payloadCol: String): DataFrame =
    df.withColumn(payloadCol, encode(col(srcCol), "UTF-8"))

  /** Deterministic synthetic PNG fixtures keyed on an id column: a
    * (8+id%32) × (8+3·id%32) RGB image uniformly filled with
    * (id%256, 7·id%256, 13·id%256) — real encoded PNGs whose decoded
    * properties are closed-form in the id, so a SQL oracle can pin the
    * whole codec round trip. Encoding happens partition-wise in the scan. */
  def syntheticPngs(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(q(idCol).cast("long").as("id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // floorMod, not % (r17 review: Scala % preserves sign, so a
          // negative id produced width 0/negative — BufferedImage throws
          // — and negative color components; floorMod equals % on the
          // non-negative ids the closed-form oracles pin)
          val w = (8 + java.lang.Math.floorMod(id, 32L)).toInt
          val h = (8 + java.lang.Math.floorMod(id * 3, 32L)).toInt
          val rgb = ((java.lang.Math.floorMod(id, 256L) << 16) |
            (java.lang.Math.floorMod(id * 7, 256L) << 8) |
            java.lang.Math.floorMod(id * 13, 256L)).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray)
        }
      }(enc)
  }

  /** Deterministic synthetic WAV fixtures keyed on an id column: mono
    * 16-bit 8 kHz PCM, 800 + 3·id mod 160 frames, every sample the constant
    * id·37 mod 1000 + 100 — real encoded WAVs whose decoded properties
    * (frame count, and RMS = amp/32768 exactly, amp² being a perfect
    * square) are closed-form in the id, so a SQL oracle can pin the whole
    * codec round trip. */
  def syntheticWavs(df: DataFrame, idCol: String): DataFrame = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(q(idCol).cast("long").as("id"))
      .mapPartitions { rows =>
        val fmt = new AudioFormat(8000f, 16, 1, true, false) // signed PCM LE
        rows.map { r =>
          val id = r.getLong(0)
          // floorMod for negative-id safety (r17 review: a negative amp
          // diverges from the closed-form RMS = amp/32768 the oracle
          // pins — decoded RMS is |amp|); identical on non-negative ids
          val n = (800 + java.lang.Math.floorMod(id * 3, 160L)).toInt
          val amp = (java.lang.Math.floorMod(id * 37, 1000L) + 100).toInt
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            data(2 * i) = (amp & 0xFF).toByte
            data(2 * i + 1) = ((amp >> 8) & 0xFF).toByte
            i += 1
          }
          val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
          val bos = new ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          Row(id, bos.toByteArray)
        }
      }(enc)
  }

  /** Decode payloads partition-wise: one decoder instance per partition
    * (the mapPartitions boundary is where a real codec is opened once and
    * reused), emitting the original row + metadata struct. Column pruning
    * still applies upstream because only (id, payload) are selected before
    * the imperative boundary.
    */
  def extractMeta(df: DataFrame, idCol: String, payloadCol: String,
                  decoder: MediaDecoder = StubDecoder): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false)) ++ metaSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(q(idCol).cast("long").as("id"), q(payloadCol).as("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (id, payload) = idAndPayload(r, "extractMeta")
          val m = decoder.decodeMeta(payload)
          Row(id, payload.length.toLong, m.width, m.height, m.channels, m.format)
        }
      }(enc)
  }

  /** Fail-fast null guard at the imperative boundary (r17 review: a null
    * payload or id NPE'd deep inside mapPartitions with an opaque
    * executor stack trace — the contract violation should name itself). */
  private def idAndPayload(r: Row, what: String): (Long, Array[Byte]) = {
    require(!r.isNullAt(0),
      s"Multimodal.$what: null id — filter nulls upstream")
    val id = r.getLong(0)
    val payload = r.getAs[Array[Byte]](1)
    require(payload != null,
      s"Multimodal.$what: null payload for id=$id — filter nulls upstream")
    (id, payload)
  }

  /** Feature extraction partition-wise (the shape an image/audio embedder
    * takes): one model instance per partition, payload → fixed-dim vector.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      dim: Int, decoder: MediaDecoder = StubDecoder): DataFrame = {
    // r19 hunt: dim = 0 reached WavDecoder.features' sumSq(-1) as an
    // opaque executor ArrayIndexOutOfBoundsException — same failure
    // class as sampleFrameIndices' r17 frames guard
    require(dim >= 1, s"extractFeatures: dim >= 1, got $dim")
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(q(idCol).cast("long").as("id"), q(payloadCol).as("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (id, payload) = idAndPayload(r, "extractFeatures")
          Row(id, decoder.features(payload, dim).toSeq)
        }
      }(enc)
  }

  /** Resize partition-wise (images: proportional downscale + re-encode;
    * stub: byte cap). Output keeps the payload column so resize chains with
    * extractMeta/extractFeatures. */
  def resizePayload(df: DataFrame, idCol: String, payloadCol: String,
                    bound: Int, decoder: MediaDecoder = StubDecoder): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)) ++ metaSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.select(q(idCol).cast("long").as("id"), q(payloadCol).as("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (id, payload) = idAndPayload(r, "resizePayload")
          val resized = decoder.resize(payload, bound)
          val m = decoder.decodeMeta(resized)
          Row(id, resized, resized.length.toLong,
            m.width, m.height, m.channels, m.format)
        }
      }(enc)
  }

  /** Deterministic frame sampling plan for (fake) video payloads: emit
    * `frames` evenly spaced frame indices per row — the explode pattern a
    * real frame extractor would follow (explode THEN decode keeps the heavy
    * work distributed and lets AQE rebalance skewed payloads). */
  def sampleFrameIndices(df: DataFrame, idCol: String, payloadCol: String,
                         frames: Int): DataFrame = {
    // r17 review: frames = 0 silently emitted a DESCENDING two-element
    // sequence per row and divided by zero — garbage offsets, or an ANSI
    // cast error far from the cause
    require(frames >= 1, s"sampleFrameIndices: frames >= 1, got $frames")
    // fail-fast null guard in the PLAN (r19 hunt: every other Multimodal
    // op rejects null id/payload by name at the imperative boundary, but
    // this declarative op silently fabricated `frames` offset-0 rows per
    // null payload — raise_error keeps the fail-fast contract codegen'd)
    val rawId = q(idCol); val rawPayload = q(payloadCol)
    val id = when(rawId.isNull, raise_error(lit(
        "Multimodal.sampleFrameIndices: null id — filter nulls upstream"))
        .cast("long"))
      .otherwise(rawId.cast("long"))
    val total = when(rawPayload.isNull, raise_error(lit(
        "Multimodal.sampleFrameIndices: null payload — filter nulls upstream"))
        .cast("long"))
      .otherwise(octet_length(rawPayload).cast("long"))
    df.select(id.as("id"),
        explode(transform(sequence(lit(0), lit(frames - 1)),
          i => floor((i * greatest(total, lit(1L))) / frames).cast("long"))).as("frame_offset"))
  }
}
