package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel
  * decode via `mapPartitions`, explode for frame sampling — is real and
  * tested. Three codecs behind the [[MediaCodec]] seam: [[ImageIoCodec]]
  * really decodes/resizes images on the in-JDK `javax.imageio` stack
  * (png/jpeg/gif/bmp) — including TEMPORAL frame sampling from animated
  * GIFs — [[WavCodec]] really decodes PCM audio on `javax.sound.sampled`,
  * and [[StubCodec]] derives deterministic features straight from the
  * bytes — the oracle rows use the stub (its arithmetic is replayable in
  * DuckDB), the media specs use the real codecs.
  *
  * GENERAL VIDEO (mp4/webm) IS PERMANENTLY WAIVED IN THIS SANDBOX
  * (SURVEY.md §7.3): every JVM mp4 route needs a native decoder
  * (javacv/ffmpeg bindings or the ffmpeg CLI); none ships in
  * `/opt/spark/jars`, there is no `ffmpeg` binary on the host, and the
  * build is pinned to zero new dependencies with zero egress. The seam
  * is the waiver's other half: a javacv-backed [[MediaCodec]] is a
  * deploy-time jar swap — `features`/`sampleFrames`/`resize`/`phash64`
  * are the complete decoder surface, and the TEMPORAL path (evenly
  * spaced frame sampling → per-frame features → explode) is already
  * exercised end-to-end on animated GIF, which the in-JDK imageio stack
  * can decode.
  */
object Multimodal {

  /** Typed metadata carried alongside every media blob. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // jpeg | png | wav | mp4 | ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", metaSchema)))

  /** Decoder contract. Implementations must be deterministic per byte
    * array (idempotent retries on task failure).
    */
  trait MediaCodec extends Serializable {
    /** bytes → fixed-length feature vector. */
    def features(bytes: Array[Byte], dim: Int): Array[Double]
    /** bytes → n evenly-spaced "frames" (each an opaque byte window). */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
    /** "resize": deterministic re-encoding of the payload. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    /** bytes → 64-bit perceptual fingerprint (dHash family): near-equal
      * CONTENT → near-equal hash in Hamming distance, so re-encodes and
      * small edits land within a few bits while the raw payload bytes
      * differ completely. The cross-modality contract [[phashPairs]]
      * blocks on.
      */
    def phash64(bytes: Array[Byte]): Long
  }

  /** STUB codec — no real media libraries in this container. Features are
    * a byte-value histogram (deterministic, locality-ish: equal payloads →
    * equal features); frames are evenly-spaced byte windows; resize
    * truncates proportionally. Swap for a real codec in production.
    */
  object StubCodec extends MediaCodec {
    def features(bytes: Array[Byte], dim: Int): Array[Double] = {
      val hist = new Array[Double](dim)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1.0; i += 1 }
      if (bytes.length > 0) { var j = 0; while (j < dim) { hist(j) /= bytes.length; j += 1 } }
      hist
    }
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      if (bytes.isEmpty) Seq.empty
      else (0 until n).map { k =>
        val start = (bytes.length.toLong * k / n).toInt
        val end = (bytes.length.toLong * (k + 1) / n).toInt
        java.util.Arrays.copyOfRange(bytes, start, math.max(end, start + 1).min(bytes.length))
      }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, math.min(bytes.length, w * h))
      java.util.Arrays.copyOfRange(bytes, 0, target)
    }

    /** dHash over 65 byte windows: window k is bytes[⌊Lk/65⌋, ⌊L(k+1)/65⌋),
      * its "pixel" the integer MEAN byte value (exact long division; empty
      * window → 0), bit k set iff mean(k) > mean(k+1). All-integer → the
      * DuckDB oracle replays it exactly; same-bytes → same-hash, and a
      * localized edit only perturbs the one or two windows it touches.
      */
    def phash64(bytes: Array[Byte]): Long = {
      val m = new Array[Long](65)
      val L = bytes.length
      var k = 0
      while (k < 65) {
        val from = (L.toLong * k / 65).toInt
        val to = (L.toLong * (k + 1) / 65).toInt
        var s = 0L; var i = from
        while (i < to) { s += bytes(i) & 0xff; i += 1 }
        m(k) = if (to > from) s / (to - from) else 0L
        k += 1
      }
      var h = 0L; var j = 0
      while (j < 64) { if (m(j) > m(j + 1)) h |= 1L << j; j += 1 }
      h
    }
  }

  /** REAL image codec on the in-JDK `javax.imageio` stack — no external
    * dependencies, decodes the formats the JDK ships readers for (png,
    * jpeg, gif, bmp, wbmp). Deterministic by construction: resize is an
    * explicit nearest-neighbor pixel loop (not the Java2D rendering
    * pipeline, whose interpolation can vary by platform), features are an
    * integer-luminance histogram, frames are horizontal strips re-encoded
    * as PNG.
    *
    * Undecodable payloads (corrupt rows are a fact of life in a 100 TB
    * media crawl) FALL BACK to [[StubCodec]] on the same bytes instead of
    * failing the task — the pipeline keeps moving and equal payloads still
    * map to equal outputs. The oracle catalog rows stay on [[StubCodec]]
    * (their DuckDB twins replay its byte-window arithmetic); this codec is
    * exercised by `MultimodalSpec` on real encoded images.
    */
  object ImageIoCodec extends MediaCodec {
    private def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }

    private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Normalized luminance histogram (BT.601 integer weights — exact). */
    def features(bytes: Array[Byte], dim: Int): Array[Double] = decode(bytes) match {
      case Some(img) =>
        val hist = new Array[Double](dim)
        val (w, h) = (img.getWidth, img.getHeight)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            hist(lum * dim / 256) += 1.0
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        var j = 0
        while (j < dim) { hist(j) /= n; j += 1 }
        hist
      case None => StubCodec.features(bytes, dim)
    }

    /** (x, y) placement of a GIF delta frame from its ImageDescriptor;
      * (0, 0) for formats/readers without one.
      */
    private def frameOffset(reader: javax.imageio.ImageReader, i: Int): (Int, Int) =
      try {
        val tree = reader.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val kids = tree.getElementsByTagName("ImageDescriptor")
        if (kids.getLength == 0) (0, 0)
        else {
          val d = kids.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          (d.getAttribute("imageLeftPosition").toInt,
            d.getAttribute("imageTopPosition").toInt)
        }
      } catch { case _: Exception => (0, 0) }

    /** n evenly-spaced TEMPORAL frames from a multi-frame payload (animated
      * GIF on the stock JDK readers), or None for stills. Frame k snapshots
      * the animation at index `T·k/n`. GIF frames are often DELTAS — a
      * sub-rectangle at an offset — so frames composite progressively onto
      * a persistent canvas (disposal modes are not replayed; the
      * do-not-dispose accumulation is the common case and is deterministic:
      * integer-offset pixel copies, no interpolation).
      */
    private def decodeAnimation(bytes: Array[Byte], n: Int): Option[Seq[Array[Byte]]] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val total = reader.getNumImages(true)
          if (total <= 1) None
          else {
            val canvas = new java.awt.image.BufferedImage(
              reader.getWidth(0), reader.getHeight(0),
              java.awt.image.BufferedImage.TYPE_INT_ARGB)
            val g = canvas.createGraphics()
            val targets = (0 until n).map(k => total * k / n)
            val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
            var i = 0
            while (i < total && out.size < n) {
              val frame = reader.read(i)
              val (ox, oy) = frameOffset(reader, i)
              g.drawImage(frame, ox, oy, null)
              var snap: Array[Byte] = null // encode once even if k repeats
              targets.drop(out.size).takeWhile(_ == i).foreach { _ =>
                if (snap == null) snap = encodePng(canvas)
                out += snap
              }
              i += 1
            }
            g.dispose()
            Some(out.toSeq)
          }
        } finally reader.dispose()
      } catch { case _: Exception => None }

    /** n temporal frames for animated payloads ([[decodeAnimation]]);
      * stills fall back to n horizontal strips, each re-encoded as PNG.
      */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (n > 0) {
        val animated = decodeAnimation(bytes, n)
        if (animated.isDefined) return animated.get
      }
      decode(bytes) match {
        case Some(img) if img.getHeight >= n && n > 0 =>
          val h = img.getHeight
          (0 until n).map { k =>
            val top = h * k / n
            val bot = h * (k + 1) / n
            encodePng(img.getSubimage(0, top, img.getWidth, math.max(1, bot - top)))
          }
        case _ => StubCodec.sampleFrames(bytes, n)
      }
    }

    /** The standard image dHash: nearest-neighbor downsample to a 9×8
      * integer-luminance grid (same BT.601 weights as [[features]], same
      * explicit pixel loop — no Java2D interpolation variance), bit
      * y·8+x set iff lum(x,y) > lum(x+1,y). Pixel-identical images hash
      * identically regardless of container format (PNG vs BMP of the
      * same raster agree); small edits flip only the grid cells they
      * darken/brighten. Undecodable → [[StubCodec]] fallback, same
      * contract as every other method here.
      */
    def phash64(bytes: Array[Byte]): Long = decode(bytes) match {
      case Some(img) =>
        val (sw, sh) = (img.getWidth, img.getHeight)
        val lum = Array.ofDim[Int](8, 9)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            val rgb = img.getRGB(x * sw / 9, y * sh / 8)
            lum(y)(x) = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        var h = 0L
        var j = 0
        while (j < 64) {
          if (lum(j / 8)(j % 8) > lum(j / 8)(j % 8 + 1)) h |= 1L << j
          j += 1
        }
        h
      case None => StubCodec.phash64(bytes)
    }

    /** Nearest-neighbor resample to exactly w×h, re-encoded as PNG. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = decode(bytes) match {
      case Some(img) =>
        val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val (sw, sh) = (img.getWidth, img.getHeight)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out.setRGB(x, y, img.getRGB(x * sw / w, y * sh / h))
            x += 1
          }
          y += 1
        }
        encodePng(out)
      case None => StubCodec.resize(bytes, w, h)
    }
  }

  /** Real AUDIO codec on in-JDK `javax.sound.sampled` (WAV/AIFF/AU — no
    * external deps, same zero-dependency rule as [[ImageIoCodec]]).
    * Supports 16-bit signed PCM, mono or multi-channel (channels are
    * averaged to mono). Deterministic: sample extraction is exact integer
    * decoding; energies come from exact Long sums of squares.
    *
    *  - `features(bytes, dim)`: per-bucket RMS energy profile — the PCM
    *    stream split into `dim` equal segments, each `√(Σs²/n) / 32768`.
    *  - `sampleFrames(bytes, n)`: n equal-duration clips, each re-encoded
    *    as a standalone WAV.
    *  - `resize(bytes, w, _)`: a `w`-sample nearest-neighbor "thumbnail"
    *    (audio has one axis; `h` is ignored), re-encoded as WAV at the
    *    source sample rate.
    *
    * Undecodable / non-PCM16 payloads fall back to [[StubCodec]], same
    * contract as the image codec.
    */
  object WavCodec extends MediaCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** (16-bit mono samples, format) — channels averaged. */
    private def decode(bytes: Array[Byte]): Option[(Array[Int], AudioFormat)] =
      try {
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        val f = in.getFormat
        if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED || f.getSampleSizeInBits != 16) None
        else {
          val raw = in.readAllBytes()
          val ch = f.getChannels
          val frameBytes = 2 * ch
          val nFrames = raw.length / frameBytes
          val out = new Array[Int](nFrames)
          var i = 0
          while (i < nFrames) {
            var sum = 0; var c = 0
            while (c < ch) {
              val o = i * frameBytes + 2 * c
              val s = if (f.isBigEndian) (raw(o) << 8) | (raw(o + 1) & 0xff)
                      else (raw(o + 1) << 8) | (raw(o) & 0xff)
              sum += s; c += 1
            }
            out(i) = sum / ch
            i += 1
          }
          Some((out, f))
        }
      } catch { case _: Exception => None }

    private def encodeWav(samples: Array[Int], f: AudioFormat): Array[Byte] = {
      val mono = new AudioFormat(f.getSampleRate, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), mono, samples.length),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    def features(bytes: Array[Byte], dim: Int): Array[Double] = decode(bytes) match {
      case Some((s, _)) if s.length >= dim && dim > 0 =>
        (0 until dim).map { k =>
          val from = s.length * k / dim
          val to = s.length * (k + 1) / dim
          var acc = 0L; var i = from
          while (i < to) { acc += s(i).toLong * s(i); i += 1 }
          math.sqrt(acc.toDouble / (to - from)) / 32768.0
        }.toArray
      case _ => StubCodec.features(bytes, dim)
    }

    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = decode(bytes) match {
      case Some((s, f)) if s.length >= n && n > 0 =>
        (0 until n).map { k =>
          encodeWav(s.slice(s.length * k / n, s.length * (k + 1) / n), f)
        }
      case _ => StubCodec.sampleFrames(bytes, n)
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = decode(bytes) match {
      case Some((s, f)) if s.nonEmpty && w > 0 =>
        encodeWav(Array.tabulate(w)(i => s(i * s.length / w)), f)
      case _ => StubCodec.resize(bytes, w, h)
    }

    /** Audio dHash over the energy envelope: 65 equal-duration segments,
      * bit k set iff segment k's mean energy exceeds segment k+1's. The
      * comparison is the exact integer cross-multiply
      * `sq(k)·n(k+1) > sq(k+1)·n(k)` (sums of squares are exact longs;
      * Math.multiplyHigh keeps the 128-bit product exact), so the hash is
      * invariant under re-containerization of the same PCM and robust to
      * amplitude-preserving edits outside the touched segments.
      */
    def phash64(bytes: Array[Byte]): Long = decode(bytes) match {
      case Some((s, _)) if s.length >= 65 =>
        val sq = new Array[Long](65)
        val cnt = new Array[Long](65)
        var k = 0
        while (k < 65) {
          val from = s.length.toLong * k / 65
          val to = s.length.toLong * (k + 1) / 65
          var acc = 0L; var i = from.toInt
          while (i < to) { acc += s(i).toLong * s(i); i += 1 }
          sq(k) = acc; cnt(k) = to - from
          k += 1
        }
        // a·d > c·b on 128 bits without BigInt: compare high halves, then
        // low halves unsigned
        def gt(a: Long, b: Long, c: Long, d: Long): Boolean = {
          val hi1 = Math.multiplyHigh(a, d); val lo1 = a * d
          val hi2 = Math.multiplyHigh(c, b); val lo2 = c * b
          hi1 > hi2 || (hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0)
        }
        var h = 0L
        var j = 0
        while (j < 64) {
          if (gt(sq(j), cnt(j), sq(j + 1), cnt(j + 1))) h |= 1L << j
          j += 1
        }
        h
      case _ => StubCodec.phash64(bytes)
    }
  }

  /** Wrap a text table as a media table (testdata has no binary column;
    * utf-8 bytes stand in for an encoded payload — the plumbing downstream
    * is payload-agnostic).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("image").as("media_type"), lit("raw").as("format"),
        lit(64).as("width"), lit(64).as("height"), lit(0L).as("duration_ms")).as("meta"))

  /** Partition-parallel feature extraction. One codec instance per
    * partition (decoders are usually expensive to init), rows streamed —
    * the shape that scales: no collect, no per-row codec setup, batches
    * bounded by partition size.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("media")).mapPartitions { rows =>
      rows.map { r => Row(r.getLong(0), codec.features(r.getAs[Array[Byte]](1), dim).toSeq) }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame (posexplode). */
  def sampleFrames(media: DataFrame, n: Int = 4,
                   codec: MediaCodec = StubCodec): DataFrame = {
    val framesUdf = udf((bytes: Array[Byte]) => codec.sampleFrames(bytes, n))
    media.select(col("media_id"), posexplode(framesUdf(col("media"))).as(Seq("frame_no", "frame")))
      .select(col("media_id"), col("frame_no"), col("frame"),
        length(col("frame")).cast("long").as("frame_bytes"))
  }

  /** Resize stage: payload transform + metadata update in one pass. */
  def resize(media: DataFrame, w: Int, h: Int,
             codec: MediaCodec = StubCodec): DataFrame = {
    val resizeUdf = udf((bytes: Array[Byte]) => codec.resize(bytes, w, h))
    media.withColumn("media", resizeUdf(col("media")))
      .withColumn("meta", col("meta")
        .withField("width", lit(w)).withField("height", lit(h)))
  }

  /** Partition-parallel 64-bit perceptual hashes ([[MediaCodec.phash64]]):
    * `(media_id, phash)` — the 100 TB media-dedup key. Same mapPartitions
    * shape as [[extractFeatures]]: one codec per partition, rows streamed,
    * 8 output bytes per blob however large the payload.
    */
  def perceptualHash(media: DataFrame,
                     codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("phash", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("media")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), codec.phash64(r.getAs[Array[Byte]](1))))
    }(enc)
  }

  /** Perceptual near-dup pairs within `maxDist` Hamming bits — the image/
    * audio twin of SimHash text dedup, and the same COMPLETE pigeonhole
    * blocking ([[Dedup.hammingPairs]]): after the 8-byte hashes exist the
    * payloads never move again; candidates come from maxDist+1 block-key
    * equi-joins, never an all-pairs comparison.
    */
  def phashPairs(media: DataFrame, maxDist: Int = 3,
                 codec: MediaCodec = StubCodec): DataFrame =
    Dedup.hammingPairs(perceptualHash(media, codec), "media_id", "phash",
      bits = 64, maxDist = maxDist)
}
