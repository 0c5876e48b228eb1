package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  lazy val media = Multimodal.fromDocuments(
    Seq((1L, "hello world this is a payload"), (2L, "x")).toDF("doc_id", "text"))

  test("fromDocuments: binary payload + typed metadata struct") {
    val r = media.collect().map(x => (x.getAs[Long]("media_id"), x.getAs[Array[Byte]]("media"))).toMap
    assert(new String(r(1L), "UTF-8") === "hello world this is a payload")
    val meta = media.select(col("meta.media_type"), col("meta.width")).collect().head
    assert(meta.getString(0) === "image" && meta.getInt(1) === 64)
  }

  test("feature extraction: deterministic normalized histogram via mapPartitions") {
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Seq[Double]]("features")).toMap
    val f2 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Seq[Double]]("features")).toMap
    assert(f1 === f2)
    assert(f1(1L).length === 16)
    assert(math.abs(f1(1L).sum - 1.0) < 1e-9) // histogram normalized
  }

  test("frame sampling: n frames covering the payload") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1L), n = 4).collect()
    assert(frames.length === 4)
    assert(frames.map(_.getAs[Int]("frame_no")).sorted === Array(0, 1, 2, 3))
    assert(frames.map(_.getAs[Long]("frame_bytes")).sum === 29L) // total payload length
  }

  test("resize: payload shrunk, metadata updated") {
    val r = Multimodal.resize(media, 2, 3).collect()
      .map(x => x.getAs[Long]("media_id") ->
        ((x.getAs[Array[Byte]]("media").length,
          x.getStruct(x.fieldIndex("meta")).getAs[Int]("width")))).toMap
    assert(r(1L) === ((6, 2)))  // 2*3 bytes
    assert(r(2L) === ((1, 2)))  // payload shorter than target
  }

  // ---------------------------------------------------- real codec (imageio)

  /** 4×4 PNG: left half red, right half blue — asymmetric so resampling
    * errors are visible in pixel values.
    */
  private def testPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def decode(b: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))

  test("ImageIoCodec.resize really decodes and nearest-neighbor resamples a PNG") {
    val out = decode(Multimodal.ImageIoCodec.resize(testPng(), 2, 2))
    assert(out.getWidth === 2 && out.getHeight === 2)
    // nearest-neighbor from the half-red/half-blue source: col 0 red, col 1 blue
    assert((out.getRGB(0, 0) & 0xffffff) === 0xff0000)
    assert((out.getRGB(1, 1) & 0xffffff) === 0x0000ff)
  }

  test("ImageIoCodec.features: luminance histogram over decoded pixels, normalized") {
    val f = Multimodal.ImageIoCodec.features(testPng(), 16)
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0) < 1e-9)
    // red lum = 299*255/1000 = 76 → bin 76*16/256 = 4; blue lum = 114*255/1000 = 29 → bin 1
    assert(f(4) === 0.5 && f(1) === 0.5)
  }

  test("ImageIoCodec.sampleFrames: horizontal strips, each a decodable PNG") {
    val frames = Multimodal.ImageIoCodec.sampleFrames(testPng(), 2)
    assert(frames.length === 2)
    val imgs = frames.map(decode)
    assert(imgs.forall(i => i.getWidth === 4 && i.getHeight === 2))
  }

  /** Animated GIF: `nFrames` solid-color full frames at 10×8 (primary
    * palette colors survive GIF quantization exactly).
    */
  private def testAnimatedGif(nFrames: Int): Array[Byte] = {
    val colors = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000, 0xffff00)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { i =>
      val img = new java.awt.image.BufferedImage(10, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 10) img.setRGB(x, y, colors(i % colors.length))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  test("ImageIoCodec.sampleFrames: animated GIF yields real temporal frames") {
    val gif = testAnimatedGif(6)
    val frames = Multimodal.ImageIoCodec.sampleFrames(gif, 4)
    assert(frames.length === 4)
    val imgs = frames.map(decode)
    // temporal frames are the FULL logical screen, not horizontal strips
    assert(imgs.forall(i => i.getWidth === 10 && i.getHeight === 8))
    // frame k snapshots animation index 6k/4 → indices 0,1,3,4
    val expected = Seq(0xff0000, 0x00ff00, 0xffffff, 0x000000)
    assert(imgs.map(_.getRGB(5, 4) & 0xffffff).toSeq === expected)
    // ≥4 distinct real frames, per the animation — not one frame repeated
    assert(imgs.map(_.getRGB(5, 4)).distinct.length === 4)
  }

  test("ImageIoCodec.sampleFrames: animation determinism and n > frame-count clamping") {
    val gif = testAnimatedGif(3)
    val a = Multimodal.ImageIoCodec.sampleFrames(gif, 6)
    val b = Multimodal.ImageIoCodec.sampleFrames(gif, 6)
    assert(a.map(_.toSeq) === b.map(_.toSeq))
    assert(a.length === 6) // contract: n frames, repeats allowed when T < n
    // snapshots at indices 3k/6 = 0,0,1,1,2,2 — consecutive duplicates
    assert(a(0).toSeq === a(1).toSeq && a(2).toSeq === a(3).toSeq)
    val colors = a.map(f => decode(f).getRGB(5, 4) & 0xffffff).distinct
    assert(colors === Seq(0xff0000, 0x00ff00, 0x0000ff))
  }

  test("ImageIoCodec.sampleFrames: single-frame GIF keeps the strip path") {
    val gif = testAnimatedGif(1)
    val frames = Multimodal.ImageIoCodec.sampleFrames(gif, 2)
    val imgs = frames.map(decode)
    // strips: full width, half height each
    assert(imgs.forall(i => i.getWidth === 10 && i.getHeight === 4))
  }

  test("ImageIoCodec falls back to StubCodec on undecodable bytes") {
    val junk = "not an image".getBytes("UTF-8")
    assert(Multimodal.ImageIoCodec.features(junk, 8).toSeq ===
      Multimodal.StubCodec.features(junk, 8).toSeq)
    assert(Multimodal.ImageIoCodec.resize(junk, 2, 2).toSeq ===
      Multimodal.StubCodec.resize(junk, 2, 2).toSeq)
  }

  test("pipeline runs end-to-end with the real codec over PNG payloads") {
    val png = testPng()
    val mediaDf = Seq((1L, png), (2L, png)).toDF("media_id", "media")
    val feats = Multimodal.extractFeatures(mediaDf, dim = 8,
      codec = Multimodal.ImageIoCodec).collect()
    assert(feats.length === 2)
    assert(feats.forall(r => math.abs(r.getAs[Seq[Double]]("features").sum - 1.0) < 1e-9))
    val resized = Multimodal.resize(
      Multimodal.fromDocuments(Seq((3L, "doc")).toDF("doc_id", "text"))
        .withColumn("media", lit(png)),
      2, 2, codec = Multimodal.ImageIoCodec).collect()
    assert(decode(resized.head.getAs[Array[Byte]]("media")).getWidth === 2)
  }

  // ---------------------------------------------------- real codec (wav)

  /** 800-sample 8 kHz mono WAV: loud square wave for the first half,
    * silence for the second — asymmetric so energy profiles are visible.
    */
  private def testWav(): Array[Byte] = {
    val f = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](800 * 2)
    for (i <- 0 until 400) {
      val s = if (i % 8 < 4) 16000 else -16000
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), f, 800),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavCodec.features: RMS energy profile — loud first half, silent second") {
    val e = Multimodal.WavCodec.features(testWav(), 4)
    assert(e.length === 4)
    // square wave of amplitude 16000 → RMS 16000/32768 ≈ 0.488 exactly
    assert(math.abs(e(0) - 16000.0 / 32768.0) < 1e-9 && e(1) === e(0))
    assert(e(2) === 0.0 && e(3) === 0.0)
  }

  test("WavCodec.sampleFrames: equal-duration clips, each a decodable WAV") {
    val clips = Multimodal.WavCodec.sampleFrames(testWav(), 4)
    assert(clips.length === 4)
    // each clip decodes to 200 samples; clip 0 loud, clip 3 silent
    val profiles = clips.map(c => Multimodal.WavCodec.features(c, 1)(0))
    assert(profiles(0) > 0.4 && profiles(3) === 0.0)
  }

  test("WavCodec.resize: w-sample thumbnail, decodable, energy preserved in shape") {
    val thumb = Multimodal.WavCodec.resize(testWav(), 80, 0)
    val e = Multimodal.WavCodec.features(thumb, 2)
    assert(e(0) > 0.4 && e(1) === 0.0)
  }

  test("WavCodec falls back to StubCodec on undecodable bytes") {
    val junk = "not audio".getBytes("UTF-8")
    assert(Multimodal.WavCodec.features(junk, 8).toSeq ===
      Multimodal.StubCodec.features(junk, 8).toSeq)
  }

  test("pipeline runs end-to-end with the wav codec") {
    val wav = testWav()
    val mediaDf = Seq((1L, wav)).toDF("media_id", "media")
    val feats = Multimodal.extractFeatures(mediaDf, dim = 4,
      codec = Multimodal.WavCodec).collect()
    assert(feats.head.getAs[Seq[Double]]("features")(0) > 0.4)
  }

  // ---------------------------------------------------- perceptual hashes

  test("StubCodec.phash64: deterministic; a last-byte edit moves <= 1 bit") {
    val a = ("x" * 130).getBytes("UTF-8")
    assert(Multimodal.StubCodec.phash64(a) === Multimodal.StubCodec.phash64(a.clone()))
    val b = a.clone(); b(b.length - 1) = '!'
    val d = java.lang.Long.bitCount(
      Multimodal.StubCodec.phash64(a) ^ Multimodal.StubCodec.phash64(b))
    assert(d <= 1) // only the final byte window's mean moved
    assert(Multimodal.StubCodec.phash64(Array.emptyByteArray) === 0L)
  }

  /** 18×16 PNG with a horizontal sawtooth so the 9×8 dHash grid has
    * non-trivial left/right comparisons in every row.
    */
  private def testGradientImage(): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 18) {
      val v = (x * 29 + y * 5) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("ImageIoCodec.phash64: container-invariant (PNG vs BMP of one raster)") {
    val img = testGradientImage()
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = enc("png"); val bmp = enc("bmp")
    assert(!java.util.Arrays.equals(png, bmp)) // payload bytes differ...
    assert(Multimodal.ImageIoCodec.phash64(png) ===
      Multimodal.ImageIoCodec.phash64(bmp))    // ...perceptual hash agrees
    assert(Multimodal.ImageIoCodec.phash64(png) !==
      Multimodal.StubCodec.phash64(png))       // and the real path ran
  }

  test("ImageIoCodec.phash64: a localized edit moves few bits, not the hash") {
    val img = testGradientImage()
    def pngOf(i: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", bos)
      bos.toByteArray
    }
    val h1 = Multimodal.ImageIoCodec.phash64(pngOf(img))
    // blank one grid-cell-sized region (2×2 px ≈ one 9×8 cell)
    for (y <- 0 until 2; x <- 0 until 2) img.setRGB(x, y, 0xffffff)
    val h2 = Multimodal.ImageIoCodec.phash64(pngOf(img))
    val d = java.lang.Long.bitCount(h1 ^ h2)
    assert(d > 0 && d <= 8, s"dist $d") // touched cells only
  }

  test("WavCodec.phash64: PCM-invariant re-encode agrees; junk falls back to stub") {
    val wav = testWav()
    val h = Multimodal.WavCodec.phash64(wav)
    // identity "resize" re-encodes the same 800 samples into a fresh container
    val reenc = Multimodal.WavCodec.resize(wav, 800, 0)
    assert(Multimodal.WavCodec.phash64(reenc) === h)
    assert(h !== Multimodal.StubCodec.phash64(wav)) // real path ran
    val junk = "not audio".getBytes("UTF-8")
    assert(Multimodal.WavCodec.phash64(junk) === Multimodal.StubCodec.phash64(junk))
  }

  test("phashPairs: planted re-encode twin found, unrelated docs not") {
    val docs = Seq(
      (1L, "a" * 80 + "b" * 50),
      (2L, "a" * 80 + "b" * 49 + "!"),  // last char differs → last window only
      // natural text → ~random bits (a constant string would hash ~0 and
      // collide with docs 1/2 at dist 1; checked offline: dist 31 here)
      (3L, "the quick brown fox jumps over the lazy dog " * 3)).toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(Multimodal.fromDocuments(docs), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
