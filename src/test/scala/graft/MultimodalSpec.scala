package graft

import graft.multimodal.{MediaCodecs, Multimodal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val media = Multimodal.fromStringColumn(
    Seq((1L, "a picture of a gpu cluster"),
        (2L, "another picture, rather different content"),
        (3L, "short")).toDF("id", "body"),
    "id", "body")

  test("fromStringColumn produces the media schema with typed metadata") {
    assert(media.schema("payload").dataType == BinaryType)
    val meta = media.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("format", "width", "height", "sample_rate", "duration_ms"))
    assert(media.count() == 3)
  }

  test("imageFeatures returns fixed-dim deterministic vectors, drops payload") {
    val f1 = Multimodal.imageFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.imageFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1.keySet == Set("1", "2", "3"))
    assert(f1.values.forall(_.length == 8))
    assert(f1 == f2)                       // deterministic
    assert(f1("1") != f1("2"))             // content-sensitive
    val cols = Multimodal.imageFeatures(media).toDF().columns.toSet
    assert(!cols.contains("payload"))      // binary dropped post-decode
  }

  test("imageFeatures batching covers all rows regardless of batch size") {
    val n = Multimodal.imageFeatures(media, dim = 4, batchSize = 2).count()
    assert(n == 3)
  }

  test("resizeImages rewrites payload and metadata dims, keeps schema") {
    val resized = Multimodal.resizeImages(media, 224, 224)
    // same names/types; nullability may tighten (lit dims are non-null)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq
    assert(shape(resized) == shape(media))
    val r = resized.where($"media_id" === "1").collect()(0)
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Int]("width") == 224 && meta.getAs[Int]("height") == 224)
    val payload = new String(r.getAs[Array[Byte]]("payload"), "UTF-8")
    assert(payload.startsWith("resized:224x224:"))
  }

  test("sampleFrames yields frame rows with stride indices") {
    val frames = Multimodal.sampleFrames(media, everyNth = 10, maxFrames = 4)
      .collect()
    assert(frames.nonEmpty)
    val byId = frames.groupBy(_.media_id)
    assert(byId("1").map(_.frame_idx).sorted.toSeq ==
      byId("1").indices.map(_ * 10))
    assert(frames.forall(_.frame_payload.nonEmpty))
  }

  // ---- real image path (JDK ImageIO) ----

  /** In-memory PNG of size w×h filled with one RGB color. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG payloads get true pixel features (dims, aspect, mean color)") {
    val red = MediaCodecs.extractFeatures(png(40, 20, 0xff0000), dim = 8)
    assert(red(0) == 40f && red(1) == 20f && red(2) == 2.0f)
    assert(math.abs(red(3) - 1.0f) < 1e-3)  // mean R
    assert(red(4) < 1e-3 && red(5) < 1e-3)  // mean G, B
    assert(red(7) < 1e-3)                   // uniform image → zero luma std
    val grey = MediaCodecs.extractFeatures(png(8, 8, 0x808080), dim = 8)
    assert(math.abs(grey(6) - 128f / 255f) < 1e-2) // luma mean
  }

  test("real PNG resize re-encodes at the requested dimensions") {
    val out = MediaCodecs.resizeImage(png(40, 20, 0x00ff00), 10, 5)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out))
    assert(back != null && back.getWidth == 10 && back.getHeight == 5)
    // pixel content survives the scale (still green)
    val p = back.getRGB(5, 2)
    assert(((p >> 8) & 0xff) > 200 && ((p >> 16) & 0xff) < 50)
  }

  test("imageFeatures runs the real decoder end-to-end on a PNG DataFrame") {
    val rows = Seq(
      ("img1", "image", png(16, 16, 0x0000ff)),
      ("img2", "image", png(32, 8, 0xffffff)),
      ("not_an_image", "image", "just text bytes".getBytes("UTF-8")))
    val df = rows.toDF("media_id", "kind", "payload")
    val feats = Multimodal.imageFeatures(df, dim = 8).collect()
      .map(f => f.media_id -> f.feature).toMap
    assert(feats("img1")(0) == 16f && feats("img1")(5) > 0.99f) // blue mean
    assert(feats("img2")(0) == 32f && feats("img2")(1) == 8f)
    // undecodable bytes deterministically fall back to the hash fake
    assert(feats("not_an_image").toSeq ==
      MediaCodecs.extractFeatures("just text bytes".getBytes("UTF-8"), 8).toSeq)
  }

  // ---- real audio path (JDK javax.sound.sampled) ----

  /** In-memory 16-bit mono PCM WAV: sine at `freq` Hz, `secs` long. */
  private def wav(freq: Double, secs: Double, rate: Float = 8000f,
                  amp: Double = 0.5): Array[Byte] = {
    val n = (rate * secs).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decompression-bomb guard: huge declared dims are rejected unread") {
    // take a real 8×8 PNG and rewrite its IHDR to declare a 50000×50000
    // canvas (2.5G pixels from a ~100-byte payload — the classic bomb),
    // recomputing the chunk CRC so the reader trusts the header and the
    // DIMENSION guard (not a checksum failure) is what rejects it
    val bomb = png(8, 8, 0x123456).clone()
    def putInt(off: Int, v: Int): Unit = {
      bomb(off) = ((v >> 24) & 0xff).toByte
      bomb(off + 1) = ((v >> 16) & 0xff).toByte
      bomb(off + 2) = ((v >> 8) & 0xff).toByte
      bomb(off + 3) = (v & 0xff).toByte
    }
    putInt(16, 50000); putInt(20, 50000)   // IHDR width, height
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 17)               // chunk type + 13 data bytes
    putInt(29, crc.getValue.toInt)
    val f = MediaCodecs.extractFeatures(bomb, dim = 8)
    // never decoded at the declared canvas: falls back to the hash fake
    assert(f(0) != 50000f && f(1) != 50000f)
    assert(f.toSeq == MediaCodecs.extractFeatures(bomb, 8).toSeq) // deterministic
    // the unpatched sibling still takes the real path (guard not overbroad)
    assert(MediaCodecs.extractFeatures(png(8, 8, 0x123456), 8)(0) == 8f)
  }

  /** In-memory 16-bit stereo PCM WAV: channel 0 = sine at `freq`,
    * channel 1 = constant positive DC (never crosses zero).
    */
  private def stereoWav(freq: Double, secs: Double,
                        rate: Float = 8000f): Array[Byte] = {
    val n = (rate * secs).toInt
    val pcm = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val s0 = (math.sin(2 * math.Pi * freq * i / rate) * 0.5 * 32767).toInt
      val s1 = (0.3 * 32767).toInt
      pcm(4 * i) = (s0 & 0xff).toByte
      pcm(4 * i + 1) = ((s0 >> 8) & 0xff).toByte
      pcm(4 * i + 2) = (s1 & 0xff).toByte
      pcm(4 * i + 3) = ((s1 >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("stereo WAV: zcr tracks channel 0, not interleaved sign flips") {
    val f = MediaCodecs.extractAudioFeatures(stereoWav(440.0, 1.0), dim = 8)
    assert(f(1) == 2f)                       // channels
    assert(math.abs(f(2) - 1.0f) < 1e-2)     // duration from FRAMES
    // 440 Hz sine crosses ~880×/s → zcr ≈ 880/8000; the interleaved bug
    // would register ~2 crossings per negative ch0 sample (~0.5)
    assert(math.abs(f(5) - 880f / 8000f) < 0.01)
  }

  test("real WAV payloads get true audio features (rate, duration, rms, zcr)") {
    val f = MediaCodecs.extractAudioFeatures(wav(440.0, 1.0), dim = 8)
    assert(f(0) == 8000f && f(1) == 1f)
    assert(math.abs(f(2) - 1.0f) < 1e-2)                 // duration ≈ 1 s
    assert(math.abs(f(3) - 0.5f / math.sqrt(2).toFloat) < 0.01) // sine rms
    assert(math.abs(f(4) - 0.5f) < 0.01)                 // peak ≈ amp
    // a 440 Hz sine crosses zero ~880 times/sec → zcr ≈ 880/8000
    assert(math.abs(f(5) - 880f / 8000f) < 0.01)
  }

  test("audioFeatures runs distributed with WAV + fallback payloads") {
    val rows = Seq(
      ("a440", "audio", wav(440.0, 0.5)),
      ("a220", "audio", wav(220.0, 0.5)),
      ("noise", "audio", "not audio bytes".getBytes("UTF-8")))
    val feats = Multimodal.audioFeatures(
        rows.toDF("media_id", "kind", "payload"), dim = 8)
      .collect().map(f => f.media_id -> f.feature).toMap
    assert(feats.keySet == Set("a440", "a220", "noise"))
    // zcr separates the two tones
    assert(feats("a440")(5) > 1.8f * feats("a220")(5) - 0.02f)
    assert(feats("noise").toSeq ==
      MediaCodecs.extractFeatures("not audio bytes".getBytes("UTF-8"), 8).toSeq)
  }

  test("codec stubs are deterministic and content-sensitive") {
    val a = MediaCodecs.extractFeatures("abc".getBytes, 4).toSeq
    val b = MediaCodecs.extractFeatures("abc".getBytes, 4).toSeq
    val c = MediaCodecs.extractFeatures("abd".getBytes, 4).toSeq
    assert(a == b && a != c)
    assert(MediaCodecs.extractFeatures(null, 4).toSeq == Seq(0f, 0f, 0f, 0f))
  }

  /** PNG with per-pixel color from f(x, y) — textured test images (a
    * UNIFORM image aHashes to 0 by construction, so gradients are the
    * honest fixtures).
    */
  private def texPng(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("perceptualHash: re-encode-stable, perturbation-local, pattern-sensitive") {
    val grad = texPng(32, 32)((x, _) => (x * 255 / 31) << 16)
    val gradCopy = texPng(32, 32)((x, _) => (x * 255 / 31) << 16)
    // same gradient with one 4×4 corner block blacked out
    val gradDinged = texPng(32, 32)((x, y) =>
      if (x >= 28 && y < 4) 0 else (x * 255 / 31) << 16)
    val vertical = texPng(32, 32)((_, y) => (y * 255 / 31) << 8)
    val h1 = MediaCodecs.perceptualHash(grad)
    assert(h1 == MediaCodecs.perceptualHash(gradCopy)) // deterministic encode
    val dinged = MediaCodecs.perceptualHash(gradDinged)
    val hv = MediaCodecs.perceptualHash(vertical)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, dinged) <= 3, s"local edit moved ${ham(h1, dinged)} bits")
    assert(ham(h1, hv) > 8, s"orthogonal patterns too close: ${ham(h1, hv)}")
    // undecodable payloads: deterministic fake, no accidental zero
    val f1 = MediaCodecs.perceptualHash("not an image".getBytes)
    assert(f1 == MediaCodecs.perceptualHash("not an image".getBytes))
    assert(f1 != MediaCodecs.perceptualHash("not an imagf".getBytes))
    // null, empty, and content stubs are three DIFFERENT hashes — failed
    // fetches must not pair with each other as hamming-0 "duplicates"
    val fNull = MediaCodecs.perceptualHash(null)
    val fEmpty = MediaCodecs.perceptualHash(Array.emptyByteArray)
    assert(fNull != fEmpty && fNull != f1 && fEmpty != f1)
  }

  test("phashNearDups drops contentless payloads from pairing") {
    import spark.implicits._
    val media = Seq(
      ("n1", "image", null.asInstanceOf[Array[Byte]]),
      ("n2", "image", null.asInstanceOf[Array[Byte]]),
      ("e1", "image", Array.emptyByteArray),
      ("e2", "image", Array.emptyByteArray)
    ).toDF("media_id", "kind", "payload")
    assert(Multimodal.phashNearDups(media, maxHamming = 8).count() == 0)
  }

  test("phashNearDups pairs the copy and the dinged variant, not the orthogonal pattern") {
    import spark.implicits._
    val grad = texPng(32, 32)((x, _) => (x * 255 / 31) << 16)
    val dinged = texPng(32, 32)((x, y) =>
      if (x >= 28 && y < 4) 0 else (x * 255 / 31) << 16)
    val vertical = texPng(32, 32)((_, y) => (y * 255 / 31) << 8)
    val media = Seq(
      ("a", "image", grad), ("b", "image", dinged), ("c", "image", vertical)
    ).toDF("media_id", "kind", "payload")
    val pairs = Multimodal.phashNearDups(media, maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a", "b")), pairs)
  }
}
