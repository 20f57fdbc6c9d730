package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct, and decode / feature-extract / resize / frame-sample run as
  * per-partition batch operators (`mapPartitions` — the JVM analogue of
  * `mapInPandas`: one iterator per partition, bounded batches, no
  * per-row closure dispatch).
  *
  * ==== CODEC BOUNDARY ====
  * Every codec call goes through [[MediaCodecs]]. The IMAGE path is real
  * (JDK ImageIO decode + pixel features + bilinear resize — PNG/JPEG/
  * BMP/GIF, no external libraries); payloads ImageIO cannot decode fall
  * back to deterministic hash-derived fakes so the synthetic fixtures
  * stay reproducible. Video demux remains a deterministic stub (no JDK
  * demuxer in this container). Swapping codecs changes ONLY MediaCodecs;
  * the Spark plumbing (schemas, partitioning, batch shape, operator
  * signatures) is production-shaped and tested either way.
  *
  * Scale notes: payload columns are heavy — every operator here projects
  * the binary column as late as possible and repartitions by `media_id`
  * before decode so one task never holds more than
  * `spark.sql.files.maxPartitionBytes`-worth of payloads; decoded
  * features are small (the binary is dropped right after decode, so
  * shuffles after feature-extraction never carry payload bytes).
  */
object Multimodal {

  /** Typed metadata carried beside the payload. All fields nullable —
    * which fields apply depends on `kind` (image/audio/video).
    */
  val mediaMetadataType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetadataType)))

  final case class MediaFeature(media_id: String, kind: String,
                                feature: Array[Float])
  final case class Frame(media_id: String, frame_idx: Int,
                         frame_payload: Array[Byte])

  /** Wrap any table into the media schema, treating a string column as the
    * raw payload (UTF-8). This is how the spec corpus and the driver's
    * `documents` fixture become media rows — at ingest time real payloads
    * would come from `spark.read.format("binaryFile")`.
    */
  def fromStringColumn(df: DataFrame, idCol: String, textCol: String,
                       kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("string").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("fake").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Decode + feature-extract: binary payload → fixed-dim float vector.
    * Batched per partition; input is repartitioned by media_id first so
    * payload bytes are spread evenly (skew in payload size, not row
    * count, is what kills media jobs). The binary column is dropped in
    * the same operator — downstream stages shuffle only (id, kind,
    * feature).
    */
  def imageFeatures(media: DataFrame, dim: Int = 8,
                    batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .repartition(col("media_id"))
      .mapPartitions { rows =>
        // batch shape: process `batchSize` payloads at a time, mirroring
        // Arrow batch semantics of mapInPandas — a real codec would
        // vectorize over the batch.
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            MediaFeature(r.getString(0), r.getString(1),
              MediaCodecs.extractFeatures(payload, dim))
          }
        }
      }
  }

  /** Audio decode + feature-extract: same batched per-partition shape as
    * imageFeatures, WAV/PCM decoded for real by the JDK sound stack
    * (MediaCodecs.extractAudioFeatures); payload dropped in-operator.
    */
  def audioFeatures(media: DataFrame, dim: Int = 8,
                    batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .repartition(col("media_id"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            MediaFeature(r.getString(0), r.getString(1),
              MediaCodecs.extractAudioFeatures(
                r.getAs[Array[Byte]]("payload"), dim))
          }
        }
      }
  }

  /** Resize: payload → payload with updated metadata. Output schema equals
    * input schema (chainable). The codec call is the stub; the metadata
    * update is real.
    */
  /** Per-image 64-bit perceptual hash (MediaCodecs.perceptualHash) —
    * same batched mapPartitions shape as imageFeatures; payload dropped
    * in-operator, so everything downstream shuffles 16 bytes per image.
    */
  def perceptualHashes(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .repartition(col("media_id"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            (r.getString(0), r.getString(1),
              MediaCodecs.perceptualHash(r.getAs[Array[Byte]]("payload")))
          }
        }
      }
      .toDF("media_id", "kind", "phash")
  }

  /** Image near-dup pairs by perceptual hash: Hamming(phash) ≤
    * `maxHamming`. Chunk LSH turns it into an equi-join: the hash
    * splits into 4×16-bit chunks used as bucket keys, and candidates
    * verify with the exact codegen'd bit_count(xor). Pigeonhole
    * guarantee: a pair differing in ≤ 3 bits cannot touch all 4 chunks,
    * so recall is EXACT for maxHamming ≤ 3; larger budgets recall a
    * pair only if some chunk survives untouched (the standard LSH
    * trade — raise chunks for a harder guarantee). No pairwise scan of
    * the corpus, shuffles carry (id, 16-bit key) rows only — the image
    * twin of the SimHash text path.
    */
  def phashNearDups(media: DataFrame, maxHamming: Int = 8): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64)
    // contentless payloads (failed fetches) all hash to one stub value —
    // pairing them as "duplicates" is noise, so they don't enter the join
    val hashes = perceptualHashes(
      media.filter(col("payload").isNotNull && length(col("payload")) > 0))
    // same 4-chunk builder formulation as Dedup.simhashPairs; the & mask
    // keeps the low 16 bits regardless of the arithmetic shift's sign fill
    val chunks = array((0 until 4).map(c =>
      shiftright(col("phash"), c * 16).bitwiseAND(lit(0xffffL))): _*)
    val chunked = hashes.select(col("media_id"), col("phash"),
      posexplode(chunks).as(Seq("chunk", "key")))
    val cand = chunked.select(col("media_id").as("ida"),
        col("phash").as("ha"), col("chunk"), col("key"))
      .join(chunked.select(col("media_id").as("idb"),
          col("phash").as("hb"), col("chunk").as("chunk_b"),
          col("key").as("key_b")),
        col("chunk") === col("chunk_b") && col("key") === col("key_b") &&
          col("ida") < col("idb"))
      .select("ida", "idb", "ha", "hb")
      .dropDuplicates("ida", "idb")
    cand
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select("ida", "idb", "hamming")
  }

  def resizeImages(media: DataFrame, width: Int, height: Int): DataFrame = {
    val resize = udf((payload: Array[Byte]) =>
      if (payload == null) null
      else MediaCodecs.resizeImage(payload, width, height))
    media
      .withColumn("payload", resize(col("payload")))
      .withColumn("meta", struct(
        col("meta.format"),
        when(col("payload").isNotNull, lit(width)).as("width"),
        when(col("payload").isNotNull, lit(height)).as("height"),
        col("meta.sample_rate"),
        col("meta.duration_ms")))
  }

  /** Frame-sample a video payload: one output row per sampled frame.
    * Explode happens AFTER the per-partition decode so each video's bytes
    * are read once; output carries small frame payloads only.
    */
  def sampleFrames(media: DataFrame, everyNth: Int = 10,
                   maxFrames: Int = 8): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .repartition(col("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          MediaCodecs.demuxFrames(payload, everyNth, maxFrames)
            .zipWithIndex.map { case (bytes, i) =>
              Frame(r.getString(0), i * everyNth, bytes)
            }
        }
      }
  }

  /** Read a directory of real media files as media rows (production
    * ingest path; Spark's binaryFile source handles splitting and
    * predicate-pushdown on path/length).
    */
  def readBinaryDir(spark: SparkSession, path: String, kind: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(
        col("path").as("media_id"),
        lit(kind).as("kind"),
        col("content").as("payload"),
        struct(
          element_at(split(col("path"), "\\."), -1).as("format"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
}

/** ==== CODEC BOUNDARY ====
  * The IMAGE path is REAL: payloads that the JDK's built-in ImageIO can
  * decode (PNG, JPEG, BMP, GIF — no external libraries, headless-safe)
  * get true pixel-level features and a true bilinear resize. Payloads
  * ImageIO rejects fall back to a deterministic hash-derived fake, so
  * the synthetic text-payload fixtures stay stable and specs/oracle runs
  * are reproducible. The AUDIO/VIDEO paths remain deterministic stubs
  * (the JDK ships no audio resampler or video demuxer); their real
  * implementations replace only these bodies — operator signatures,
  * schemas, partitioning and batching above are unchanged either way.
  */
object MediaCodecs {

  /** Magic-byte sniff before ImageIO: reader lookup + stream probing per
    * payload is ~100× the cost of this check, and in a mixed corpus most
    * payloads are NOT images — the fast reject keeps the batch operator
    * at fake-path speed for them (measured: q_media_features 2.0s → 0.6s
    * at sf0.1). Covers the formats the JDK can decode anyway (PNG, JPEG,
    * GIF, BMP, TIFF).
    */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte && p(2) == 0xff.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M') ||
      (p(0) == 'I' && p(1) == 'I' && p(2) == 0x2a && p(3) == 0) ||
      (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 0x2a))

  /** Decompression-bomb guard: a tiny payload can declare a huge canvas
    * (PNG header says 50k×50k → a ~10 GB raster on decode) and stall or
    * OOM an executor task. The reader API exposes the declared
    * dimensions from the HEADER without decoding pixels — anything over
    * the cap is rejected before allocation, falling back to the
    * deterministic fake path like any other undecodable payload.
    */
  private val MaxPixels = 50L * 1000 * 1000

  private def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.isEmpty || !looksLikeImage(payload)) None
    else
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              if (reader.getWidth(0).toLong * reader.getHeight(0) > MaxPixels)
                None
              else Option(reader.read(0))
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: java.io.IOException => None }

  /** Image features. REAL for decodable images: [width, height, aspect,
    * mean R, mean G, mean B, luma mean, luma stddev] (RGB/luma in 0-1),
    * zero-padded or truncated to `dim` — the classic cheap image
    * descriptor (a vision-encoder embedding would slot in here
    * unchanged). Deterministic hash fake for undecodable payloads.
    */
  def extractFeatures(payload: Array[Byte], dim: Int): Array[Float] =
    decode(payload) match {
      case Some(img) =>
        val w = img.getWidth; val h = img.getHeight
        var r = 0.0; var g = 0.0; var b = 0.0
        var luma = 0.0; var luma2 = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val pr = ((p >> 16) & 0xff) / 255.0
            val pg = ((p >> 8) & 0xff) / 255.0
            val pb = (p & 0xff) / 255.0
            r += pr; g += pg; b += pb
            val l = 0.299 * pr + 0.587 * pg + 0.114 * pb
            luma += l; luma2 += l * l
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        val lm = luma / n
        val full = Array(w.toFloat, h.toFloat, w.toFloat / h,
          (r / n).toFloat, (g / n).toFloat, (b / n).toFloat,
          lm.toFloat, math.sqrt(math.max(luma2 / n - lm * lm, 0.0)).toFloat)
        java.util.Arrays.copyOf(full, dim)
      case None => fakeFeatures(payload, dim)
    }

  /** Deterministic fallback: dim floats from a rolling hash of the bytes
    * — length- and content-sensitive, engine-independent.
    */
  private def fakeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null) return Array.fill(dim)(0.0f)
    val out = new Array[Float](dim)
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      out(i % dim) += (h % 1000) / 1000.0f
      i += 1
    }
    var d = 0
    while (d < dim) { out(d) = out(d) / math.max(payload.length, 1); d += 1 }
    out
  }

  /** 64-bit average-hash (aHash). REAL for decodable images: grayscale
    * block-average down to 8×8, threshold each cell against the mean →
    * 64 bits MSB-first (row-major). The standard cheap perceptual
    * fingerprint: re-encodes, small crops/noise, and resizes move only
    * a few bits, so near-duplicate images sit within a small Hamming
    * distance (dHash/pHash slot in here unchanged if gradients or DCT
    * are wanted). Deterministic byte-hash fake for undecodable
    * payloads — distinct payloads (including null vs empty) hash apart,
    * so only exact stub copies can pair; phashNearDups additionally
    * drops contentless payloads before pairing.
    */
  def perceptualHash(payload: Array[Byte]): Long =
    decode(payload) match {
      case Some(img) =>
        val w = img.getWidth; val h = img.getHeight
        val cells = new Array[Double](64)
        val counts = new Array[Int](64)
        // block-average the full image into the 8×8 grid in ONE pixel
        // pass (integer block bounds; every pixel lands in exactly one
        // cell; blocks differ in size by ±1 pixel, hence the counts)
        var y = 0
        while (y < h) {
          val cy = math.min(y * 8 / h, 7)
          var x = 0
          while (x < w) {
            val cell = cy * 8 + math.min(x * 8 / w, 7)
            val rgb = img.getRGB(x, y)
            cells(cell) += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        var mean = 0.0
        while (i < 64) {
          cells(i) = if (counts(i) > 0) cells(i) / counts(i) else 0.0
          mean += cells(i); i += 1
        }
        mean /= 64
        var bits = 0L
        i = 0
        while (i < 64) {
          if (cells(i) > mean) bits |= (1L << (63 - i))
          i += 1
        }
        bits
      case None =>
        // deterministic fake: FNV-ish over the bytes — unrelated stubs
        // land far apart in Hamming space; identical stub payloads hash
        // equal (exact copies are real duplicates), and the length/null
        // mix-in keeps null vs empty vs content distinct
        var hsh = -3750763034362895579L // FNV-1a 64 offset basis
        if (payload == null) hsh ^= 0x9e3779b97f4a7c15L
        else {
          hsh ^= payload.length
          hsh *= 1099511628211L
          var i = 0
          while (i < payload.length) {
            hsh ^= payload(i); hsh *= 1099511628211L; i += 1
          }
        }
        hsh
    }

  /** Image resize. REAL for decodable images: bilinear Graphics2D scale
    * re-encoded as PNG (swap in Lanczos/libvips for production quality).
    * Tag-prefix fake for undecodable payloads (output ≠ input,
    * deterministically).
    */
  def resizeImage(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
    decode(payload) match {
      case Some(img) =>
        val out = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        g2.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(img, 0, 0, width, height, null)
        g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      case None =>
        s"resized:${width}x$height:".getBytes("UTF-8") ++ payload
    }

  /** Audio features. REAL for payloads the JDK sound stack parses (WAV
    * containers with PCM frames — no external libraries): [sample_rate,
    * channels, duration_sec, rms, peak, zero_crossing_rate] over the
    * decoded 16-bit samples, padded/truncated to `dim`. Other formats
    * (mp3, flac — no JDK decoder) fall back to the deterministic hash
    * fake, same policy as images.
    */
  /** RIFF/WAVE + AIFF magic — same fast-reject rationale as images. */
  private def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length >= 12 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M'))

  def extractAudioFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null || payload.isEmpty || !looksLikeAudio(payload))
      return fakeFeatures(payload, dim)
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16)
          return fakeFeatures(payload, dim)
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        if (n == 0) return fakeFeatures(payload, dim)
        // RMS/peak run over ALL interleaved samples (channel-agnostic
        // energy). Zero crossings must NOT: interleaved L/R samples
        // alternate through the loop, so an off-center stereo image
        // registers a spurious crossing per frame — ZCR is therefore
        // computed on channel 0 only (sample indices ≡ 0 mod channels),
        // normalized by FRAMES. For mono this is bit-identical to the
        // single-stream formula.
        val ch = fmt.getChannels
        var sum2 = 0.0; var peak = 0.0; var crossings = 0L
        var prevNeg = false; var ch0Seen = false
        var i = 0
        while (i < n) {
          val b0 = bytes(2 * i) & 0xff
          val b1 = bytes(2 * i + 1) & 0xff
          val raw = if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
          val s = raw.toShort / 32768.0
          sum2 += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          if (i % ch == 0) {
            val neg = s < 0
            if (ch0Seen && neg != prevNeg) crossings += 1
            prevNeg = neg
            ch0Seen = true
          }
          i += 1
        }
        val frames = n / ch
        val full = Array(
          fmt.getSampleRate,
          ch.toFloat,
          frames / fmt.getSampleRate,
          math.sqrt(sum2 / n).toFloat,
          peak.toFloat,
          if (frames > 0) crossings.toFloat / frames else 0.0f)
        java.util.Arrays.copyOf(full, dim)
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException =>
        fakeFeatures(payload, dim)
      case _: java.io.IOException => fakeFeatures(payload, dim)
    }
  }

  /** STUB for: video demux + frame sampling (ffmpeg). Real impl yields
    * every-nth decoded frame up to maxFrames. Fake: deterministic slices
    * of the payload, one per "frame". The JDK ships no video demuxer, so
    * this boundary stays a stub in this environment.
    */
  def demuxFrames(payload: Array[Byte], everyNth: Int,
                  maxFrames: Int): Seq[Array[Byte]] = {
    if (payload == null || payload.isEmpty) return Nil
    val nFrames = math.min(maxFrames, math.max(1, payload.length / 16))
    (0 until nFrames).map { i =>
      val start = (i * everyNth * 4) % payload.length
      payload.slice(start, math.min(start + 16, payload.length))
    }
  }
}
