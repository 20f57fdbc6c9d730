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
  * ==== STUB BOUNDARY ====
  * The actual codecs (JPEG decode, audio resample, video demux) are NOT
  * implemented — this container has no image/audio libraries. Every codec
  * call below goes through [[MediaCodecs]], which returns DETERMINISTIC
  * FAKE payloads derived from the input bytes (so specs and oracle runs
  * are stable). Swapping in real codecs changes ONLY MediaCodecs; the
  * Spark plumbing (schemas, partitioning, batch shape, operator
  * signatures) is production-shaped and tested.
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

  /** Resize: payload → payload with updated metadata. Output schema equals
    * input schema (chainable). The codec call is the stub; the metadata
    * update is real.
    */
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

/** ==== STUBS ====
  * Deterministic stand-ins for real codecs. Each function documents the
  * real implementation it replaces. Replace the bodies (not the
  * signatures) to go to production.
  */
object MediaCodecs {

  /** STUB for: JPEG/PNG decode + CNN/CLIP-style embedding. Real impl:
    * decode to pixels, run a vision encoder, return its pooled output.
    * Fake: dim floats derived from a rolling hash of the payload —
    * deterministic, length-sensitive, content-sensitive.
    */
  def extractFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
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

  /** STUB for: image resize (e.g. Lanczos via libvips). Real impl returns
    * re-encoded bytes at (width, height). Fake: prefix the payload with a
    * tag so output ≠ input, deterministically.
    */
  def resizeImage(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
    s"resized:${width}x$height:".getBytes("UTF-8") ++ payload

  /** STUB for: video demux + frame sampling (ffmpeg). Real impl yields
    * every-nth decoded frame up to maxFrames. Fake: deterministic slices
    * of the payload, one per "frame".
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
