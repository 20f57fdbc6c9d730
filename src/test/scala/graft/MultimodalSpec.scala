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

  test("codec stubs are deterministic and content-sensitive") {
    val a = MediaCodecs.extractFeatures("abc".getBytes, 4).toSeq
    val b = MediaCodecs.extractFeatures("abc".getBytes, 4).toSeq
    val c = MediaCodecs.extractFeatures("abd".getBytes, 4).toSeq
    assert(a == b && a != c)
    assert(MediaCodecs.extractFeatures(null, 4).toSeq == Seq(0f, 0f, 0f, 0f))
  }
}
