package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing over the documents fixture: payloads as binary
  * columns, per-partition batched decode (stubbed codec — see
  * graft.multimodal.MediaCodecs), features shuffled without payload bytes.
  * mapPartitions operators are not SQL-expressible → rows-only checks.
  */
object MultimodalQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // decode → feature-extract → per-doc feature norm (deterministic).
    "q_media_features" -> ((s, d) => {
      val media = Multimodal.fromStringColumn(
        Tables.documents(s, d), "doc_id", "text")
      Multimodal.imageFeatures(media, dim = 8).toDF()
        .select(col("media_id"),
          round(sqrt(aggregate(transform(col("feature"),
            x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, v) => acc + v)), 4).as("feature_norm"))
        .orderBy("media_id")
    }),

    // frame-sample: rows explode per sampled frame; frame bytes stay small.
    "q_media_frames" -> ((s, d) => {
      val media = Multimodal.fromStringColumn(
        Tables.documents(s, d).limit(100), "doc_id", "text", kind = "video")
      Multimodal.sampleFrames(media, everyNth = 10, maxFrames = 4).toDF()
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          max("frame_idx").as("max_frame_idx"))
        .orderBy("media_id")
    }))

  val oracle: Map[String, String] = Map.empty
}
