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

    // Perceptual-hash image dedup (aHash + 16-bit-chunk LSH + exact
    // bit_count verify). The text-derived payloads aren't decodable, so
    // they take the deterministic fake-hash path — meaning only EXACT
    // payload copies can pair, and every 10th doc is PLANTED as a copy
    // of another doc's payload: the operator must find exactly those
    // pairs at Hamming 0. MultimodalSpec drives the REAL decoder path
    // (gradient PNGs, small perturbations) where Hamming is graded.
    "q_media_phash" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.select(col("doc_id").as("b_id"),
        col("text").as("b_text"))
      val planted = docs
        .select(col("doc_id"), col("text"),
          when(col("doc_id") % 10 === 7, col("doc_id") - 7)
            .otherwise(col("doc_id")).as("payload_src"))
        .join(base, col("payload_src") === col("b_id"), "left")
        .select(col("doc_id"), coalesce(col("b_text"), col("text")).as("ptext"))
      Multimodal.phashNearDups(
          Multimodal.fromStringColumn(planted, "doc_id", "ptext"),
          maxHamming = 3)
        .orderBy("ida", "idb")
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
