package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style statistical language-model quality scoring: train bigram
  * counts on the corpus, score every document by its average negative
  * log-likelihood under the bigram model,
  *
  *   nll(doc) = −(1/N) · Σ ln( c(w1 w2) / c(w1 ·) )
  *
  * Low scores ≈ fluent/repetitive text, high scores ≈ improbable token
  * sequences — the perplexity filter CCNet/RedPajama-style pipelines run
  * after rule-based quality scoring (reference quality fields:
  * models/marts/schema.yml; the reference itself stops at rule-based
  * scoring, this is its model-based sibling).
  *
  * Scale shape (the part that must survive 100 TB):
  *   - TWO corpus passes, by construction: one trains the model, one
  *     scores against it — the n-gram-LM structure DSIR/CCNet share.
  *     The MODEL is a materialized artifact (a persisted vocab-sized
  *     count table), never re-derived per consumer: round 13 found the
  *     lazy formulation re-exploding the corpus SEVEN times at 30×
  *     (one full subtree per model/normalizer consumer, ReuseExchange
  *     never unifying the pruned branches) — training once and pinning
  *     the normalizing scalars as literals is both the fix and what a
  *     production pipeline does with a trained model anyway.
  *   - scoring joins per-doc DISTINCT bigrams (with multiplicity `m`)
  *     against the model — within-doc repetition never inflates the
  *     shuffle; the model is vocabulary-sized and AQE broadcasts it
  *     when it fits (not forced: a web-scale vocabulary may not).
  *   - Everything is built-in codegen'd expressions; determinism comes
  *     from exact integer counts — the only floats are the final ln/avg,
  *     rounded to 6 on both engines (the collected normalizers are the
  *     same doubles the old in-plan aggregates produced).
  */
object LmScore {

  /** Adjacent-token bigram array ("w1 w2" strings); empty below 2 tokens. */
  def bigramsOf(t: Column): Column =
    when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))

  /** Corpus bigram model: (bg, w1, c_bg) — one row per distinct bigram. */
  def bigramCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(bigramsOf(TextFunctions.tokens(col(textCol)))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every RAW doc by
    * how target-like its bigram distribution is,
    *
    *   logw(doc) = (1/N) Σ_bg m · [ ln p̂_t(bg) − ln p̂_r(bg) ]
    *
    * with bag-of-bigram models and add-one smoothing over the JOINT
    * vocabulary V (p̂(bg) = (c+1)/(C+V)), so target-unseen bigrams score
    * finitely. High logw = target-like (select first); the 1/N
    * normalization makes weights length-invariant.
    *
    * Scale shape: the raw corpus is exploded once into the same
    * (id, bg, m) table scoreDocs uses; raw model counts DERIVE from it;
    * the target model is one aggregation of the (small, curated) target
    * set; the three scalars (V, C_t, C_r) are read off the trained
    * model once and pinned as literals in the scoring plan.
    *
    * The model — the full-outer (bg → c_r, c_t) count table — is
    * persisted (MEMORY_AND_DISK) and materialized by the scalar read,
    * so training runs exactly once however many plan branches consume
    * it; the handle stays cached for the life of the returned frame
    * (vocab-sized — the trained-artifact class of state, same posture
    * as the IVF centroids and PQ codebooks).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val perDoc = raw.select(col(idCol).as("id"),
        explode(bigramsOf(TextFunctions.tokens(col(textCol)))).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("m"))
    val rc = perDoc.groupBy("bg").agg(sum("m").as("c_r"))
    val tc = target
      .select(explode(bigramsOf(TextFunctions.tokens(col(textCol)))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_t"))
    val model = graft.operators.Artifacts.pin(
      rc.join(tc, Seq("bg"), "full_outer").na.fill(0L, Seq("c_r", "c_t")),
      "dsir.model") // lazy pin: the scalar head() below materializes it
    // One bounded read trains + materializes the model and yields the
    // three normalizers (joint vocab size V = model row count; total
    // masses C_r, C_t). Empty-input guard: sums are null over 0 rows.
    val row = model.agg(count(lit(1)).cast("double").as("v"),
      coalesce(sum("c_r"), lit(0L)).cast("double").as("tot_r"),
      coalesce(sum("c_t"), lit(0L)).cast("double").as("tot_t")).head()
    val (v, totR, totT) = (row.getDouble(0), row.getDouble(1),
      row.getDouble(2))
    // Inner join: every scored bigram exists in rc, hence in the model.
    perDoc
      .join(model, "bg")
      .withColumn("term",
        col("m") * (log((col("c_t") + 1.0) / lit(totT + v))
          - log((col("c_r") + 1.0) / lit(totR + v))))
      .groupBy("id")
      .agg(sum("m").as("n_bigrams"),
        round(sum(col("term")) / sum(col("m")), 6).as("logw"))
  }

  /** Per-document (id, n_bigrams, avg_nll) under the corpus's own bigram
    * model (self-scoring: every observed bigram has count ≥ 1, so no
    * smoothing term is needed; a train/score split would add one).
    */
  def scoreDocs(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val perDoc = docs.select(col(idCol).as("id"),
        explode(bigramsOf(TextFunctions.tokens(col(textCol)))).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("m"))
    // The MODEL — (bg, c_bg, c_ctx), context counts pre-folded by a
    // vocab-sized w1 self-join — is the trained artifact: persisted and
    // eagerly materialized, so (a) training runs exactly ONCE however
    // many branches consume it (the lazy formulation re-exploded the
    // corpus once per consumer — round-13 plan audit), (b) the corpus-
    // sized scoring frame joins once on bg and never re-shuffles on w1,
    // and (c) the scoring join plans against the cache's MEASURED size,
    // not an estimate (persisting only `bg` and joining ctx in-plan
    // made Catalyst misestimate bg ⋈ ctx as broadcastable and build a
    // multi-million-row hash relation on the driver — 2× slower at
    // diversify-30× than the SMJ the true size calls for).
    // The interim bg cache exists only while the model builds.
    val bg = perDoc.groupBy("bg").agg(sum("m").as("c_bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .persist(graft.operators.Artifacts.Level)
    val model = graft.operators.Artifacts.pinEager(
      bg.join(bg.groupBy("w1").agg(sum("c_bg").as("c_ctx")), "w1"),
      "lm.bigram_model") // train once; scoring below reads the cache
    bg.unpersist(false)
    perDoc.join(model, "bg")
      .withColumn("nll", -log(col("c_bg").cast("double") / col("c_ctx")))
      .groupBy("id")
      .agg(sum(col("m")).as("n_bigrams"),
        round(sum(col("m") * col("nll")) / sum(col("m")), 6).as("avg_nll"))
  }
}
