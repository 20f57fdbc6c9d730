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
  *   - ONE corpus pass: explode → (doc, bigram) keyed aggregation with
  *     map-side partials; corpus bigram counts derive from that table
  *     (c_bg = Σ m) and context counts from the bigram counts — the raw
  *     token stream is never shuffled twice;
  *   - scoring joins per-doc DISTINCT bigrams (with multiplicity `m`)
  *     against the count table — within-doc repetition never inflates the
  *     shuffle; the context table is vocabulary-sized and AQE broadcasts
  *     it when it fits (not forced: a web-scale vocabulary may not).
  *   - Everything is built-in codegen'd expressions; determinism comes
  *     from exact integer counts — the only floats are the final ln/avg,
  *     rounded to 6 on both engines.
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
    * set; the three scalars (V, C_t, C_r) broadcast as a 1-row frame.
    * No shuffle touches raw text twice.
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
    val consts = rc.select("bg").unionByName(tc.select("bg")).distinct()
      .agg(count(lit(1)).cast("double").as("v"))
      .crossJoin(broadcast(rc.agg(sum("c_r").cast("double").as("tot_r"))))
      .crossJoin(broadcast(tc.agg(sum("c_t").cast("double").as("tot_t"))))
    perDoc
      .join(rc, "bg")
      .join(tc, Seq("bg"), "left")
      .na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(consts))
      .withColumn("term",
        col("m") * (log((col("c_t") + 1.0) / (col("tot_t") + col("v")))
          - log((col("c_r") + 1.0) / (col("tot_r") + col("v")))))
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
    // corpus counts DERIVE from the per-doc table (c_bg = Σ m), so the
    // raw corpus is scanned and exploded exactly once and the (id, bg)
    // aggregation exchange is shared by both consumers
    val bg = perDoc.groupBy("bg").agg(sum("m").as("c_bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val ctx = bg.groupBy("w1").agg(sum("c_bg").as("c_ctx"))
    perDoc.join(bg, "bg")
      .join(ctx, "w1")
      .withColumn("nll", -log(col("c_bg").cast("double") / col("c_ctx")))
      .groupBy("id")
      .agg(sum(col("m")).as("n_bigrams"),
        round(sum(col("m") * col("nll")) / sum(col("m")), 6).as("avg_nll"))
  }
}
