package graft.text

import graft.functions.TextHashExpressions.hashFeatureSum
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style hashed-feature linear quality classifier — the
  * model-based document filter (Joulin et al. 2016, "Bag of Tricks for
  * Efficient Text Classification") LLM curation pipelines run beside the
  * rule-based `qualityScore`: train on a labeled sample, score the whole
  * corpus, keep what clears a threshold.
  *
  * Features are token occurrences hashed into `dim` buckets with the
  * repo-wide engine-independent md5 draw (first 8 hex digits mod dim) so
  * the full train→score path has an exact DuckDB twin. Weights are the
  * closed-form Naive Bayes log-odds with add-alpha smoothing —
  *
  *   w_b = ln((c⁺_b + α) / (C⁺ + α·dim)) − ln((c⁻_b + α) / (C⁻ + α·dim))
  *
  * — the classic linear-classifier baseline (NB-SVM's NB component,
  * Wang & Manning 2012): one distributed pass to fit, no iterative
  * optimizer, and deterministic from exact integer counts (the only
  * floats are the two ln calls, rounded to 9 dp at the weight level).
  * A doc's score is the sigmoid of its mean token weight.
  *
  * Scale shape:
  *   - fit is ONE explode → (bucket)-keyed aggregation with map-side
  *     partials — linear in corpus token count, never a pair join; the
  *     two class totals broadcast as a 1-row frame.
  *   - the model is `dim` doubles — driver- and broadcast-safe BY
  *     CONSTRUCTION (that is the point of the hashing trick); scoring is
  *     one codegen'd static call per document with the weight table
  *     riding the codegen references, so the 100-TB corpus pass has no
  *     shuffle, no join, and no per-token expression interpretation.
  */
object HashClassifier {

  /** md5 feature bucket of a token — Column twin of the native scorer's
    * bucketing (and of the DuckDB oracle's).
    */
  def bucketOf(tok: Column, dim: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(dim))

  /** Fit NB log-odds weights over md5-hashed token buckets.
    *
    * `labelCol` must be boolean (true = positive class). Returns one row
    * per OCCUPIED bucket: (bucket, c_pos, c_neg, weight) — buckets no
    * training token hashed to are absent; `collectWeights` fills them
    * with the all-smoothing default.
    */
  def fit(docs: DataFrame, textCol: String, labelCol: String,
          dim: Int = 256, alpha: Double = 1.0): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val occ = docs
      .select(col(labelCol).as("pos"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("pos"), bucketOf(col("tok"), dim).as("bucket"))
    val counts = occ.groupBy("bucket").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("c_neg"))
    val totals = counts.agg(
      sum("c_pos").as("t_pos"), sum("c_neg").as("t_neg"))
    counts.crossJoin(broadcast(totals))
      .withColumn("weight", nbWeight(
        col("c_pos"), col("c_neg"), col("t_pos"), col("t_neg"), dim, alpha))
      .select("bucket", "c_pos", "c_neg", "weight")
  }

  private def nbWeight(cPos: Column, cNeg: Column, tPos: Column,
                       tNeg: Column, dim: Int, alpha: Double): Column =
    round(
      log((cPos + alpha) / (tPos + alpha * dim)) -
        log((cNeg + alpha) / (tNeg + alpha * dim)), 9)

  /** Materialize the fitted weights as the dense `dim`-sized model the
    * native scorer binds. Missing buckets get the all-smoothing default
    * weight ln(α/(C⁺+α·dim)) − ln(α/(C⁻+α·dim)). The collect is
    * model-sized (dim doubles), not data-sized — safe at any corpus
    * scale.
    */
  def collectWeights(weights: DataFrame, dim: Int,
                     alpha: Double = 1.0): Array[Double] = {
    val rows = weights.select("bucket", "c_pos", "c_neg", "weight").collect()
    val tPos = rows.map(_.getLong(1)).sum
    val tNeg = rows.map(_.getLong(2)).sum
    val default = math.rint(
      (math.log(alpha / (tPos + alpha * dim)) -
        math.log(alpha / (tNeg + alpha * dim))) * 1e9) / 1e9
    val w = Array.fill(dim)(default)
    rows.foreach(r => w(r.getLong(0).toInt) = r.getDouble(3))
    w
  }

  /** Score every document: sigmoid of the mean token weight, rounded to
    * 9 dp (token-order summation in the native expression matches the
    * oracle's in-order list_sum). Token-less docs score sigmoid(0) = 0.5.
    */
  def score(docs: DataFrame, textCol: String, weights: Array[Double],
            scoreCol: String = "q_score"): DataFrame = {
    val t = TextFunctions.tokens(col(textCol))
    val mean = when(size(t) > 0, hashFeatureSum(t, weights) / size(t))
      .otherwise(lit(0.0))
    docs.withColumn(scoreCol, round(lit(1.0) / (lit(1.0) + exp(-mean)), 9))
  }
}
