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

  /** Precision/recall sweep over an integer-percent threshold grid on a
    * LABELED holdout, per key (typically `source` — each source gets its
    * own operating point because score distributions differ by source).
    * This is the calibration step between `score` and the keep-filter /
    * `capPerKey` / `tokenBudgetPerKey` stages: nothing in fit/score picks
    * the threshold, this does.
    *
    * Grid thresholds are INTEGER percents (`stepPct until 100 by
    * stepPct`) compared as `score >= thr_pct/100.0` — integer grid rows
    * hash/join exactly across engines where a float grid (0.05·i) would
    * drift in the last ulp. One row per (key, thr_pct) with confusion
    * counts and rounded precision/recall/F1 (F1 computed directly as
    * 2tp/(2tp+fp+fn) — a single rounding, not a composition of the
    * already-rounded precision/recall). Zero denominators clamp to 1
    * (count frames, so 0/1 = 0, never null/NaN).
    *
    * Scale shape: the explode multiplies the holdout by |grid| (≤ 99,
    * a constant) and feeds one (key, thr)-keyed aggregation with map-side
    * partials — linear in holdout size, no window, no pair join. The
    * holdout is the SMALL labeled slice, not the corpus.
    */
  def thresholdSweep(scored: DataFrame, keyCol: String, labelCol: String,
                     scoreCol: String = "q_score",
                     stepPct: Int = 5): DataFrame = {
    require(stepPct >= 1 && stepPct < 100,
      s"stepPct must be in [1, 99], got $stepPct")
    val grid = (stepPct until 100 by stepPct).toArray
    val keep = col("__s") >= col("thr_pct").cast("double") / lit(100.0)
    // Null labels/scores are EXCLUDED up front: a null in either column
    // would fall through every when() to otherwise(0) in tp, fp, AND fn
    // alike, silently breaking the tp+fn = |positives| partition the
    // sweep's consumers (and PropertySpec) rely on. Excluding the row
    // keeps the invariant exact over the labeled-and-scored population.
    scored
      .filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(keyCol), col(labelCol).as("__pos"),
        col(scoreCol).as("__s"))
      .withColumn("thr_pct", explode(lit(grid)))
      .groupBy(col(keyCol), col("thr_pct"))
      .agg(
        sum(when(col("__pos") && keep, 1L).otherwise(0L)).as("tp"),
        sum(when(!col("__pos") && keep, 1L).otherwise(0L)).as("fp"),
        sum(when(col("__pos") && !keep, 1L).otherwise(0L)).as("fn"))
      .withColumn("precision",
        round(col("tp") / greatest(col("tp") + col("fp"), lit(1L)), 6))
      .withColumn("recall",
        round(col("tp") / greatest(col("tp") + col("fn"), lit(1L)), 6))
      .withColumn("f1", round(lit(2L) * col("tp") /
        greatest(lit(2L) * col("tp") + col("fp") + col("fn"), lit(1L)), 6))
  }

  /** Pick each key's operating point from a `thresholdSweep` frame: the
    * max-F1 row, ties broken toward the LOWEST threshold (keep more data
    * when quality is indistinguishable). Window-free on purpose — the
    * per-key maxima are tiny aggregates joined back by explicit
    * broadcast, so the plan holds at any key cardinality without a
    * per-key sort.
    */
  def bestThresholds(sweep: DataFrame, keyCol: String): DataFrame = {
    val bestF1 = sweep.groupBy(keyCol).agg(max("f1").as("__best_f1"))
    val cand = sweep.join(broadcast(bestF1), Seq(keyCol))
      .filter(col("f1") === col("__best_f1"))
    val minThr = cand.groupBy(keyCol).agg(min("thr_pct").as("__thr"))
    cand.join(broadcast(minThr), Seq(keyCol))
      .filter(col("thr_pct") === col("__thr"))
      .select(keyCol, "thr_pct", "tp", "fp", "fn",
        "precision", "recall", "f1")
  }
}
