package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines.
  *
  * RNG-based `df.sample` changes membership with partitioning, Spark
  * version, and engine — poison for dataset lineage. These operators
  * decide membership from a salted md5 of the row's ID: the same row is
  * in or out forever, on any engine (the DuckDB oracle reproduces the
  * exact sample), and downstream incremental runs see a stable
  * membership function. This is the standard "hash-mod" systematic
  * sampling used for corpus subsets and train/eval splits.
  *
  * Bucket = first 8 md5 hex digits of (salt:id) as an int, mod 10000
  * (basis-point granularity). All narrow, codegen'd, shuffle-free.
  */
object Sampling {

  private val buckets = 10000

  /** First 8 md5 hex digits of (salt:id) as a uint32-ranged long — the
    * one canonical raw draw every sampler here derives from (the DuckDB
    * oracles mirror this exact formulation).
    */
  private[graft] def hash32(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"),
      id.cast("string"))), 1, 8), 16, 10).cast("long")

  /** 0..9999 bucket for a row id. */
  def bucket(id: Column, salt: String): Column =
    pmod(hash32(id, salt), lit(buckets))

  /** Keep ~fraction of rows, deterministically by id. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          salt: String = "graft"): DataFrame =
    df.filter(bucket(col(idCol), salt) < (fraction * buckets).toInt)

  /** Stratified deterministic sample: per-stratum fractions (default
    * keeps strata not listed). One narrow filter — no shuffle, no
    * per-stratum passes.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0,
                       salt: String = "graft"): DataFrame = {
    val b = bucket(col(idCol), salt)
    val threshold = fractions.foldLeft(
      lit((defaultFraction * buckets).toInt)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit((f * buckets).toInt)).otherwise(acc)
    }
    df.filter(b < threshold)
  }

  /** Disjoint train/eval split by id hash: (train, eval) with
    * evalFraction of the id space in eval. Stable under appends — a row
    * never migrates between splits.
    */
  def trainEvalSplit(df: DataFrame, idCol: String, evalFraction: Double,
                     salt: String = "graft-split"): (DataFrame, DataFrame) = {
    val b = bucket(col(idCol), salt)
    val cut = (evalFraction * buckets).toInt
    (df.filter(b >= cut), df.filter(b < cut))
  }

  /** Temperature-scaled mixture fractions: per-key sampling rates that
    * flatten a skewed corpus toward `alpha` (the mT5/XLM-R temperature
    * knob — target share ∝ natural share^alpha; alpha 1 keeps the
    * natural mix, alpha → 0 approaches uniform). Down-sampling only:
    * f_key = (w_min / w_key)^(1-alpha), so the smallest key keeps
    * everything and heavy keys are cut toward the flattened target.
    * Returns (key, fraction rounded to 4 decimals as an integer
    * basis-point threshold) for `bucket(...) < thr` membership.
    *
    * Cross-engine reproducibility: at the default alpha = 0.5 the rate
    * is sqrt(w_min/w) — IEEE sqrt is correctly rounded, so DuckDB and
    * the JVM agree bit-for-bit and the oracle reproduces the EXACT
    * sample. Other alphas go through pow (libm, last-bit variance);
    * fine in production, not oracle-grade.
    */
  def temperatureThresholds(df: DataFrame, keyCol: String,
                            weightCol: String, alpha: Double = 0.5)
      : DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    // a key with zero total weight has nothing to contribute AND would
    // poison every other key's rate (w_min = 0 ⇒ all fractions 0, the
    // whole corpus silently dropped) — excluded before the min
    val totals = df.groupBy(keyCol)
      .agg(sum(col(weightCol)).cast("double").as("__w"))
      .filter(col("__w") > 0)
    val ratio = col("__w_min") / col("__w")
    val frac = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    totals
      .crossJoin(broadcast(totals.agg(min("__w").as("__w_min"))))
      // floor of a sub-basis-point rate is 0 = "key silently excluded",
      // which breaches the down-sampling-only contract — clamp to ≥ 1
      // (a pathologically heavy key keeps at least 1 bp of its rows)
      .select(col(keyCol),
        greatest(floor(round(frac, 6) * buckets), lit(1L))
          .cast("long").as("thr"))
  }

  /** Apply temperatureThresholds as a deterministic hash-mod filter. */
  def temperatureSample(df: DataFrame, idCol: String, keyCol: String,
                        weightCol: String, alpha: Double = 0.5,
                        salt: String = "temp"): DataFrame =
    df.join(broadcast(temperatureThresholds(df, keyCol, weightCol, alpha)),
        keyCol)
      .filter(bucket(col(idCol), salt) < col("thr"))

  /** Dedup-aware train/eval split: membership hashes the doc's duplicate
    * CLUSTER, not the doc itself, so near-duplicates always land in the
    * same split. The plain `trainEvalSplit` silently leaks here — two
    * near-identical docs hash independently, one lands in train and one
    * in eval, and the model is scored on paraphrases of its own training
    * data. `pairs` is any near-dup pair set (ida, idb) from the dedup
    * family above; singleton docs keep their own id as the group label,
    * which degrades to exactly `trainEvalSplit` when `pairs` is empty.
    * Same append-stability as the other samplers, with one addition: a
    * NEW doc that duplicates an existing one joins that doc's split.
    *
    * Cost on top of the hash filter: the components run over the pair
    * graph (tiny next to the corpus — only docs WITH a near-dup appear)
    * and one join of the corpus against that label table.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       evalFraction: Double, salt: String = "graft-split")
      : (DataFrame, DataFrame) = {
    // memoized like every other clustering consumer (round 19): labels
    // are a pure function of the pair frame, and the pair frames the
    // split callers pass are pinned artifacts — a bench loop re-running
    // this split was re-paying the whole component iteration per pass
    // while the funnel/clean/cluster family read the session memo
    val comp = graft.dedup.Components.memoizedComponents(pairs)
      .select(col("id").as(idCol), col("component").as("__grp0"))
    val originalCols = df.columns.toIndexedSeq.map(col)
    val labeled = df.join(comp, Seq(idCol), "left")
      .withColumn("__grp", coalesce(col("__grp0"), col(idCol)))
    val b = bucket(col("__grp"), salt)
    val cut = (evalFraction * buckets).toInt
    // the using-join hoists idCol to the front; restore the caller's
    // column order so this is a drop-in for trainEvalSplit
    (labeled.filter(b >= cut).select(originalCols: _*),
      labeled.filter(b < cut).select(originalCols: _*))
  }

  /** Per-key cap — the corpus-balancing step that keeps at most `k` rows
    * per key, preferring by `ord` (e.g. quality desc with an id
    * tiebreak for determinism). This is the web-pipeline "cap every
    * domain at N pages" guard: without it a single boilerplate-heavy
    * domain dominates the training mixture no matter how the sampling
    * weights are set.
    *
    * One hash exchange on the key, then a per-partition window — rows
    * beyond the cap never survive the filter. Skew note: a
    * pathologically hot key sorts inside one partition; if a key's row
    * count can exceed partition memory, route through the bounded-heap
    * `plans.TopKPerKey` operator instead (same semantics, O(k) state) —
    * this window form is the composable default because it accepts an
    * arbitrary ordering and keeps all columns.
    */
  def capPerKey(df: DataFrame, keyCol: String, k: Int,
                ord: Column*): DataFrame = {
    require(ord.nonEmpty, "capPerKey needs a deterministic ordering")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-key TOKEN budget — the mixture knob training recipes actually
    * turn: each source contributes at most `budget` tokens (not docs),
    * because loss is paid per token and a source of 10-page documents
    * otherwise outweighs a source of tweets at equal doc caps. Greedy
    * prefix in `ord` order: a doc is kept iff the tokens consumed BEFORE
    * it are under budget, so the last kept doc may overshoot (standard
    * fill-to-budget; an under-fill variant is `<= budget - weight`).
    * Keep `ord` a deterministic hash (e.g. `bucket(id, salt)` with an id
    * tiebreak) and membership is engine- and append-stable like every
    * sampler here.
    *
    * Same plan shape as capPerKey — one hash exchange on the key, one
    * running-sum window — and the same skew note: this must stay a
    * window (the cut depends on a running sum, not a rank), so a key
    * whose rows exceed partition memory needs a pre-cap by capPerKey
    * with k ≈ budget / min-plausible-doc-tokens first.
    */
  def tokenBudgetPerKey(df: DataFrame, keyCol: String, weightCol: String,
                        budget: Long, ord: Column*): DataFrame = {
    require(ord.nonEmpty, "tokenBudgetPerKey needs a deterministic ordering")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .filter(col("__cum") - col(weightCol) < budget)
      .drop("__cum")
  }

  /** Deterministic weighted sampling WITHOUT replacement: k rows per key
    * with inclusion driven by `weightCol` — the Efraimidis-Spirakis
    * exponential race (IPL 2006). Each row draws u ∈ (0,1] from its
    * salted md5 (engine- and run-stable like every sampler here) and
    * races with score = −ln(u)/w; the k smallest scores per key win,
    * which is distributed exactly as k sequential weighted draws without
    * replacement.
    *
    * Scale: a race only needs a bounded top-k per key, so this rides the
    * TopKPerKey bounded-heap operator (map-side partial heaps, one
    * exchange carrying ≤ k rows per key per task) — never a full per-key
    * window sort. Cross-engine determinism: +,−,×,÷ are IEEE-exact on
    * both engines; ln is the one libm call (≤ 1 ulp), so the score is
    * rounded to 9 dp on BOTH sides with the id as tiebreak.
    *
    * Output = input columns plus the winning `score`. Rows with
    * non-positive weight are dropped before the race — the exponential
    * race is only defined for w > 0 (w ≤ 0 would otherwise produce
    * scores of ∓Infinity/NaN that deterministically steal or forfeit a
    * seat instead of failing loudly).
    */
  def weightedSamplePerKey(df: DataFrame, keyCol: String, idCol: String,
                           weightCol: String, k: Int,
                           salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (hash32(col(idCol), salt) + lit(1L)) / lit(4294967296.0) // (0, 1]
    val scored = df.filter(col(weightCol) > 0).withColumn("__score",
      round(-log(u) / col(weightCol).cast("double"), 9))
    graft.plans.TopKPerKey.perKey(scored, Seq(keyCol),
        Seq(("__score", true), (idCol, true)), k)
      .withColumnRenamed("__score", "score")
  }
}
