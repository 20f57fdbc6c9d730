package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * check an ONGOING ingestion pipeline runs per batch: "did today's
  * crawl (or my new filter) shift the length/quality/score
  * distribution?" The standard metric is the Population Stability
  * Index: PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref), read
  * against the conventional thresholds (< 0.1 stable, 0.1-0.25 drifting,
  * > 0.25 shifted).
  *
  * Bins are EXPLICIT split bounds, not quantiles: quantile bins would
  * make the bin edges themselves data-dependent, so two engines (or two
  * runs) could disagree about the binning before drift is even
  * measured. Fixed edges keep the metric a pure function of the data.
  *
  * Scale shape: one partial-aggregating count per side keyed by the
  * (tiny) bin id, a single-partition fraction normalization over ≤
  * |splits|+1 rows, and a bin-keyed outer join — the corpus itself
  * never sorts, pairs, or re-shuffles. Drift monitoring at 100 TB costs
  * two scans.
  */
object Drift {

  /** Bin id of `v` under `splits`: number of splits ≤ v (bin 0 is
    * (-∞, s₀), bin |splits| is [s_last, ∞)). A when-chain over literal
    * bounds — codegen'd, branch-predictable, engine-portable.
    */
  def binOf(v: Column, splits: Seq[Double]): Column =
    splits.map(s => when(v >= s, 1).otherwise(0))
      .reduce(_ + _)

  /** Per-bin fractions of `df`'s `valueCol` under `splits`, as
    * (bin, <alias>). NULL values are EXCLUDED from the distribution — a
    * null is a data-quality breakage, not a small number; silently
    * binning nulls low would make the monitor misread a broken column
    * as a shift toward bin 0 (count nulls separately via Checks).
    * Public so a standing monitor can compute its reference side ONCE
    * and reuse it per batch (see StreamingTelemetry.streamDrift).
    */
  def binFracs(df: DataFrame, valueCol: String, splits: Seq[Double],
               alias: String): DataFrame = {
    require(splits.nonEmpty && splits == splits.sorted,
      s"splits must be non-empty ascending: $splits")
    df.filter(col(valueCol).isNotNull)
      .select(binOf(col(valueCol), splits).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      // ≤ |splits|+1 rows reach this empty-frame window — the single
      // partition it implies is by construction harmless
      .withColumn(alias,
        col("n") / sum("n").over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("bin"), col(alias))
  }

  /** Drift table from PRECOMPUTED fraction frames (bin, rf) / (bin, cf):
    * (bin, ref_frac, cur_frac, psi_term), fractions floored at `eps`
    * (so a bin empty on one side contributes a finite term), every
    * number rounded to 6 places. Total PSI = sum(psi_term).
    */
  def psiOf(rf: DataFrame, cf: DataFrame,
            eps: Double = 1e-6): DataFrame =
    rf.join(cf, Seq("bin"), "full_outer")
      .select(col("bin"),
        greatest(coalesce(col("rf"), lit(0.0)), lit(eps)).as("rf"),
        greatest(coalesce(col("cf"), lit(0.0)), lit(eps)).as("cf"))
      .select(col("bin"),
        round(col("rf"), 6).as("ref_frac"),
        round(col("cf"), 6).as("cur_frac"),
        round((col("cf") - col("rf")) * log(col("cf") / col("rf")), 6)
          .as("psi_term"))
      .orderBy("bin")

  /** Per-bin drift table between `ref` and `cur` on `valueCol` — the
    * one-shot batch form of binFracs + psiOf.
    */
  def psiBins(ref: DataFrame, cur: DataFrame, valueCol: String,
              splits: Seq[Double], eps: Double = 1e-6): DataFrame =
    psiOf(binFracs(ref, valueCol, splits, "rf"),
      binFracs(cur, valueCol, splits, "cf"), eps)
}
