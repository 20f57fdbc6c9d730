package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persisted, mergeable distinct-count sketches (Apache DataSketches HLL —
  * the `hll_sketch_agg` / `hll_union_agg` surface Spark ships since 3.5).
  *
  * `approx_count_distinct` (q_approx_distinct) answers ONE query in one
  * pass; its HLL++ state is internal and dies with the job. The pattern
  * that survives 100 TB is the SKETCH MART: aggregate each day's raw data
  * once into a tiny table of binary sketches, persist it, and answer every
  * later rollup (per-week, per-type, grand-total distinct users) by
  * UNIONING sketches — never rescanning raw data. The union is lossless
  * with respect to the sketch state (register-wise max), so a rollup over
  * daily sketches carries exactly the error bound of a single sketch built
  * over the whole period: ~1.04/sqrt(2^lgK) relative standard error.
  *
  * Reference scope: gpu-telemetry-lakehouse publishes daily gold marts
  * (the models/gold SQL files) and recomputes them by full refresh; a distinct-user
  * rollup there would rescan bronze. This module is the incremental twin:
  * fine-grain sketches written once per day, coarse grains derived without
  * touching the fact table again.
  */
object Sketches {

  /** Fine-grain sketch mart: one row per `grainCols` group carrying a
    * binary HLL sketch of `keyCol` plus the exact row count. This is the
    * table you PERSIST (the sketch column round-trips parquet BINARY —
    * SketchSpec pins the round-trip bit-exactly). Size: #groups ×
    * (~2^lgK bytes) — for 365 days × 100 event types at lgK=12 that is
    * ~150 MB standing in for petabytes of raw events.
    */
  def hllMart(df: DataFrame, grainCols: Seq[String], keyCol: String,
              lgK: Int = 12): DataFrame =
    df.groupBy(grainCols.map(col): _*)
      .agg(
        hll_sketch_agg(col(keyCol), lit(lgK)).as("hll"),
        count(lit(1)).as("n_rows"))

  /** Roll a sketch mart up to a coarser grain — groupBy the surviving
    * dims, union the sketches, sum the counts. Input is the mart, NOT the
    * raw data: at 100 TB this job reads megabytes. `hll_union_agg` is a
    * partial-aggregable Catalyst aggregate, so the merge itself map-side
    * combines like any sum.
    */
  def rollupMart(mart: DataFrame, toCols: Seq[String]): DataFrame =
    mart.groupBy(toCols.map(col): _*)
      .agg(
        hll_union_agg(col("hll"), lit(false)).as("hll"),
        sum(col("n_rows")).as("n_rows"))

  /** Read the estimate off a sketch column (usable on the mart or any
    * rollup of it).
    */
  def estimate(sketchCol: Column): Column =
    hll_sketch_estimate(sketchCol).cast("long")

  /** UNIFIED mart rollup — the one entry point over all three sketch
    * mart families, dispatched on the mart's signature column:
    *
    *  - `hll` (binary)          → HLL union ([[rollupMart]])
    *  - `kmv` (array<long>)     → k-min merge ([[Kmv.rollup]]) at the
    *    mart's own build-k, read from the persisted `kmv_k` column via
    *    a bounded 1-row aggregate — an EAGER action, which is why the
    *    KMV arm requires a PERSISTED/MATERIALIZED mart: on a still-lazy
    *    mart frame the read would re-run the whole mart build (call
    *    Kmv.rollup with an explicit k there), and on a streaming frame
    *    it is illegal (guarded below — streaming maintenance goes
    *    through the StreamingTelemetry sinks);
    *  - `bin` + `n`             → histogram bin-count sum
    *    ([[Quantiles.rollup]]).
    *
    * Anything else fails loudly. The family-specific entry points stay
    * public (streaming sinks and k-overriding callers need them); this
    * is the read-side abstraction that makes "a persisted sketch mart"
    * one concept at the query surface.
    */
  def rollup(mart: DataFrame, toCols: Seq[String]): DataFrame = {
    val cols = mart.columns.toSet
    if (cols.contains("hll")) rollupMart(mart, toCols)
    else if (cols.contains("kmv")) {
      require(!mart.isStreaming,
        "Sketches.rollup: the KMV arm reads the mart's build-k eagerly, " +
          "which a streaming frame cannot do — use Kmv.rollup with an " +
          "explicit k, or the StreamingTelemetry mart sinks")
      require(cols.contains("kmv_k"),
        "Sketches.rollup: KMV mart lacks its kmv_k build-k column — " +
          "rebuilt marts carry it; for a legacy mart call Kmv.rollup " +
          "with the build-k explicitly")
      // getAs[Number]: kmv_k is IntegerType when Kmv.mart built it, but
      // an externally-written or schema-merged mart may have widened it
      // to BIGINT — dispatch must tolerate integral widening, not throw
      // ClassCastException where the k<=build-k contract would have held
      val k = mart.agg(coalesce(min(col("kmv_k")), lit(2)))
        .collect()(0).getAs[Number](0).intValue()
      Kmv.rollup(mart, toCols, k)
    } else if (cols.contains("bin") && cols.contains("n"))
      Quantiles.rollup(mart, toCols)
    else throw new IllegalArgumentException(
      s"Sketches.rollup: unrecognized mart schema [${mart.columns.mkString(", ")}] " +
        "— expected an hll, kmv(+kmv_k), or bin/n mart")
  }
}
