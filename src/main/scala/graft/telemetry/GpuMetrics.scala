package graft.telemetry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Richer GPU-level metrics — the reference's "Richer GPU-Level Metrics"
  * future-work sketch (README.md: simulate GPU memory / power /
  * temperature / error counts, then build gold tables for hot/throttled
  * GPUs and error spikes per day). The public trace carries none of
  * these (the reference's own stated limitation), so they are SIMULATED
  * as deterministic functions of the fields that do exist — same policy
  * as the efficiency marts' day-grain approximation (Marts.scala).
  *
  * Simulation rules (engine-independent, so the DuckDB oracle replays
  * them bit-for-bit):
  *  - temp_c        = 30 + 0.45 × util   (idle floor + load-proportional)
  *  - power_w       = 80 + 2.2  × util
  *  - mem_used_pct  = min(100, 1.1 × util)
  *  - throttled     = util > 85          (thermal-limit proxy)
  *  - ecc_errors    = first hex digit of md5(machine:event) — 'f' → 3,
  *                    'e' → 1, else 0 (rare pseudo-random bursts, ~6%
  *                    of samples each, reproducible on any engine with
  *                    md5)
  *
  * Scale: enrich is a narrow per-row projection (no shuffle, stays in
  * whole-stage codegen — md5 is a built-in codegen'd expression).
  * hotGpus is one hash aggregation on machine_id; errorSpikesDaily is
  * one aggregation on day plus a window over the day rows (one row per
  * DAY — the single-partition exchange carries ~365 rows/year, nothing).
  */
object GpuMetrics {

  /** Append the simulated metric columns. `utilCol` rows with NULL util
    * get NULL derived metrics (ecc is util-independent and never null).
    */
  def enrich(df: DataFrame, machineCol: String, eventCol: String,
             utilCol: String): DataFrame = {
    val util: Column = col(utilCol)
    // one md5 per row, guaranteed: both ecc branches test the same hoisted
    // digit (relying on codegen subexpression elimination to fuse two
    // md5(...) copies works but is not a contract)
    val eccDigit = substring(md5(concat(col(machineCol), lit(":"),
      col(eventCol).cast("string"))), 1, 1)
    df.withColumn("temp_c", lit(30.0) + lit(0.45) * util)
      .withColumn("power_w", lit(80.0) + lit(2.2) * util)
      .withColumn("mem_used_pct", least(lit(100.0), lit(1.1) * util))
      .withColumn("throttled", (util > 85).cast("int"))
      .withColumn("_ecc_digit", eccDigit)
      .withColumn("ecc_errors",
        when(col("_ecc_digit") === "f", 3)
          .when(col("_ecc_digit") === "e", 1)
          .otherwise(0))
      .drop("_ecc_digit")
  }

  /** gold_hot_gpus: per-machine thermal/throttle profile, kept only for
    * machines that are hot (average temp above `hotTempC`) or throttled
    * (fraction of throttled samples above `throttleRate`). One hash
    * aggregation; the flags ride the aggregate, so no second pass.
    */
  def hotGpus(enriched: DataFrame, machineCol: String,
              hotTempC: Double = 56.0,
              throttleRate: Double = 0.2): DataFrame =
    enriched
      .filter(col("temp_c").isNotNull)
      .groupBy(col(machineCol).as("machine_id"))
      .agg(
        count(lit(1)).as("n_samples"),
        round(avg("temp_c"), 6).as("avg_temp_c"),
        round(max("temp_c"), 6).as("max_temp_c"),
        round(avg("power_w"), 6).as("avg_power_w"),
        round(avg(col("throttled").cast("double")), 6).as("throttle_rate"))
      .withColumn("is_hot", (col("avg_temp_c") > hotTempC).cast("int"))
      .withColumn("is_throttled",
        (col("throttle_rate") > throttleRate).cast("int"))
      .filter(col("is_hot") === 1 || col("is_throttled") === 1)

  /** gold_error_spikes_daily: days whose simulated ECC total sits more
    * than one population-stddev above the mean daily total — an
    * adaptive spike rule (a fixed multiple of the mean stops firing as
    * the day totals concentrate at larger data volumes).
    */
  def errorSpikesDaily(enriched: DataFrame, tsCol: String): DataFrame = {
    val daily = enriched
      .select(to_date(date_trunc("day", col(tsCol))).as("dt"),
        col("ecc_errors"))
      .groupBy("dt")
      .agg(
        sum("ecc_errors").as("total_ecc"),
        count(when(col("ecc_errors") > 0, 1)).as("err_events"))
    val w = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    daily
      .withColumn("_mu", avg("total_ecc").over(w))
      .withColumn("_sd", stddev_pop("total_ecc").over(w))
      .filter(col("total_ecc") > col("_mu") + col("_sd"))
      .select("dt", "total_ecc", "err_events")
  }
}
