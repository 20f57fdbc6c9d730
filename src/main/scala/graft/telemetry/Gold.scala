package graft.telemetry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-layer builder: the daily cluster-utilization aggregate that feeds the
  * anomaly model (reference: models/gold/gold_cluster_util_daily.sql:5-31).
  *
  * Scale notes: groupBy(day) is a shuffle on a low-cardinality key (~tens of
  * groups per month of data) — Spark does partial (map-side) aggregation
  * before the exchange, so the shuffle carries one row per (partition, day),
  * not per input row. The exact `percentile` uses ObjectHashAggregate and
  * must buffer each group's values; at 100 TB-per-day granularity switch the
  * caller to `percentile_approx` (same API shape, bounded memory) — both are
  * exposed here behind `exactPercentile`.
  */
object Gold {

  /** gold_cluster_util_daily(dt, avg_gpu_util, p95_gpu_util, avg_cpu_util).
    * `timestamp_seconds` is the Spark analogue of DuckDB `to_timestamp(bigint)`
    * (gold_cluster_util_daily.sql:8-9); `date_trunc('day', ...)` is identical.
    */
  def clusterUtilDaily(silverGpuTimeseries: DataFrame,
                       exactPercentile: Boolean = true): DataFrame = {
    val p95 =
      if (exactPercentile) percentile(col("gpu_util_pct"), lit(0.95))
      else percentile_approx(col("gpu_util_pct"), lit(0.95), lit(10000))
    silverGpuTimeseries
      .filter(col("gpu_util_pct").isNotNull)
      .select(
        date_trunc("day", timestamp_seconds(col("ts"))).as("dt"),
        col("gpu_util_pct"),
        col("cpu_util_pct"))
      .groupBy(col("dt"))
      .agg(
        avg(col("gpu_util_pct")).as("avg_gpu_util"),
        p95.as("p95_gpu_util"),
        avg(col("cpu_util_pct")).as("avg_cpu_util"))
      .orderBy(col("dt"))
  }
}
