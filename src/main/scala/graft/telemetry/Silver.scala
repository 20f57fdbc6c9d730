package graft.telemetry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver-layer builders: pure `DataFrame => DataFrame` projections/filters,
  * re-expressing the reference's dbt silver models
  * (reference: dbt_project/gpu_telemetry/models/silver/silver_jobs.sql:5-29,
  * silver_gpu_timeseries.sql:5-37) Spark-first. Both are narrow (no shuffle):
  * a rename projection plus a null filter, which Catalyst pushes into the
  * parquet scan — at 100 TB these never materialize an intermediate.
  */
object Silver {

  /** silver_jobs — the job dimension (reference silver_jobs.sql:5-29).
    * Input shape: bronze_job_events(job_name, inst_id, user, status,
    * start_time, end_time) with epoch-second longs and NULL end_time while
    * running. `run_time_sec` stays NULL for running jobs (the CASE WHEN is
    * load-bearing: silver_jobs.sql:25-28).
    */
  def jobs(bronzeJobEvents: DataFrame): DataFrame =
    bronzeJobEvents.select(
      col("job_name").as("job_id"),
      col("inst_id").as("instance_id"),
      col("user").as("user_id"),
      col("status").as("job_status"),
      col("start_time"),
      col("end_time"),
      when(col("end_time").isNotNull, col("end_time") - col("start_time"))
        .otherwise(lit(null)).as("run_time_sec"))

  /** silver_gpu_timeseries — machine-level metrics time series (reference
    * silver_gpu_timeseries.sql:5-37). The window *end* is the timestamp
    * (comment at silver_gpu_timeseries.sql:27); rows without a valid
    * end_time are dropped (line 37).
    */
  def gpuTimeseries(bronzeMachineMetrics: DataFrame): DataFrame =
    bronzeMachineMetrics.select(
      col("machine").as("machine_id"),
      col("worker_name"),
      col("end_time").as("ts"),
      col("machine_gpu").as("gpu_util_pct"),
      col("machine_cpu").as("cpu_util_pct"),
      col("machine_load_1"),
      col("machine_net_receive"),
      col("machine_cpu_iowait"),
      col("machine_cpu_kernel"),
      col("machine_cpu_usr"),
      col("machine_num_worker"))
      .filter(col("ts").isNotNull)
}
