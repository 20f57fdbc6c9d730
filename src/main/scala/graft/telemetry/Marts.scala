package graft.telemetry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The efficiency marts the reference names as future work
  * (README.md "Job- and User-Level Efficiency Marts":
  * gold_job_efficiency_daily, gold_user_gpu_usage_daily) built
  * Spark-first over the silver/gold layers that already exist.
  *
  * The public trace carries no per-job GPU telemetry (the reference's own
  * stated limitation), so job efficiency uses the day-grain
  * approximation its sketch implies: a job's active GPU-hours are its
  * allocated hours weighted by that day's cluster utilization.
  *
  * Scale: one narrow projection + one groupBy each; the day-grain join
  * broadcasts (gold is one row per day). Nothing here shuffles the jobs
  * table more than once.
  */
object Marts {

  /** gold_user_gpu_usage_daily: per (user, start day) — job count,
    * failure count/rate, allocated run-hours. Running jobs (NULL
    * run_time_sec) contribute zero hours but still count as jobs.
    */
  def userUsageDaily(silverJobs: DataFrame): DataFrame =
    silverJobs
      .withColumn("dt", to_date(timestamp_seconds(col("start_time"))))
      .groupBy("user_id", "dt")
      .agg(
        count(lit(1)).as("n_jobs"),
        sum((col("job_status") === "Failed").cast("long")).as("n_failed"),
        round(avg((col("job_status") === "Failed").cast("double")), 6)
          .as("failure_rate"),
        round(sum(coalesce(col("run_time_sec"), lit(0L))) / 3600.0, 6)
          .as("run_hours"))
      .orderBy("user_id", "dt")

  /** gold_job_efficiency_daily: per day — jobs started, GPU-hours
    * allocated (sum of job runtimes), GPU-hours active (allocated ×
    * day's average cluster utilization), and the resulting efficiency
    * ratio. `goldDaily` is Gold.clusterUtilDaily's output (one row per
    * day → broadcast join).
    */
  def jobEfficiencyDaily(silverJobs: DataFrame,
                         goldDaily: DataFrame): DataFrame = {
    val jobs = silverJobs
      .filter(col("run_time_sec").isNotNull)
      .withColumn("dt", date_trunc("day", timestamp_seconds(col("start_time"))))
      .groupBy("dt")
      .agg(
        count(lit(1)).as("n_jobs"),
        sum(col("run_time_sec")).cast("double").as("alloc_sec"))
    // LEFT join: a day with jobs but no utilization row (telemetry gap,
    // or every reading NULL) must still appear — with null efficiency,
    // not silently vanish and make mart job totals disagree with silver
    jobs
      .join(broadcast(goldDaily.select(col("dt"), col("avg_gpu_util"))),
        Seq("dt"), "left")
      .select(
        col("dt"),
        col("n_jobs"),
        round(col("alloc_sec") / 3600.0, 6).as("gpu_hours_allocated"),
        round(col("alloc_sec") / 3600.0 * col("avg_gpu_util") / 100.0, 6)
          .as("gpu_hours_active"),
        round(col("avg_gpu_util") / 100.0, 6).as("efficiency"))
      .orderBy("dt")
  }
}
