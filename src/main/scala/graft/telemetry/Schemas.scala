package graft.telemetry

import org.apache.spark.sql.types._

/** Declared StructTypes for the five bronze tables. The reference infers
  * these (pandas read_csv / parquet footers — SURVEY.md §1.3) but documents
  * every column (reference README.md:39-81); declaring them makes ingest
  * deterministic and lets the vectorized CSV reader skip inference passes —
  * at 100 TB an inference pre-scan is a full extra read of the data.
  */
object Schemas {

  /** pai_job_table.csv → bronze_job_events (README.md:39-46). NULL
    * end_time ⇔ job still running — load-bearing downstream.
    */
  val bronzeJobEvents: StructType = StructType(Seq(
    StructField("job_name", StringType),
    StructField("inst_id", StringType),
    StructField("user", StringType),
    StructField("status", StringType),
    StructField("start_time", LongType),
    StructField("end_time", LongType)))

  /** pai_instance_table.csv → bronze_instance_table (README.md:47-48;
    * "kept in bronze for future extensions" — never read downstream).
    */
  val bronzeInstanceTable: StructType = StructType(Seq(
    StructField("job_name", StringType),
    StructField("inst_id", StringType),
    StructField("worker_name", StringType),
    StructField("inst_name", StringType),
    StructField("status", StringType),
    StructField("start_time", LongType),
    StructField("end_time", LongType),
    StructField("machine", StringType)))

  /** pai_machine_metric.csv → bronze_machine_metrics (README.md:52-58). */
  val bronzeMachineMetrics: StructType = StructType(Seq(
    StructField("worker_name", StringType),
    StructField("machine", StringType),
    StructField("start_time", LongType),
    StructField("end_time", LongType),
    StructField("machine_cpu_iowait", DoubleType),
    StructField("machine_cpu_kernel", DoubleType),
    StructField("machine_cpu_usr", DoubleType),
    StructField("machine_gpu", DoubleType),
    StructField("machine_load_1", DoubleType),
    StructField("machine_net_receive", DoubleType),
    StructField("machine_num_worker", DoubleType),
    StructField("machine_cpu", DoubleType)))

  /** pai_machine_spec.csv → bronze_machine_spec (README.md:59-60,
    * "available for future joins").
    */
  val bronzeMachineSpec: StructType = StructType(Seq(
    StructField("machine", StringType),
    StructField("gpu_type", StringType),
    StructField("cap_cpu", LongType),
    StructField("cap_mem", LongType),
    StructField("cap_gpu", LongType)))

  /** tpu_gpus.csv → bronze_gpu_specs (README.md:68-81) — dimension-like
    * GPU model table, all text in the raw scrape.
    */
  val bronzeGpuSpecs: StructType = StructType(Seq(
    StructField("Product_Name", StringType),
    StructField("GPU_Chip", StringType),
    StructField("Released", StringType),
    StructField("Bus", StringType),
    StructField("Memory", StringType),
    StructField("GPU_clock", StringType),
    StructField("Memory_clock", StringType),
    StructField("Shaders_TMUs_ROPs", StringType)))
}
