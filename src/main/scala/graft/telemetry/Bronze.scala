package graft.telemetry

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.types.StructType

/** Bronze ingest: raw CSV → parquet, the reference's ingest_bronze.py
  * (pipelines/ingest_bronze.py:10-69) done Spark-first — the distributed
  * CSV reader replaces pandas, explicit schemas replace inference, and the
  * parquet write is the same materialization boundary. Returns the row
  * count (the reference logs it: ingest_bronze.py:17).
  *
  * Scale: both sides of the copy are fully distributed; with a declared
  * schema Spark makes exactly one pass over the CSV. Each table lands
  * partitioned by input split — at 100 TB, callers repartition by a key
  * before the write only if downstream wants co-location.
  */
object Bronze {

  final case class TableSpec(name: String, csv: String, schema: StructType)

  /** The five raw→bronze tables (reference ingest_bronze.py:10-62). */
  val tables: Seq[TableSpec] = Seq(
    TableSpec("bronze_job_events", "pai_job_table.csv", Schemas.bronzeJobEvents),
    TableSpec("bronze_instance_table", "pai_instance_table.csv", Schemas.bronzeInstanceTable),
    TableSpec("bronze_machine_metrics", "pai_machine_metric.csv", Schemas.bronzeMachineMetrics),
    TableSpec("bronze_machine_spec", "pai_machine_spec.csv", Schemas.bronzeMachineSpec),
    TableSpec("bronze_gpu_specs", "tpu_gpus.csv", Schemas.bronzeGpuSpecs))

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Ingest one table: CSV → parquet under `$lakeDir/bronze/`. The logged
    * row count rides the write itself via the Observation API — metrics
    * are collected as the write job streams rows, so there is no second
    * job and no re-scan (the previous form re-read the written parquet
    * for a footer count: cheap, but still an extra job + file listing per
    * table — at 100 TB, pure waste).
    */
  def ingestTable(spark: SparkSession, rawDir: String, lakeDir: String,
                  spec: TableSpec): Long = {
    val obs = Observation(s"ingest_${spec.name}")
    readCsv(spark, s"$rawDir/${spec.csv}", spec.schema)
      .observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(s"$lakeDir/bronze/${spec.name}.parquet")
    obs.get("rows").asInstanceOf[Long]
  }

  /** Full bronze ingest; returns table → row count. Missing raw files are
    * skipped (the driver fixtures don't ship the Kaggle CSVs; callers
    * ingest whatever subset exists, as tests do).
    */
  def ingestAll(spark: SparkSession, rawDir: String, lakeDir: String): Map[String, Long] =
    tables.flatMap { spec =>
      val src = new java.io.File(s"$rawDir/${spec.csv}")
      if (src.exists())
        Some(spec.name -> ingestTable(spark, rawDir, lakeDir, spec))
      else None
    }.toMap

  def readBronze(spark: SparkSession, lakeDir: String, name: String): DataFrame =
    spark.read.parquet(s"$lakeDir/bronze/$name.parquet")
}
