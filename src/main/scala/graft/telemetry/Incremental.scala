package graft.telemetry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental lake maintenance — the capability the reference's
  * full-refresh flow (pipelines/flow_full_refresh.py) lacks but any
  * production lakehouse needs: fold a NEW batch of raw metrics into the
  * medallion layers touching only what the batch touches.
  *
  * Mechanics: bronze is append-only (new batch appended as new parquet
  * files — no rewrite of history); gold is maintained as a
  * dt-PARTITIONED table, and the batch's affected days are recomputed
  * from silver and written with Spark's dynamic partition overwrite —
  * only the touched dt directories are replaced, untouched partitions'
  * files are not rewritten (IncrementalSpec asserts this physically).
  *
  * Scale: cost is O(new batch) + O(touched days' silver rows), not
  * O(history) — the difference between minutes and hours at 100 TB. The
  * affected-day recompute reads the full bronze but with the day filter
  * pushed into the parquet scan, so at scale (bronze itself partitioned
  * by ingest day) only the touched days' files are opened. The
  * `collect()` of affected days is bounded by days-per-batch (tiny).
  */
object Incremental {

  final case class AppendResult(newRows: Long,
                                affectedDays: Seq[java.sql.Timestamp],
                                goldRows: Long)

  private def goldPartDir(lakeDir: String) =
    s"$lakeDir/gold/gold_cluster_util_daily_part.parquet"

  /** One-time initialization (or disaster rebuild): the same gold rows the
    * batch pipeline produces, laid out partitioned by dt so per-day
    * overwrites are possible.
    */
  def initPartitionedGold(spark: SparkSession, lakeDir: String): Long = {
    val silver = Silver.gpuTimeseries(
      Bronze.readBronze(spark, lakeDir, "bronze_machine_metrics"))
    val gold = Gold.clusterUtilDaily(silver)
    gold.write.mode("overwrite").partitionBy("dt")
      .parquet(goldPartDir(lakeDir))
    readPartitionedGold(spark, lakeDir).count()
  }

  def readPartitionedGold(spark: SparkSession, lakeDir: String): DataFrame =
    spark.read.parquet(goldPartDir(lakeDir))

  /** Fold one raw CSV batch of machine metrics into bronze + gold. */
  def appendMetrics(spark: SparkSession, rawCsvPath: String,
                    lakeDir: String): AppendResult =
    appendMetricsFrame(
      Bronze.readCsv(spark, rawCsvPath, Schemas.bronzeMachineMetrics), lakeDir)

  /** Streaming twin: every micro-batch runs the same append-only-bronze +
    * day-scoped-gold maintenance through foreachBatch. This is the
    * standard streaming-upsert-into-partitioned-table pattern: the
    * streaming engine provides ordering/retries per epoch, the batch
    * maintenance provides the day-scoped rewrite — no separate streaming
    * gold logic to keep in sync with batch.
    */
  def streamAppendMetrics(stream: org.apache.spark.sql.DataFrame,
                          lakeDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        appendMetricsFrame(batch, lakeDir): Unit
      }
      .start()

  /** Core maintenance over an already-loaded bronze-shaped batch.
    * Returns the batch size, the affected days, and the number of gold
    * rows rewritten (== affected days).
    */
  def appendMetricsFrame(batch: DataFrame, lakeDir: String): AppendResult = {
    val spark = batch.sparkSession
    val newRows = batch.count()
    // 1. append-only bronze: new files land next to history, no rewrite
    batch.write.mode("append")
      .parquet(s"$lakeDir/bronze/bronze_machine_metrics.parquet")

    // 2. which gold days does the batch touch? (bounded collect: one row
    //    per distinct day in the batch)
    val dayExpr = date_trunc("day", timestamp_seconds(col("ts")))
    val days = Silver.gpuTimeseries(batch)
      .select(dayExpr.as("dt")).distinct()
      .collect().map(_.getTimestamp(0)).toSeq

    if (days.isEmpty)
      return AppendResult(newRows, Nil, 0L)

    // 3. recompute ONLY those days from the full (history + batch) silver;
    //    the day filter sits on the scan side of the aggregate
    val fullSilver = Silver.gpuTimeseries(
      Bronze.readBronze(spark, lakeDir, "bronze_machine_metrics"))
      .filter(dayExpr.isin(days: _*))
    val touchedGold = Gold.clusterUtilDaily(fullSilver)

    // 4. dynamic partition overwrite: replace exactly the touched dt
    //    directories, leave every other partition's files untouched
    touchedGold.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt")
      .parquet(goldPartDir(lakeDir))

    // one gold row per touched day — no need to re-run the aggregate
    AppendResult(newRows, days.sortBy(_.getTime), days.size.toLong)
  }
}
