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
    *
    * foreachBatch is AT-LEAST-ONCE: a sink failure mid-epoch or a
    * restart replays the same batchId, and replaying an APPEND into
    * bronze would double the rows permanently. A commit ledger under the
    * lake (one marker file per batchId, written only after the epoch's
    * maintenance fully succeeded) makes the sink idempotent: a replayed
    * epoch whose marker exists is skipped — the same ledger-version
    * pattern transactional table formats use for streaming writes.
    */
  def streamAppendMetrics(stream: org.apache.spark.sql.DataFrame,
                          lakeDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        commitOnce(lakeDir, batchId) { appendMetricsFrame(batch, lakeDir); () }
        ()
      }
      .start()

  /** Run `body` exactly once per (lake, batchId): the marker is written
    * only AFTER body succeeded, so a mid-body crash replays it (the
    * at-least-once side) while a replay of a committed epoch is skipped
    * (the idempotence side). Returns false when skipped.
    */
  def commitOnce(lakeDir: String, batchId: Long)(body: => Unit): Boolean = {
    val ledger = new java.io.File(s"$lakeDir/bronze/_stream_commits")
    val marker = new java.io.File(ledger, batchId.toString)
    if (marker.exists()) false
    else {
      body
      ledger.mkdirs()
      if (!marker.createNewFile())
        throw new java.io.IOException(
          s"stream commit marker $marker could not be created")
      true
    }
  }

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
    //    directories, leave every other partition's files untouched.
    //    Cache so the post-write row count reads what was written instead
    //    of re-running the aggregate — a touched day can legitimately
    //    produce NO gold row (all its gpu_util values NULL: Silver keeps
    //    the rows, Gold filters them), so days.size would overcount.
    touchedGold.persist()
    try {
      touchedGold.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("dt")
        .parquet(goldPartDir(lakeDir))
      AppendResult(newRows, days.sortBy(_.getTime), touchedGold.count())
    } finally { touchedGold.unpersist(); () }
  }
}
