package graft.telemetry

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Anomaly alerting — the reference's last named future-work capability
  * (reference README.md "Alerting / Notifications": when new anomaly days
  * are detected, insert rows into an alerts table; a real deployment
  * would push them onward to Slack/PagerDuty).
  *
  * Semantics: an alert is emitted for an anomaly-flagged scored day AT
  * MOST ONCE across the lifetime of the lake — "new days since last
  * run", not "currently anomalous days". That is a day-keyed LEFT ANTI
  * join of the scored table against the alerts table, plus the same
  * ledger/prefixed-append machinery the incremental bronze uses so a
  * replayed batch (foreachBatch is at-least-once) inserts no duplicate
  * alert rows.
  *
  * Scale: the alerts table is one row per anomalous DAY — tiny forever —
  * so the anti-join broadcasts it and the scored side never shuffles.
  * The object-store caveat on Incremental.commitOnce applies here too
  * (the ledger and renames are java.io.File; swap for a table format's
  * commit protocol off local/HDFS filesystems).
  */
object Alerts {

  private def alertsDir(lakeDir: String) =
    s"$lakeDir/gold/gold_anomaly_alerts.parquet"

  private val ledgerName = "gold/_alert_commits"

  /** Streaming epoch ids are offset into their own id range so they can
    * NEVER collide with refresh-allocated ids in the shared ledger, file
    * prefixes, or detected_batch column. Without this, a stream starting
    * on a lake whose refresh had committed marker 0 would ledger-skip its
    * own epoch 0 (alerts silently lost), and a replayed stream epoch
    * sharing a refresh batch's id would wipe that batch's files via the
    * common `batch-<id>-` prefix. Epoch counters are far below 2^40;
    * refresh ids count up from 0 and never reach it.
    */
  private[graft] val streamBatchBase: Long = 1L << 40

  private[graft] def streamBatchId(epochId: Long): Long = {
    require(epochId >= 0 && epochId < streamBatchBase,
      s"stream epoch id $epochId outside [0, 2^40)")
    streamBatchBase + epochId
  }

  /** Next unused alert batch id for NON-streaming callers (fullRefresh has
    * no epoch counter of its own): one past the highest committed
    * refresh-range marker. Streaming markers (≥ streamBatchBase) are
    * excluded — counting them would jump the refresh sequence into the
    * stream range. Streaming callers pass foreachBatch's epoch through
    * `streamBatchId` instead — replays of a committed epoch must map to
    * the SAME id, which a fresh id would break.
    */
  def nextBatchId(lakeDir: String): Long = {
    val ledger = new java.io.File(s"$lakeDir/$ledgerName")
    Option(ledger.listFiles()).getOrElse(Array.empty)
      .flatMap(f => scala.util.Try(f.getName.toLong).toOption)
      .filter(_ < streamBatchBase)
      .foldLeft(-1L)(math.max) + 1
  }

  /** (dt, avg_gpu_util, anomaly_score, detected_batch) — the scored
    * table's day + headline metric + model score, stamped with the batch
    * that first detected it.
    */
  val schema: StructType = StructType(Seq(
    StructField("dt", TimestampType),
    StructField("avg_gpu_util", DoubleType),
    StructField("anomaly_score", DoubleType),
    StructField("detected_batch", LongType)))

  /** The alerts table; empty (with the right schema) before any batch. */
  def readAlerts(spark: SparkSession, lakeDir: String): DataFrame = {
    val dir = new java.io.File(alertsDir(lakeDir))
    if (dir.exists()) spark.read.schema(schema).parquet(dir.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
  }

  /** New-days-since-last-run: anomaly-flagged rows of `scored` whose dt
    * has no row in `alertsPrev` — the day-keyed anti-join the reference
    * sketch describes. `scored` needs (dt, avg_gpu_util, anomaly_score,
    * anomaly_flag); extra columns are dropped.
    */
  def newAlerts(scored: DataFrame, alertsPrev: DataFrame,
                batchId: Long): DataFrame =
    scored.filter(col("anomaly_flag") === 1)
      .join(alertsPrev.select("dt").distinct(), Seq("dt"), "left_anti")
      .select(col("dt"), col("avg_gpu_util"), col("anomaly_score"),
        lit(batchId).as("detected_batch"))

  /** Insert this batch's new alerts exactly once; returns the number of
    * alert rows inserted (0 when the batch was already committed).
    *
    * Replay safety has two layers, BOTH needed: the `_alert_commits`
    * ledger skips a fully-committed batch, and the prefixed append wipes
    * a CRASHED attempt's own files before rewriting them. The previous
    * state for the anti-join deliberately EXCLUDES rows this same batch
    * wrote (`detected_batch =!= batchId`): a crashed attempt may have
    * left its alerts in the table, and counting them as "already
    * alerted" would make the replay compute an empty batch, wipe the
    * orphaned files, and lose the alerts permanently.
    */
  def appendAlerts(spark: SparkSession, lakeDir: String, scored: DataFrame,
                   batchId: Long): Long = {
    var inserted = 0L
    Incremental.commitOnce(lakeDir, batchId, ledgerName) {
      // Normalize dt to the declared TimestampType BEFORE the anti-join and
      // the write: the day marts carry dt as DATE (to_date), and appending
      // DATE parquet under a TIMESTAMP read schema breaks readAlerts with a
      // parquet conversion error. Session timezone is UTC, so the cast is
      // deterministic midnight-UTC.
      val scoredTs = scored.withColumn("dt", col("dt").cast("timestamp"))
      val prev = readAlerts(spark, lakeDir)
        .filter(col("detected_batch") =!= lit(batchId))
      val fresh = newAlerts(scoredTs, prev, batchId).persist()
      try {
        inserted = fresh.count()
        if (inserted > 0)
          Incremental.appendBatchIdempotent(fresh, alertsDir(lakeDir), batchId)
      } finally { fresh.unpersist(); () }
    }
    inserted
  }
}
