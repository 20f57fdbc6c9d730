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

  /** Next unused alert batch id for NON-streaming callers (fullRefresh has
    * no epoch counter of its own): one past the highest committed marker.
    * Streaming callers pass foreachBatch's batchId instead — replays of a
    * committed epoch must map to the SAME id, which a fresh id would break.
    */
  def nextBatchId(lakeDir: String): Long = {
    val ledger = new java.io.File(s"$lakeDir/$ledgerName")
    Option(ledger.listFiles()).getOrElse(Array.empty)
      .flatMap(f => scala.util.Try(f.getName.toLong).toOption)
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
