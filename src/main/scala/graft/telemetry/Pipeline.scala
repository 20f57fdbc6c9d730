package graft.telemetry

import graft.ml.IsolationForest
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Full-refresh orchestration — the reference's Prefect flow
  * (pipelines/flow_full_refresh.py:79-90: ingest → dbt run → dbt test →
  * train → score) collapsed into one JVM. The reference pays five process
  * spawns and a disk round-trip between every stage (SURVEY.md §3.1); here
  * each stage hands the next a lazy DataFrame, Catalyst fuses across stage
  * boundaries, and the only materializations are the intentional
  * bronze/silver/gold parquet writes.
  */
object Pipeline {

  final case class RefreshResult(bronzeCounts: Map[String, Long],
                                 goldDays: Long, anomalies: Long,
                                 modelPath: String, newAlerts: Long)

  /** Stage 2-3: bronze → silver → gold materialization (dbt run). Silver
    * and gold are written as tables (materialized='table' in the
    * reference); bronze stays a view over the ingested parquet.
    */
  def buildModels(spark: SparkSession, lakeDir: String): (DataFrame, DataFrame, DataFrame) = {
    import graft.sources.Lake
    val jobs = Silver.jobs(Bronze.readBronze(spark, lakeDir, "bronze_job_events"))
    val ts = Silver.gpuTimeseries(
      Bronze.readBronze(spark, lakeDir, "bronze_machine_metrics"))
    Lake.write(jobs, s"$lakeDir/silver/silver_jobs.parquet")
    Lake.write(ts, s"$lakeDir/silver/silver_gpu_timeseries.parquet")
    val tsStored = Lake.read(spark, s"$lakeDir/silver/silver_gpu_timeseries.parquet")
    val gold = Gold.clusterUtilDaily(tsStored)
    Lake.write(gold, s"$lakeDir/gold/gold_cluster_util_daily.parquet")
    (Lake.read(spark, s"$lakeDir/silver/silver_jobs.parquet"),
      tsStored,
      Lake.read(spark, s"$lakeDir/gold/gold_cluster_util_daily.parquet"))
  }

  /** Stage 5: train + score (reference ml/train_cluster_anomaly_model.py,
    * ml/score_cluster_anomalies.py) → `gold_cluster_util_daily_scored`.
    */
  def trainAndScore(spark: SparkSession, lakeDir: String, gold: DataFrame,
                    nEstimators: Int = 100, contamination: Double = 0.05,
                    seed: Long = 42L): DataFrame = {
    val features = Seq("avg_gpu_util", "p95_gpu_util", "avg_cpu_util")
    val model = IsolationForest.fit(gold, features, nEstimators,
      contamination, seed)
    model.save(spark, s"$lakeDir/ml/cluster_anomaly_iforest")
    val scored = model.transform(gold)
    graft.sources.Lake.write(scored,
      s"$lakeDir/gold/gold_cluster_util_daily_scored.parquet")
    graft.sources.Lake.read(spark,
      s"$lakeDir/gold/gold_cluster_util_daily_scored.parquet")
  }

  /** Export the scored table for external consumers — the reference's
    * plot feed (notebooks/plot_daily_anomalies.py:14-24 reads the scored
    * table and plots dt / avg_gpu_util / anomaly flags) re-expressed as
    * an explicit sink: (dt, avg_gpu_util, anomaly_flag, anomaly_score),
    * day-ordered. `format` is "csv" (header'd) or "json". The
    * coalesce(1) is deliberate: the feed is one row per DAY (the
    * upstream aggregation already collapsed the data), and a plot/BI
    * consumer wants a single file — this is not a data-scale path.
    */
  def exportScored(spark: SparkSession, lakeDir: String, outPath: String,
                   format: String = "csv"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val scored = graft.sources.Lake.read(spark,
      s"$lakeDir/gold/gold_cluster_util_daily_scored.parquet")
    val feed = scored.select(col("dt"), col("avg_gpu_util"),
      col("anomaly_flag"), col("anomaly_score")).orderBy("dt")
    val w = feed.coalesce(1).write.mode("overwrite")
    format match {
      case "csv"  => w.option("header", "true").csv(outPath)
      case "json" => w.json(outPath)
      case other  => throw new IllegalArgumentException(
        s"exportScored: unsupported format '$other' (expected csv or json)")
    }
    feed
  }

  /** The whole flow, fail-fast at the checks gate like the reference.
    * After scoring, newly-anomalous days are appended to the alerts mart
    * (the reference's "when new anomaly days are detected" trigger) — a
    * rerun over the same data alerts nothing new, so the refresh is safe
    * to schedule repeatedly.
    */
  def fullRefresh(spark: SparkSession, rawDir: String, lakeDir: String): RefreshResult = {
    val counts = Bronze.ingestAll(spark, rawDir, lakeDir)            // F1 ingest
    val (jobs, ts, gold) = buildModels(spark, lakeDir)               // dbt run
    Checks.runAll(jobs, ts, gold)                                    // dbt test
    val scored = trainAndScore(spark, lakeDir, gold)                 // train+score
    val newAlerts = Alerts.appendAlerts(spark, lakeDir, scored,      // alerting
      Alerts.nextBatchId(lakeDir))
    RefreshResult(counts, gold.count(),
      scored.filter(org.apache.spark.sql.functions.col("anomaly_flag") === 1).count(),
      s"$lakeDir/ml/cluster_anomaly_iforest", newAlerts)
  }
}
