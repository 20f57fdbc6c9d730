package graft.queries

import graft.Tables
import graft.ml.IsolationForest
import org.apache.spark.sql.functions._

/** ML-operator coverage (SURVEY.md §2.8): StandardScaler feature
  * standardization (M1, SQL-expressible → oracled) and the isolation-forest
  * daily-anomaly pipeline (M2-M4, not SQL-expressible → rows-only check),
  * mirroring the reference's train→score flow
  * (ml/train_cluster_anomaly_model.py, ml/score_cluster_anomalies.py) on
  * the events table's daily aggregate.
  */
object MlQueries extends QueryPack {

  /** The gold-daily feature table the model consumes (reference
    * gold_cluster_util_daily shape over events).
    */
  private def goldDaily(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(to_date(date_trunc("day", col("ts"))).as("dt"), col("value"))
      .groupBy("dt")
      .agg(
        avg("value").as("avg_value"),
        percentile(col("value"), lit(0.95)).as("p95_value"),
        count(lit(1)).cast("double").as("n_events"))

  val queries: Map[String, Q] = Map(
    // The feature table itself, oracled: every input the forest consumes
    // (dt, avg, exact p95, count) hash-checks against DuckDB, so the only
    // unverified surface left in the anomaly pipeline is the forest's own
    // scores (pinned by IsolationForestSpec instead).
    "q_anomaly_features" -> ((s, d) =>
      goldDaily(s, d)
        .select(col("dt"),
          round(col("avg_value"), 6).as("avg_value"),
          round(col("p95_value"), 6).as("p95_value"),
          col("n_events"))
        .orderBy("dt")),

    // M1: StandardScaler semantics (mean/population-std standardization),
    // computed distributed — stats via window over the whole frame.
    "q_scaler_standardize" -> ((s, d) => {
      val g = goldDaily(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy()  // global stats; tiny frame (one row per day)
        .rowsBetween(Long.MinValue, Long.MaxValue)
      g.select(
        col("dt"),
        round((col("avg_value") - avg("avg_value").over(w)) /
          stddev_pop("avg_value").over(w), 6).as("z_avg"),
        round((col("p95_value") - avg("p95_value").over(w)) /
          stddev_pop("p95_value").over(w), 6).as("z_p95"))
        .orderBy("dt")
    }),

    // Alerting mart (reference README "Alerting / Notifications"): the
    // new-days-since-last-run anti-join, oracled with a DETERMINISTIC
    // alert rule (global z-score of the daily average, |z| > 1.3) in
    // place of the forest flag so DuckDB can replay it. "Previously
    // alerted" = the rule's firings in the first 20 days (a prior run's
    // alerts table); the query returns only the NEW alert days. The
    // ledger/idempotence half of alerting is AlertsSpec's job — this
    // verifies the day-keyed anti-join + rule end-to-end.
    "q_anomaly_alerts" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
      val z = goldDaily(s, d).select(
        col("dt"),
        col("avg_value").as("avg_gpu_util"),
        ((col("avg_value") - avg("avg_value").over(w)) /
          stddev_pop("avg_value").over(w)).as("z"),
        date_add(min("dt").over(w), 19).as("cutoff"))
        .withColumn("anomaly_flag", (abs(col("z")) > 1.3).cast("int"))
      val prevAlerts = z
        .filter(col("anomaly_flag") === 1 && col("dt") <= col("cutoff"))
        .select(col("dt"), col("avg_gpu_util"),
          col("z").as("anomaly_score"), lit(0L).as("detected_batch"))
      graft.telemetry.Alerts.newAlerts(
          z.withColumn("anomaly_score", col("z")), prevAlerts, batchId = 1L)
        .select(col("dt"),
          round(col("avg_gpu_util"), 6).as("avg_gpu_util"),
          round(col("anomaly_score"), 6).as("z_score"))
        .orderBy("dt")
    }),

    // M2-M4 + E6/E7 + S7: fit isolation forest on the daily features
    // (driver-side, ψ≤256 by design), score distributed via UDF, emit the
    // reference's scored-table shape. Not SQL-expressible — no oracle.
    "q_anomaly_daily" -> ((s, d) => {
      val g = goldDaily(s, d).cache()
      val model = IsolationForest.fit(g,
        Seq("avg_value", "p95_value", "n_events"),
        nEstimators = 100, contamination = 0.05, seed = 42L)
      model.transform(g)
        .select(col("dt"),
          round(col("avg_value"), 6).as("avg_value"),
          round(col("anomaly_score"), 6).as("anomaly_score"),
          col("anomaly_flag"))
        .orderBy("dt")
    }),

    // A4 over the scored table: the reference's verification summary
    // (README.md:531-532) — num_anomalies / total_days. Deterministic
    // given the fixed seed; rows-only check (flags come from the forest).
    "q_anomaly_summary" -> ((s, d) => {
      val g = goldDaily(s, d).cache()
      val model = IsolationForest.fit(g,
        Seq("avg_value", "p95_value", "n_events"),
        nEstimators = 100, contamination = 0.05, seed = 42L)
      model.transform(g)
        .agg(sum("anomaly_flag").as("num_anomalies"),
          count(lit(1)).as("total_days"))
    }))

  val oracle: Map[String, String] = Map(
    "q_anomaly_features" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
        |       round(avg(value), 6) AS avg_value,
        |       round(quantile_cont(value, 0.95), 6) AS p95_value,
        |       count(*)::DOUBLE AS n_events
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY dt""".stripMargin,
    "q_anomaly_alerts" ->
      """WITH g AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
        |         avg(value) AS avg_value
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |z AS (
        |  SELECT dt, avg_value,
        |         (avg_value - avg(avg_value) OVER ()) /
        |           stddev_pop(avg_value) OVER () AS z,
        |         CAST(min(dt) OVER () + INTERVAL 19 DAY AS DATE) AS cutoff
        |  FROM g),
        |prev AS (SELECT dt FROM z WHERE abs(z) > 1.3 AND dt <= cutoff)
        |SELECT dt, round(avg_value, 6) AS avg_gpu_util,
        |       round(z, 6) AS z_score
        |FROM z
        |WHERE abs(z) > 1.3
        |  AND NOT EXISTS (SELECT 1 FROM prev WHERE prev.dt = z.dt)
        |ORDER BY dt""".stripMargin,
    "q_scaler_standardize" ->
      """WITH g AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
        |         avg(value) AS avg_value,
        |         quantile_cont(value, 0.95) AS p95_value
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT dt,
        |       round((avg_value - avg(avg_value) OVER ()) /
        |             stddev_pop(avg_value) OVER (), 6) AS z_avg,
        |       round((p95_value - avg(p95_value) OVER ()) /
        |             stddev_pop(p95_value) OVER (), 6) AS z_p95
        |FROM g ORDER BY dt""".stripMargin)
}
