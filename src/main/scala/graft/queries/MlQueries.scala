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

    // Robust MAD anomaly detection: flag a day when its deviation from
    // the TRAILING-window median exceeds 3× the window's median absolute
    // deviation — the outlier-resistant twin of the z-score detector
    // (one bad day inflates a stddev and masks the next anomaly; it
    // barely moves a median). MAD needs a median OF deviations FROM the
    // window's own median, which no single window aggregate expresses —
    // so the window collects its ≤14 values once and both medians run as
    // array expressions. The median is written out explicitly
    // ((lo+hi)/2, not quantile_cont) on BOTH engines: interpolation
    // formulas differ in final-ulp arithmetic, and the unrounded med/mad
    // feed a comparison, so the two sides must share the exact float ops.
    // State per row is bounded by the window length — scales as any
    // sliding-window aggregate.
    "q_anomaly_robust" -> ((s, d) => {
      def arrMedian(a: org.apache.spark.sql.Column) = {
        val srt = sort_array(a)
        val n = size(srt)
        when(n % 2 === 1, element_at(srt, ((n + 1) / 2).cast("int")))
          .otherwise((element_at(srt, (n / 2).cast("int")) +
            element_at(srt, (n / 2).cast("int") + 1)) / 2.0)
      }
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("dt").rowsBetween(-14, -1)
      goldDaily(s, d).select(col("dt"), col("avg_value"))
        .withColumn("hist", collect_list("avg_value").over(w))
        .filter(size(col("hist")) >= 7)
        .withColumn("med", arrMedian(col("hist")))
        .withColumn("mad", arrMedian(transform(col("hist"),
          v => abs(v - col("med")))))
        .select(col("dt"),
          round(col("avg_value"), 6).as("avg_value"),
          round(col("med"), 6).as("med"),
          round(col("mad"), 6).as("mad"),
          (abs(col("avg_value") - col("med")) > col("mad") * 3.0)
            .cast("int").as("anomaly_flag"))
        .orderBy("dt")
    }),

    // Seasonal anomaly detection: each day scored against ITS OWN
    // WEEKDAY's history (expanding same-dow window) — the adjustment
    // that stops every Monday from alarming on a weekend-quiet cluster.
    // Flag = |x − mean_dow| > 2·sd_dow, computed multiplication-only so
    // sd = 0 degenerates deterministically. One dow-keyed window, ~7
    // partitions of ~|days|/7 rows each.
    "q_anomaly_seasonal" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("dow").orderBy("dt")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      goldDaily(s, d).select(col("dt"), col("avg_value"))
        .withColumn("dow", dayofweek(col("dt")))
        .withColumn("hist", collect_list("avg_value").over(w))
        .filter(size(col("hist")) >= 2)
        .withColumn("mu",
          aggregate(col("hist"), lit(0.0), (a, v) => a + v) / size(col("hist")))
        .withColumn("sd",
          sqrt(aggregate(col("hist"), lit(0.0),
            (a, v) => a + (v - col("mu")) * (v - col("mu")))
            / size(col("hist"))))
        .select(col("dt"),
          round(col("avg_value"), 6).as("avg_value"),
          round(col("mu"), 6).as("dow_mean"),
          round(col("sd"), 6).as("dow_sd"),
          (abs(col("avg_value") - col("mu")) > col("sd") * 2.0)
            .cast("int").as("anomaly_flag"))
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
    // twin of q_anomaly_seasonal: same expanding same-weekday frame
    // (list() preserves frame order, so the float sums agree), same
    // population sd and multiplication-only flag
    "q_anomaly_seasonal" ->
      """WITH g AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
        |         avg(value) AS avg_value
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |h AS (
        |  SELECT dt, avg_value,
        |    list(avg_value) OVER (PARTITION BY dayofweek(dt) ORDER BY dt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hist
        |  FROM g),
        |m AS (
        |  SELECT dt, avg_value, hist,
        |    list_sum(hist) / len(hist) AS mu
        |  FROM h WHERE len(hist) >= 2),
        |m2 AS (
        |  SELECT dt, avg_value, mu,
        |    sqrt(list_sum(list_transform(hist, v -> (v - mu) * (v - mu)))
        |         / len(hist)) AS sd
        |  FROM m)
        |SELECT dt,
        |  round(avg_value, 6) AS avg_value,
        |  round(mu, 6) AS dow_mean,
        |  round(sd, 6) AS dow_sd,
        |  CAST(abs(avg_value - mu) > sd * 2.0 AS INT) AS anomaly_flag
        |FROM m2 ORDER BY dt""".stripMargin,
    // twin of q_anomaly_robust: same trailing list window, same EXPLICIT
    // interpolated-median arithmetic (list_sort + (lo+hi)/2) so the
    // unrounded med/mad comparison agrees bit-for-bit
    "q_anomaly_robust" ->
      """WITH g AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
        |         avg(value) AS avg_value
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |h AS (
        |  SELECT dt, avg_value,
        |    list(avg_value) OVER (ORDER BY dt
        |      ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING) AS hist
        |  FROM g),
        |m AS (
        |  SELECT dt, avg_value, hist, list_sort(hist) AS s
        |  FROM h WHERE len(hist) >= 7),
        |m2 AS (
        |  SELECT dt, avg_value, hist,
        |    CASE WHEN len(s) % 2 = 1 THEN s[(len(s)+1)//2]
        |         ELSE (s[len(s)//2] + s[len(s)//2 + 1]) / 2.0 END AS med
        |  FROM m),
        |m3 AS (
        |  SELECT dt, avg_value, med,
        |    list_sort(list_transform(hist, v -> abs(v - med))) AS sd
        |  FROM m2),
        |m4 AS (
        |  SELECT dt, avg_value, med,
        |    CASE WHEN len(sd) % 2 = 1 THEN sd[(len(sd)+1)//2]
        |         ELSE (sd[len(sd)//2] + sd[len(sd)//2 + 1]) / 2.0 END AS mad
        |  FROM m3)
        |SELECT dt, round(avg_value, 6) AS avg_value, round(med, 6) AS med,
        |  round(mad, 6) AS mad,
        |  CAST(abs(avg_value - med) > mad * 3.0 AS INT) AS anomaly_flag
        |FROM m4 ORDER BY dt""".stripMargin,
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
