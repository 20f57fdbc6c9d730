package graft

import graft.telemetry.Alerts
import java.nio.file.Files
import org.apache.spark.sql.functions._

class AlertsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")

  /** scored-table-shaped frame: (dt, avg_gpu_util, anomaly_score,
    * anomaly_flag).
    */
  private def scored(rows: (String, Double, Double, Int)*) =
    rows.map { case (d, u, s, f) => (ts(d), u, s, f) }
      .toDF("dt", "avg_gpu_util", "anomaly_score", "anomaly_flag")

  test("newAlerts emits only anomaly days not already alerted") {
    val sc = scored(
      ("2024-01-01", 50.0, -0.1, 0),
      ("2024-01-02", 20.0, -0.6, 1),
      ("2024-01-03", 21.0, -0.7, 1))
    val prev = Seq((ts("2024-01-02"), 20.0, -0.6, 7L))
      .toDF("dt", "avg_gpu_util", "anomaly_score", "detected_batch")
    val got = Alerts.newAlerts(sc, prev, batchId = 9L).collect()
    assert(got.length == 1)
    assert(got(0).getTimestamp(0) == ts("2024-01-03"))
    assert(got(0).getLong(3) == 9L)
  }

  test("appendAlerts: replay inserts no duplicates; later batch adds only new days") {
    val lake = Files.createTempDirectory("graft-alerts").toString
    val b0 = scored(
      ("2024-01-01", 50.0, -0.1, 0),
      ("2024-01-02", 20.0, -0.6, 1),
      ("2024-01-03", 21.0, -0.7, 1))
    assert(Alerts.appendAlerts(spark, lake, b0, batchId = 0L) == 2L)
    // exact replay of the same committed batch: ledger skips it
    assert(Alerts.appendAlerts(spark, lake, b0, batchId = 0L) == 0L)
    val afterReplay = Alerts.readAlerts(spark, lake)
    assert(afterReplay.count() == 2)
    // next run re-scores old days (still anomalous) and finds one new one:
    // only the new day alerts
    val b1 = scored(
      ("2024-01-02", 20.0, -0.6, 1),
      ("2024-01-03", 21.0, -0.7, 1),
      ("2024-01-04", 19.0, -0.8, 1))
    assert(Alerts.appendAlerts(spark, lake, b1, batchId = 1L) == 1L)
    val all = Alerts.readAlerts(spark, lake).orderBy("dt").collect()
    assert(all.map(_.getTimestamp(0).toString.take(10)).toSeq ==
      Seq("2024-01-02", "2024-01-03", "2024-01-04"))
    assert(all.map(_.getLong(3)).toSeq == Seq(0L, 0L, 1L))
  }

  test("appendAlerts accepts DateType dt (day marts use to_date)") {
    // regression: writing DATE parquet under the TIMESTAMP read schema
    // used to break readAlerts with a parquet conversion error
    val lake = Files.createTempDirectory("graft-alerts-date").toString
    val sc = Seq(
      (java.sql.Date.valueOf("2024-01-02"), 20.0, -0.6, 1),
      (java.sql.Date.valueOf("2024-01-03"), 21.0, -0.7, 1))
      .toDF("dt", "avg_gpu_util", "anomaly_score", "anomaly_flag")
    assert(Alerts.appendAlerts(spark, lake, sc, batchId = 0L) == 2L)
    val back = Alerts.readAlerts(spark, lake).orderBy("dt").collect()
    assert(back.map(_.getTimestamp(0)).toSeq ==
      Seq(ts("2024-01-02"), ts("2024-01-03")))
    // a second batch re-scoring the same days (again as DATE) adds nothing
    assert(Alerts.appendAlerts(spark, lake, sc, batchId = 1L) == 0L)
  }

  test("crashed-attempt replay keeps its own orphaned rows (no alert loss)") {
    val lake = Files.createTempDirectory("graft-alerts-crash").toString
    val b0 = scored(("2024-01-02", 20.0, -0.6, 1))
    // simulate a crash AFTER the append but BEFORE the ledger marker:
    // run the full insert, then delete the marker — the table now holds
    // the batch's rows with no commit record, exactly the crash state
    assert(Alerts.appendAlerts(spark, lake, b0, batchId = 0L) == 1L)
    val marker = new java.io.File(s"$lake/gold/_alert_commits/0")
    assert(marker.exists() && marker.delete())
    assert(Alerts.readAlerts(spark, lake).count() == 1) // orphaned rows exist
    // the replay must NOT see its own orphans as "already alerted"
    // (that would wipe the prefix and insert nothing — alert lost)
    assert(Alerts.appendAlerts(spark, lake, b0, batchId = 0L) == 1L)
    val rows = Alerts.readAlerts(spark, lake).collect()
    assert(rows.length == 1 && rows(0).getLong(3) == 0L)
  }

  test("forest-scored pipeline output feeds alerts end-to-end") {
    // 30 quiet days + 2 loud ones; the forest flags the loud days, and
    // every flagged day alerts on the first batch
    val days = (1 to 30).map(i => (ts(f"2024-01-$i%02d"), 50.0 + (i % 3), 55.0, 40.0)) ++
      Seq((ts("2024-02-01"), 95.0, 99.0, 90.0), (ts("2024-02-02"), 5.0, 9.0, 2.0))
    val gold = days.toDF("dt", "avg_gpu_util", "p95_gpu_util", "avg_cpu_util")
    val model = graft.ml.IsolationForest.fit(gold,
      Seq("avg_gpu_util", "p95_gpu_util", "avg_cpu_util"),
      nEstimators = 50, contamination = 0.06, seed = 7L)
    val sc = model.transform(gold)
    val lake = Files.createTempDirectory("graft-alerts-forest").toString
    val inserted = Alerts.appendAlerts(spark, lake, sc, batchId = 0L)
    val flagged = sc.filter(col("anomaly_flag") === 1).count()
    assert(inserted == flagged && inserted >= 2)
    val alerted = Alerts.readAlerts(spark, lake)
      .select("dt").as[java.sql.Timestamp].collect().toSet
    assert(alerted.contains(ts("2024-02-01")) && alerted.contains(ts("2024-02-02")))
  }
}
