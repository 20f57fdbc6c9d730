package graft

import graft.telemetry.{Gold, Silver}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class TelemetrySpec extends SparkSpecBase {

  private lazy val bronzeJobs = {
    val schema = StructType(Seq(
      StructField("job_name", StringType),
      StructField("inst_id", StringType),
      StructField("user", StringType),
      StructField("status", StringType),
      StructField("start_time", LongType),
      StructField("end_time", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("j1", "i1", "alice", "Terminated", 1000L, 1600L),
        Row("j2", "i2", "bob", "Running", 2000L, null),
        Row("j3", "i3", "alice", "Failed", 3000L, 3005L))),
      schema)
  }

  private lazy val bronzeMetrics = {
    val schema = StructType(Seq(
      StructField("machine", StringType),
      StructField("worker_name", StringType),
      StructField("start_time", LongType),
      StructField("end_time", LongType),
      StructField("machine_gpu", DoubleType),
      StructField("machine_cpu", DoubleType),
      StructField("machine_load_1", DoubleType),
      StructField("machine_net_receive", DoubleType),
      StructField("machine_cpu_iowait", DoubleType),
      StructField("machine_cpu_kernel", DoubleType),
      StructField("machine_cpu_usr", DoubleType),
      StructField("machine_num_worker", DoubleType)))
    // two days: day0 gpu {10,20,30,40}, day1 gpu {50,60}; one NULL-ts row
    // dropped; one NULL-gpu row dropped at gold.
    val day0 = 86400L * 10
    val day1 = 86400L * 11
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("m1", "w1", day0, day0 + 100, 10.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
        Row("m1", "w1", day0, day0 + 200, 20.0, 2.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
        Row("m2", "w2", day0, day0 + 300, 30.0, 3.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
        Row("m2", "w2", day0, day0 + 400, 40.0, 4.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
        Row("m1", "w1", day1, day1 + 100, 50.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
        Row("m1", "w1", day1, day1 + 200, 60.0, 6.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
        Row("m3", "w3", day1, null, 99.0, 9.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
        Row("m3", "w3", day1, day1 + 300, null, 9.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0))),
      schema)
  }

  test("Silver.jobs renames and computes run_time_sec; NULL while running") {
    val s = Silver.jobs(bronzeJobs).collect().map(r =>
      r.getAs[String]("job_id") ->
        (if (r.isNullAt(r.fieldIndex("run_time_sec"))) None
         else Some(r.getAs[Long]("run_time_sec")))).toMap
    assert(s("j1") == Some(600L))
    assert(s("j2") == None) // running → NULL, the load-bearing CASE WHEN
    assert(s("j3") == Some(5L))
  }

  test("Silver.gpuTimeseries drops NULL-ts rows and renames metrics") {
    val s = Silver.gpuTimeseries(bronzeMetrics)
    assert(s.columns.contains("gpu_util_pct") && s.columns.contains("ts"))
    assert(s.count() == 7) // NULL end_time row dropped
  }

  test("Gold.clusterUtilDaily: avg + exact p95 per day, null metrics dropped") {
    val g = Gold.clusterUtilDaily(Silver.gpuTimeseries(bronzeMetrics))
      .collect()
    assert(g.length == 2)
    val day0 = g(0)
    // {10,20,30,40}: avg 25, p95 interpolated = 10+0.95*3 steps → 38.5
    assert(day0.getAs[Double]("avg_gpu_util") == 25.0)
    assert(math.abs(day0.getAs[Double]("p95_gpu_util") - 38.5) < 1e-9)
    val day1 = g(1)
    // {50,60}: avg 55, p95 = 59.5 (null gpu row dropped)
    assert(day1.getAs[Double]("avg_gpu_util") == 55.0)
    assert(math.abs(day1.getAs[Double]("p95_gpu_util") - 59.5) < 1e-9)
  }

  test("gold p95 approx variant stays close to exact") {
    val exact = Gold.clusterUtilDaily(Silver.gpuTimeseries(bronzeMetrics),
      exactPercentile = true).collect()(0).getAs[Double]("p95_gpu_util")
    val approx = Gold.clusterUtilDaily(Silver.gpuTimeseries(bronzeMetrics),
      exactPercentile = false).collect()(0).getAs[Double]("p95_gpu_util")
    assert(math.abs(exact - approx) <= 1.5)
  }

  test("Checks.observed reports row/null counters from the action's own job") {
    import spark.implicits._
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), null))
      .toDF("k", "v")
    val (observed, obs) = graft.telemetry.Checks.observed(
      df, "t", Seq("k", "v"))
    // the ONLY action is this collect — the counters ride its job
    assert(observed.count() == 3)
    val m = obs.get
    assert(m("rows") == 3L)
    assert(m("null_k") == 1L)
    assert(m("null_v") == 1L)
  }

  test("Checks.schemaDiff reports added/removed/retyped, ignores order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val old = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val neu = Seq(("a", 1, true)).toDF("name", "score", "flag")
      .select(col("score"), col("name"), col("flag")) // reordered too
    val d = graft.telemetry.Checks.schemaDiff(old, neu).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(d == Set(("flag", "added"), ("id", "removed"),
      ("score", "retyped")))
    // identical schemas (even reordered) diff empty
    assert(graft.telemetry.Checks.schemaDiff(old,
      old.select("score", "id", "name")).isEmpty)
  }
}
