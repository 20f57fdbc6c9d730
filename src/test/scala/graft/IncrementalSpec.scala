package graft

import graft.telemetry._
import java.nio.file.{Files, Paths}

/** Top-level for Spark encoder codegen (see StreamingSpec note). */
case class BronzeMetric(worker_name: String, machine: String,
                        start_time: Long, end_time: Long,
                        machine_cpu_iowait: Double, machine_cpu_kernel: Double,
                        machine_cpu_usr: Double, machine_gpu: Double,
                        machine_load_1: Double, machine_net_receive: Double,
                        machine_num_worker: Double, machine_cpu: Double)

/** Incremental maintenance must (a) produce EXACTLY the state a full
  * rebuild over the combined raw data would, and (b) physically rewrite
  * only the touched dt partitions.
  */
class IncrementalSpec extends SparkSpecBase {

  private val day0 = 86400L * 100

  private def metricsCsv(days: Seq[Int], rowsPerDay: Int,
                         gpuOf: (Int, Int) => Double): String = {
    val sb = new StringBuilder(
      "worker_name,machine,start_time,end_time,machine_cpu_iowait," +
        "machine_cpu_kernel,machine_cpu_usr,machine_gpu,machine_load_1," +
        "machine_net_receive,machine_num_worker,machine_cpu\n")
    for (d <- days; i <- 0 until rowsPerDay) {
      val ts = day0 + d * 86400L + i * 7000L
      sb.append(s"w$i,m${i % 4},${ts - 300},$ts,0.1,0.2,0.3,${gpuOf(d, i)}," +
        s"1.5,100.0,2,50.0\n")
    }
    sb.toString
  }

  test("append touches only its days; result equals a full rebuild") {
    val base = Files.createTempDirectory("graft-inc").toString
    val rawDir = s"$base/raw"; val lakeDir = s"$base/lake"
    new java.io.File(rawDir).mkdirs()

    // history: days 0-9
    Files.writeString(Paths.get(s"$rawDir/pai_machine_metric.csv"),
      metricsCsv(0 until 10, 6, (d, i) => 30.0 + d + i))
    Bronze.ingestTable(spark, rawDir, lakeDir,
      Bronze.tables.find(_.name == "bronze_machine_metrics").get)
    assert(Incremental.initPartitionedGold(spark, lakeDir) == 10L)

    // snapshot the physical files of an untouched day's partition
    val goldDir = s"$lakeDir/gold/gold_cluster_util_daily_part.parquet"
    val untouchedPart = new java.io.File(goldDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
      .sortBy(_.getName).head // earliest day — not in the batch below
    val before = untouchedPart.listFiles().map(f =>
      f.getName -> f.lastModified()).toMap

    // new batch: more rows for existing day 7 + a brand-new day 12
    val batchCsv = s"$base/batch.csv"
    Files.writeString(Paths.get(batchCsv),
      metricsCsv(Seq(7, 12), 6, (d, i) => 90.0 + i))
    val res = Incremental.appendMetrics(spark, batchCsv, lakeDir)
    assert(res.newRows == 12)
    assert(res.affectedDays.size == 2 && res.goldRows == 2)

    // (a) parity: partitioned gold == full rebuild over combined bronze
    val incremental = Incremental.readPartitionedGold(spark, lakeDir)
      .select("dt", "avg_gpu_util", "p95_gpu_util", "avg_cpu_util")
      .orderBy("dt").collect().map(_.toSeq)
    val rebuilt = Gold.clusterUtilDaily(Silver.gpuTimeseries(
        Bronze.readBronze(spark, lakeDir, "bronze_machine_metrics")))
      .select("dt", "avg_gpu_util", "p95_gpu_util", "avg_cpu_util")
      .orderBy("dt").collect().map(_.toSeq)
    assert(incremental.length == 11) // days 0-9 plus new day 12
    assert(incremental.toSeq == rebuilt.toSeq, "incremental != full rebuild")

    // (b) untouched partition files were not rewritten
    val after = untouchedPart.listFiles().map(f =>
      f.getName -> f.lastModified()).toMap
    assert(after == before,
      s"untouched partition ${untouchedPart.getName} was rewritten")

    // day 7 now includes the 90+ readings — its avg must exceed history's
    val day7 = Incremental.readPartitionedGold(spark, lakeDir)
      .filter(org.apache.spark.sql.functions.col("dt") ===
        new java.sql.Timestamp((day0 + 7 * 86400L) / 86400L * 86400L * 1000L))
    assert(day7.count() == 1)
    assert(day7.collect()(0).getAs[Double]("avg_gpu_util") > 40.0)
  }

  test("streaming micro-batches maintain the same gold as batch appends") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val base = Files.createTempDirectory("graft-inc-stream").toString
    val rawDir = s"$base/raw"; val lakeDir = s"$base/lake"
    new java.io.File(rawDir).mkdirs()
    Files.writeString(Paths.get(s"$rawDir/pai_machine_metric.csv"),
      metricsCsv(0 until 5, 4, (d, i) => 30.0 + d))
    Bronze.ingestTable(spark, rawDir, lakeDir,
      Bronze.tables.find(_.name == "bronze_machine_metrics").get)
    Incremental.initPartitionedGold(spark, lakeDir)

    def metric(d: Int, i: Int, gpu: Double) = {
      val ts = day0 + d * 86400L + i * 7000L
      BronzeMetric(s"w$i", s"m${i % 4}", ts - 300, ts,
        0.1, 0.2, 0.3, gpu, 1.5, 100.0, 2.0, 50.0)
    }
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[BronzeMetric]
    val q = Incremental.streamAppendMetrics(in.toDF(), lakeDir,
      s"$base/ckpt")
    try {
      in.addData(metric(2, 10, 80.0), metric(7, 0, 60.0)) // update + new day
      q.processAllAvailable()
      in.addData(metric(7, 1, 70.0)) // second micro-batch, same new day
      q.processAllAvailable()
    } finally q.stop()

    val incremental = Incremental.readPartitionedGold(spark, lakeDir)
      .select("dt", "avg_gpu_util", "p95_gpu_util", "avg_cpu_util")
      .orderBy("dt").collect().map(_.toSeq)
    val rebuilt = Gold.clusterUtilDaily(Silver.gpuTimeseries(
        Bronze.readBronze(spark, lakeDir, "bronze_machine_metrics")))
      .select("dt", "avg_gpu_util", "p95_gpu_util", "avg_cpu_util")
      .orderBy("dt").collect().map(_.toSeq)
    assert(incremental.length == 6) // days 0-4 plus streamed day 7
    assert(incremental.toSeq == rebuilt.toSeq,
      "streamed incremental != full rebuild")
  }

  test("replayed batch append leaves each row in bronze exactly once") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-replay").toString
    val rawDir = s"$base/raw"; val lakeDir = s"$base/lake"
    new java.io.File(rawDir).mkdirs()
    Files.writeString(Paths.get(s"$rawDir/pai_machine_metric.csv"),
      metricsCsv(0 until 2, 3, (d, i) => 30.0))
    Bronze.ingestTable(spark, rawDir, lakeDir,
      Bronze.tables.find(_.name == "bronze_machine_metrics").get)
    Incremental.initPartitionedGold(spark, lakeDir)
    def metric(i: Int) = {
      val ts = day0 + 5 * 86400L + i * 7000L
      (s"w$i", s"m$i", ts - 300, ts, 0.1, 0.2, 0.3, 40.0, 1.5, 100.0, 2.0, 50.0)
    }
    val batch = Seq(metric(0), metric(1)).toDF(
      "worker_name", "machine", "start_time", "end_time",
      "machine_cpu_iowait", "machine_cpu_kernel", "machine_cpu_usr",
      "machine_gpu", "machine_load_1", "machine_net_receive",
      "machine_num_worker", "machine_cpu")
    // simulate a crashed-then-replayed epoch: same batchId applied twice
    // WITHOUT a commit marker in between (the at-least-once worst case)
    Incremental.appendMetricsFrame(batch, lakeDir, batchId = Some(42L))
    Incremental.appendMetricsFrame(batch, lakeDir, batchId = Some(42L))
    val bronze = Bronze.readBronze(spark, lakeDir, "bronze_machine_metrics")
    assert(bronze.count() == 6 + 2, "replay duplicated the batch rows")
    // gold for the batch day is computed from the single copy
    val day5 = Incremental.readPartitionedGold(spark, lakeDir)
      .filter(org.apache.spark.sql.functions.col("avg_gpu_util") === 40.0)
    assert(day5.count() == 1)
  }

  test("commitOnce skips a replayed epoch but reruns an uncommitted one") {
    val lakeDir = Files.createTempDirectory("graft-ledger").toString
    var runs = 0
    assert(Incremental.commitOnce(lakeDir, 7L) { runs += 1 })
    assert(!Incremental.commitOnce(lakeDir, 7L) { runs += 1 }) // replay → skip
    assert(runs == 1)
    // a crash BEFORE the marker write replays the body (at-least-once in,
    // exactly-once out)
    intercept[RuntimeException] {
      Incremental.commitOnce(lakeDir, 8L) { throw new RuntimeException("boom") }
    }
    assert(Incremental.commitOnce(lakeDir, 8L) { runs += 1 })
    assert(runs == 2)
  }

  test("empty batch is a no-op on gold") {
    val base = Files.createTempDirectory("graft-inc-empty").toString
    val rawDir = s"$base/raw"; val lakeDir = s"$base/lake"
    new java.io.File(rawDir).mkdirs()
    Files.writeString(Paths.get(s"$rawDir/pai_machine_metric.csv"),
      metricsCsv(0 until 3, 4, (d, i) => 30.0))
    Bronze.ingestTable(spark, rawDir, lakeDir,
      Bronze.tables.find(_.name == "bronze_machine_metrics").get)
    Incremental.initPartitionedGold(spark, lakeDir)
    val emptyCsv = s"$base/empty.csv"
    Files.writeString(Paths.get(emptyCsv),
      metricsCsv(Nil, 0, (_, _) => 0.0))
    val res = Incremental.appendMetrics(spark, emptyCsv, lakeDir)
    assert(res.newRows == 0 && res.affectedDays.isEmpty && res.goldRows == 0)
    assert(Incremental.readPartitionedGold(spark, lakeDir).count() == 3)
  }
}
