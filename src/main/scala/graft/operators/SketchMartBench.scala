package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main for the persisted-sketch-mart payoff: distinct-user
  * rollups answered from the HLL mart vs recomputed from raw events.
  *
  * Methodology mirrors the other crossover benches: the scaled input is
  * MATERIALIZED to parquet first, so every path reads real files (replica r
  * shifts ts by r days and offsets user_id by r·10⁸ — more days AND new
  * users per replica, the shape a growing lakehouse actually has; per-type
  * exact distinct grows ~reps×). Four measurements per scale:
  *   raw_exact_s    groupBy(event_type) countDistinct over raw events —
  *                  the full-rescan baseline every rollup pays without a mart
  *   raw_approx_s   approx_count_distinct(2%) over raw — one pass, but
  *                  STILL rescans raw and its HLL++ state dies with the job
  *   mart_build_s   one-time fine-grain (dt×type) sketch build + write —
  *                  the amortized cost, paid once per ingest day at scale
  *   mart_rollup_s  hll_union_agg + estimate over the persisted mart —
  *                  what every subsequent rollup costs
  * plus raw_mb / mart_mb (the bytes each path must read) and a 5% accuracy
  * gate of the mart estimate against raw exact at every scale.
  *
  * What the numbers mean at 100 TB: raw paths scale with EVENT volume;
  * the mart rollup scales with #groups × sketch size (KB per group,
  * data-volume-independent). The bytes ratio is the real story — the mart
  * stands in for the raw scan at ~1000:1 and the gap widens linearly with
  * retained history.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.operators.SketchMartBench
  *   [reps…] (default 1 5 10); prints one JSON line.
  */
object SketchMartBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repsList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 5, 10)
    val rounds = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Unit): Double = {
      var best = Double.MaxValue
      (1 to rounds).foreach { _ =>
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }
    def dirMb(p: String): Double = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p)) / 1e6
    }

    val base = Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"), col("event_type"))
    val out = new StringBuilder
    repsList.foreach { reps =>
      val rawDir = s"/tmp/sketch_mart_bench/raw_$reps"
      val martDir = s"/tmp/sketch_mart_bench/mart_$reps"
      val scaled = (0 until reps).map { r =>
        base
          .withColumn("ts", col("ts") + expr(s"INTERVAL $r DAYS"))
          .withColumn("user_id", col("user_id") + lit(r * 100000000L))
      }.reduce(_ unionAll _)
      scaled.write.mode("overwrite").parquet(rawDir)
      val raw = spark.read.parquet(rawDir)

      val rawExactS = timed {
        raw.groupBy("event_type")
          .agg(countDistinct(col("user_id"))).collect()
      }
      val rawApproxS = timed {
        raw.groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), 0.02)).collect()
      }
      val martBuildS = timed {
        Sketches.hllMart(
            raw.withColumn("dt", to_date(date_trunc("day", col("ts")))),
            Seq("dt", "event_type"), "user_id")
          .write.mode("overwrite").parquet(martDir)
      }
      val mart = spark.read.parquet(martDir)
      val martRollupS = timed {
        Sketches.rollupMart(mart, Seq("event_type"))
          .select(col("event_type"), Sketches.estimate(col("hll")).as("est"))
          .collect()
      }

      // accuracy gate: mart estimate within 5% of raw exact, every type
      val exact = raw.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val est = Sketches.rollupMart(mart, Seq("event_type"))
        .select(col("event_type"), Sketches.estimate(col("hll")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, n) =>
        require(math.abs(est(k).toDouble - n) <= 0.05 * n,
          s"reps=$reps $k: mart est ${est(k)} vs exact $n breaks 5%")
      }

      val martRows = mart.count()
      out.append(
        f"""{"reps":$reps,"raw_exact_s":$rawExactS%.3f,"raw_approx_s":$rawApproxS%.3f,""" +
        f""""mart_build_s":$martBuildS%.3f,"mart_rollup_s":$martRollupS%.3f,""" +
        f""""raw_mb":${dirMb(rawDir)}%.1f,"mart_mb":${dirMb(martDir)}%.2f,""" +
        f""""mart_rows":$martRows,"accuracy_5pct":"pass"},""")
    }
    println(s"""{"bench":"sketch_mart","sf":"$sfDir","scales":[${out.dropRight(1)}]}""")
    spark.stop()
  }
}
