package graft.r19

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 probe: decompose q_window_rank_family into its phases —
  * the two-phase positioned build (range shuffle + checkpoint +
  * bounded collect), the top-2 heap branch, and the assembled readout
  * — with per-phase seconds and job counts, so the optimization
  * targets the measured term instead of the biggest-looking operator.
  */
object RankFamilyDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    def t[T](label: String)(f: => T): T = {
      org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark.sparkContext)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark.sparkContext)
      println(f"RANKDECOMP $label%-12s $sec%6.2f s jobs=${jobs.get() - j0}")
      r
    }
    for (i <- 1 to 4) {
      println(s"--- round $i")
      val pos = t("positions") {
        graft.operators.DistributedRank.withPositions(
          graft.Tables.orders(spark, sfDir)
            .select("o_orderpriority", "o_orderkey", "o_totalprice"),
          "o_orderpriority",
          Seq(col("o_totalprice").desc, col("o_orderkey")))
      }
      val second = t("top2") {
        val top2 = graft.plans.TopKPerKey.perKey(
          graft.Tables.orders(spark, sfDir)
            .select("o_orderpriority", "o_orderkey", "o_totalprice"),
          Seq("o_orderpriority"),
          Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
        top2
          .groupBy(col("o_orderpriority").as("__p2"))
          .agg(count(lit(1)).as("__n2"),
            min(struct(col("o_totalprice").as("p"),
              (-col("o_orderkey")).as("nk"))).as("__m"))
          .select(col("__p2"),
            when(col("__n2") >= 2, col("__m.p")).as("second_highest"))
      }
      t("readout") {
        pos.join(broadcast(second),
            col("o_orderpriority") === col("__p2"), "left")
          .select(col("o_orderpriority"), col("o_orderkey"),
            col("o_totalprice"),
            graft.operators.DistributedRank.ntileFromPos(4).as("quartile"),
            round(when(col("n") > 1,
              (col("pos") - 1).cast("double") / (col("n") - 1))
              .otherwise(0.0), 6).as("pct_rank"),
            round(col("pos").cast("double") / col("n"), 6).as("cume"),
            col("second_highest"))
          .orderBy("o_orderpriority", "o_orderkey")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
