package graft.r19

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 probe: decompose q_graph_triangles into the cold mart
  * build (the witness's deliberate cost) and the wedge enumeration,
  * with per-phase seconds and job counts.
  */
object TrianglesDecomp {
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
      println(f"TRIDECOMP $label%-10s $sec%6.2f s jobs=${jobs.get() - j0}")
      r
    }
    for (i <- 1 to 4) {
      println(s"--- round $i")
      val edges = t("build") {
        graft.operators.GraphMart
          .edges(graft.operators.GraphMart.coOrderCounts(
            graft.Tables.lineitem(spark, sfDir)))
          .select(col("src").as("ida"), col("dst").as("idb"))
          .localCheckpoint(true)
      }
      t("wedges") {
        graft.dedup.Components.triangleCounts(edges).orderBy("id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
