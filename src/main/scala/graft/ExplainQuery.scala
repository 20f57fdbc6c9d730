package graft

import org.apache.spark.sql.SparkSession

/** Dev main: print the executed plan and one timed noop-sink run of a
  * single SparkEntry query against an arbitrary fixture dir, with
  * optional session-conf overrides — the tool behind planner-decides
  * evidence like the q14 broadcast→shuffle flip (BASELINE.md round 9):
  * same unhinted query code, different relation sizes/conf, different
  * physical join, both timed.
  *
  * Usage: runMain graft.ExplainQuery <queryName> [sfDir] [k=v ...]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val confs = args.drop(2).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save() // warm-up (JIT+cache)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    // executedPlan AFTER the run so AQE's final decisions are visible
    println(df.queryExecution.executedPlan.toString)
    println(f"""{"query":"$name","sf":"$sfDir","sec":$sec%.3f}""")
    spark.stop()
  }
}
