package graft

import org.apache.spark.sql.SparkSession

/** Dev main: write `.explain("formatted")` output for named SparkEntry
  * queries to files — the plan-evidence artifact the optimization rounds
  * commit under plans/r<N>/ (guide §1: capture the plan shape — Exchange
  * count, join strategy, PushedFilters/ReadSchema — before and after
  * each change, so plan claims are checkable without running Spark).
  *
  * The formatted plan is captured AFTER one noop-sink execution so AQE's
  * final decisions (coalesced reads, runtime join swaps) are what lands
  * in the file, not the pre-execution placeholder plan.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query>...
  *   writes <outDir>/<query>_<suffix>.txt per query
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <query name>...")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
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
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name (see SparkEntry.queries)"))
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), formatted)
      println(s"PLANDUMP wrote $outDir/${name}_$suffix.txt " +
        s"(${formatted.length} chars)")
    }
    val released = graft.operators.Artifacts.releaseAll(spark)
    if (released > 0)
      System.err.println(s"PLANDUMP: released $released pinned artifacts")
    spark.stop()
  }
}
