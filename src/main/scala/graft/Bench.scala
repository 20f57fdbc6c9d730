package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: one JSON line with per-query and total seconds over
  * every SparkEntry query at $SPARK_GRAFT_SF_DIR.
  *
  * Methodology: one untimed warm-up pass (JIT + codegen compilation +
  * parquet footer/page cache — JMH-style steady state), then one timed
  * pass. The noop sink forces full evaluation of every output column;
  * count() would let Catalyst prune computed projections away. Session
  * timezone pinned to UTC like Verify so timed plans match the
  * correctness plans.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // A failed query must NOT read as a fast one: record it as failed
    // (negative sentinel duration + name in "failed") and keep going.
    def run(name: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch {
        case t: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
          false
      }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (name, fn) => run(name, fn) } // warm-up, untimed

    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = run(name, fn)
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -sec)
    }
    val failed = results.collect { case (k, v) if v < 0 => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2.abs).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
