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

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) => run(fn) } // warm-up, untimed

    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      run(fn)
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
