package graft.r19

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 probe: decompose q_strip_spans into its phases — the span
  * df aggregate, the flagged join + covered explode, and the drop-set
  * reassembly — with per-phase seconds and job counts. Phases are cut
  * by materializing each intermediate to a noop sink, so the numbers
  * OVERLAP (each phase re-runs its upstream); the signal is the
  * marginal step between phases.
  */
object StripSpansDecomp {
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
      println(f"SPANDECOMP $label%-10s $sec%6.2f s jobs=${jobs.get() - j0}")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val w = 5
    for (i <- 1 to 4) {
      println(s"--- round $i")
      val tok = docs.select(col("doc_id").as("id"),
        graft.text.TextFunctions.tokens(col("text")).as("tk"))
      t("tokenize") { noop(tok) }
      val spans = tok.select(col("id"),
        posexplode(when(size(col("tk")) >= w,
          transform(sequence(lit(0), size(col("tk")) - w),
            i => concat_ws(" ", slice(col("tk"), i + 1, lit(w)))))
          .otherwise(array().cast("array<string>"))).as(Seq("start", "s")))
      t("spans") { noop(spans) }
      val sdf = tok.select(explode(
          graft.functions.TextHashExpressions.wordShingles(col("tk"), w))
          .as("s"))
        .groupBy("s").agg(count(lit(1)).as("sdf"))
      t("sdf") { noop(sdf) }
      val flagged = spans.join(sdf.filter(col("sdf") >= 2), "s")
      val covered = flagged
        .select(col("id"),
          explode(sequence(col("start"), col("start") + (w - 1))).as("pos"))
      t("covered") { noop(covered) }
      t("full") { noop(graft.dedup.Dedup.stripDupSpans(docs, "text",
        "doc_id", w = 5)) }
    }
    spark.stop()
  }
}
