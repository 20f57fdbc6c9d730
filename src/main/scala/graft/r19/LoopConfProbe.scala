package graft.r19

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-19 probe: per-round ORCHESTRATION cost of the eager graph
  * loops. Round 18's StarLoopProbe negative result showed AQE-off
  * alone collapses job count (39 → 11) but LOSES time because every
  * non-adaptive exchange then runs at the session's 32 shuffle
  * partitions. The untested combination is AQE off AND
  * spark.sql.shuffle.partitions pinned to the measured adaptive width
  * (GraphMart.edgePartitions — 1 at sf0.1, thousands at 100 TB): few
  * jobs per round AND few tasks per exchange. This probe A/Bs the two
  * regimes interleaved on the real fixture mart, reporting seconds and
  * job counts, so the loop-conf decision is measured, not argued.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.r19.LoopConfProbe
  */
object LoopConfProbe {

  /** Run `f` with the given SQL confs set, restoring priors after —
    * the candidate integration shape (set around the eager loop at
    * construction; the returned readout plan executes under the
    * caller's session confs).
    */
  def withConf[T](spark: SparkSession, kvs: (String, String)*)(f: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

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
    val edges = graft.operators.GraphMart.cachedEdges(spark, sfDir)
      .select("src", "dst")
    val edgesW = graft.operators.GraphMart.cachedEdges(spark, sfDir)
    val width = graft.operators.GraphMart.edgePartitions(spark, sfDir)
    println(s"LOOPCONF width=$width")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)

    def landmarks3 =
      edges.select(org.apache.spark.sql.functions.col("src").as("id"))
        .unionAll(edges.select(org.apache.spark.sql.functions.col("dst").as("id")))
        .distinct().orderBy("id").limit(3)
        .collect().map(_.getLong(0)).toSeq

    val lms = landmarks3
    val C = graft.dedup.Components
    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "pageRank" -> (w => C.pageRank(edges, iters = 5, numPartitions = w)),
      "hits" -> (w => C.hits(edges, iters = 5, numPartitions = w)),
      "coreness" -> (w => C.coreness(edges, maxRounds = 30, numPartitions = w)),
      "betweenness" -> (w =>
        C.bfsBetweenness(edges, lms, numPartitions = w)),
      "ppr" -> (w =>
        C.personalizedPageRank(edges, lms, iters = 5, numPartitions = w)),
      "lpaW" -> (w =>
        C.labelPropagationWeighted(edgesW, iters = 5, numPartitions = w)))

    def run(name: String, mode: String, fn: Int => DataFrame): Unit = {
      def once(): (Double, Int) = {
        org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark.sparkContext)
        jobs.set(0)
        val t0 = System.nanoTime()
        val df =
          if (mode == "narrow")
            withConf(spark,
              "spark.sql.adaptive.enabled" -> "false",
              "spark.sql.shuffle.partitions" -> width.toString)(fn(width))
          else fn(width)
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark.sparkContext)
        (sec, jobs.get())
      }
      once() // warm
      val (s1, j1) = once()
      val (s2, j2) = once()
      println(f"LOOPCONF op=$name%-12s mode=$mode%-7s sec=$s1%6.2f/$s2%6.2f jobs=$j1/$j2")
    }

    // interleaved A/B so box drift hits both modes equally
    for ((name, fn) <- ops; mode <- Seq("aqe", "narrow", "aqe", "narrow")) {
      run(name, mode, fn)
    }
    spark.stop()
  }
}
