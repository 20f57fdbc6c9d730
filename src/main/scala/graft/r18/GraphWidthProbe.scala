package graft.r18

import org.apache.spark.sql.SparkSession

/** Round-18 probe: per-round shuffle width A/B for the iterative graph
  * operators over the fixture mart (the GraphMart.edgePartitions
  * change). For each (operator, width) it reports one warmed noop-sink
  * run's seconds and Spark JOB count — the diagnostic that separates
  * "fewer tasks per stage" (the win the adaptive width buys) from "more
  * jobs per round" (the regression mode AQE can introduce when a width
  * change alters stage reuse).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.r18.GraphWidthProbe [w ...]
  */
object GraphWidthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val widths = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 1, 4, 1, 8)
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
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    val ops: Seq[(String, Int => org.apache.spark.sql.DataFrame)] = Seq(
      "hits" -> (w => graft.dedup.Components.hits(edges, iters = 5,
        numPartitions = w)),
      "pageRank" -> (w => graft.dedup.Components.pageRank(edges, iters = 5,
        numPartitions = w)))
    for ((name, fn) <- ops; w <- widths) {
      fn(w).write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(300); jobs = 0
      val t0 = System.nanoTime()
      fn(w).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"GRAPHWIDTH op=$name%-9s width=$w sec=$sec%6.2f jobs=$jobs")
    }
    spark.stop()
  }
}

/** Round-18 probe: the distributed star loop's cost structure on the
  * sf0.1 LSH dup graph (the q_dedup_clusters_star path) — seconds +
  * job count at widths, so the convergence-check and width changes are
  * measured against the real pair set, not argued.
  */
object StarLoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = graft.dedup.Dedup.minhashLshPairs(docs, "text", "doc_id",
      threshold = 0.7).select("ida", "idb")
    pairs.write.format("noop").mode("overwrite").save() // pin warm
    println(s"STARPROBE pairs=${pairs.count()}")
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    for (r <- 1 to 3) {
      jobs = 0
      val t0 = System.nanoTime()
      graft.dedup.Components.connectedComponents(pairs, driverEdgeLimit = 0L)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"STARPROBE run=$r sec=$sec%6.2f jobs=$jobs")
    }
    spark.stop()
  }
}
