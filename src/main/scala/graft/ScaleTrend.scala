package graft

import org.apache.spark.sql.SparkSession

/** The decade-scale TREND probe (round 18, VERDICT r17 #5): one
  * rerunnable main that times the heaviest operators at two fixture
  * decades and emits ONE artifact, so decade-scale regressions become a
  * diff against the committed probes/rN/scale_trend.json instead of a
  * per-round re-derivation from ad-hoc DedupProbe/AnnProbe runs.
  *
  * Legs: each (fixture dir × query) runs once COLD (fresh artifact
  * registry — `Artifacts.releaseAll` + cache clear before every leg, so
  * a leg pays its own sketch/model builds exactly like a fresh pipeline
  * call) and once REPEAT (same session — what a bench pass or
  * incremental batch pays: plan-cache, pins, memos all warm). Queries
  * are SparkEntry.queries entries, so what's timed here is byte-for-byte
  * what the driver bench and the DuckDB oracle run.
  *
  * Knobs: SPARK_GRAFT_TREND_DOC_DIRS (default "/tmp/sf10d,/tmp/sf100d" —
  * the d100/d1000 diversify fixtures, see the memory recipe),
  * SPARK_GRAFT_TREND_EMB_DIRS (default "/root/testdata/sf0.1,/tmp/sf10e"
  * — 2k and 200k vectors), SPARK_GRAFT_TREND_SKIP (comma list of query
  * names to drop), SPARK_GRAFT_TREND_OUT (default scale_trend_last.json),
  * SPARK_GRAFT_CPUS.
  */
object ScaleTrend {

  /** The trend set: the heaviest settled queries per BENCH plan audits
    * (dedup enumeration + clustering, span stripping ± char verify,
    * prefix-filtered jaccard, the calibrated funnel) plus the IVFPQ ANN
    * sweep on the embeddings fixtures.
    */
  val DocQueries: Seq[String] = Seq(
    "q_dedup_simhash_wide_adaptive",
    "q_dedup_clusters_simhash_adaptive",
    "q_strip_spans",
    "q_strip_spans_verified",
    "q_dedup_jaccard_prefix",
    "q_corpus_funnel_calibrated")
  val EmbQueries: Seq[String] = Seq("q_ann_ivfpq")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val docDirs = sys.env.getOrElse("SPARK_GRAFT_TREND_DOC_DIRS",
      "/tmp/sf10d,/tmp/sf100d").split(",").map(_.trim).filter(_.nonEmpty)
    val embDirs = sys.env.getOrElse("SPARK_GRAFT_TREND_EMB_DIRS",
      "/root/testdata/sf0.1,/tmp/sf10e").split(",").map(_.trim)
      .filter(_.nonEmpty)
    val skip = sys.env.getOrElse("SPARK_GRAFT_TREND_SKIP", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def r2(x: Double) = math.round(x * 100) / 100.0

    val legs = scala.collection.mutable.ArrayBuffer.empty[String]
    val plan = docDirs.toSeq.map(d => d -> DocQueries) ++
      embDirs.toSeq.map(d => d -> EmbQueries)
    plan.foreach { case (dir, queries) =>
      queries.filterNot(skip).foreach { name =>
        val fn = SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown trend query: $name"))
        // cold = a fresh pipeline call: no pins, no memos, no plan cache
        graft.operators.Artifacts.releaseAll(spark)
        spark.catalog.clearCache()
        def run(): Unit =
          fn(spark, dir).write.format("noop").mode("overwrite").save()
        val secCold = timed(run())
        val secRepeat = timed(run())
        val rows = fn(spark, dir).count()
        legs += s"""{"dir":"$dir","query":"$name","rows":$rows,""" +
          s""""sec_cold":${r2(secCold)},"sec_repeat":${r2(secRepeat)}}"""
        println(s"TREND $dir $name cold=${r2(secCold)} " +
          s"repeat=${r2(secRepeat)} rows=$rows")
      }
    }
    graft.operators.Artifacts.releaseAll(spark)

    val line = s"""{"metric":"scale_trend","cpus":$cpus,""" +
      s""""legs":[${legs.mkString(",")}]}"""
    println(line)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_TREND_OUT",
      "scale_trend_last.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), line + "\n")
    catch { case t: Throwable =>
      System.err.println(s"TREND: could not write $outFile: ${t.getMessage}")
    }
    spark.stop()
  }
}
