package graft.operators

import graft.dedup.Components
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main for the graph family's two open bench questions:
  *
  * 1. MART PAYOFF — build-once vs per-query: the co-order edge build
  *    (lineitem self-join + countDistinct) used to run inside all 12
  *    graph queries; the mart runs it once per session. Measured here
  *    as (a) the cold build+checkpoint cost, (b) a representative
  *    5-round operator (pageRank) off the checkpointed mart, and
  *    (c) the same operator with the build inlined (the pre-mart
  *    query shape) — (c) − (b) ≈ the per-query tax the mart removed,
  *    ×11 mart-fed queries ≈ the suite-level saving.
  *
  * 2. KCORE ROUND STRUCTURE — Components.kCorePeelTrace pins the peel
  *    to a fixed round count and reports per-round (liveNodes,
  *    liveEdges, seconds), separating round COUNT (data-dependent)
  *    from per-round COST (what must stay linear at 10×): the honest
  *    scale statement for the one data-dependent 10× table entry.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.operators.GraphMartBench
  *   [peelRounds] (default 15); prints one JSON line plus a per-round
  *   trace table.
  */
object GraphMartBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val peelRounds = args.headOption.map(_.toInt).getOrElse(15)
    val rounds = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // NOTE: spark.driver.memory cannot be set here — the local JVM is
      // already running; pass heap as a JVM option at launch instead
      // (e.g. sbt -J-Xmx16g). A builder-set value is silently ignored.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Unit): Double = {
      var best = Double.MaxValue
      (1 to rounds).foreach { _ =>
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }

    def freshBuild() =
      GraphMart.edges(GraphMart.coOrderCounts(
          spark.read.parquet(s"$sfDir/lineitem.parquet")))
        .repartition(8, col("src"))

    // (a) cold build + eager checkpoint (what the mart pays once)
    freshBuild().count() // parquet footer warm-up, untimed
    val buildSec = timed { freshBuild().localCheckpoint(true).count() }

    // (b) operator off the checkpointed mart (the mart-fed query shape)
    val mart = freshBuild().localCheckpoint(true)
    val opMartSec = timed {
      Components.pageRank(mart.select("src", "dst"), iters = 5)
        .write.format("noop").mode("overwrite").save()
    }

    // (c) operator with the build inlined (the pre-mart query shape)
    val opInlineSec = timed {
      Components.pageRank(freshBuild().select("src", "dst"), iters = 5)
        .write.format("noop").mode("overwrite").save()
    }

    // kcore fixed-rounds trace (one pass — per-round numbers, not medians;
    // the trace is about SHAPE: where the live set collapses and whether
    // per-round cost tracks live edges)
    val trace = Components.kCorePeelTrace(
      mart.select("src", "dst"), k = 3, rounds = peelRounds)
    trace.foreach { case (r, n, m, s) =>
      println(f"[peel] round=$r%3d liveNodes=$n%8d liveEdges=$m%8d sec=$s%7.3f")
    }
    val steady = trace.drop(trace.size / 2).map(_._4)

    println(
      s"""{"metric":"graph_mart_bench","sf_dir":"$sfDir",""" +
        f""""build_sec":$buildSec%.3f,"pagerank_mart_sec":$opMartSec%.3f,""" +
        f""""pagerank_inline_sec":$opInlineSec%.3f,""" +
        f""""per_query_tax_sec":${opInlineSec - opMartSec}%.3f,""" +
        s""""peel_rounds":$peelRounds,""" +
        f""""peel_round_sec_steady":${steady.sum / steady.size}%.3f,""" +
        s""""peel_final_live_edges":${trace.last._3}}""")
    spark.stop()
  }
}
