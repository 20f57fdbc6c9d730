package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted, mergeable QUANTILE marts — the third leg of the sketch-mart
  * trio (Sketches.scala: HLL count-distinct; Kmv.scala: distinct-count
  * set algebra; here: distributions).
  *
  * Exact `percentile` (q_quantile_grid) sorts raw values per group per
  * query; `approx_percentile`'s digest state is engine-internal and dies
  * with the job. The shape that survives 100 TB is a fixed-width
  * HISTOGRAM mart: bin counts at fine grain (day × type), persisted
  * once; any coarser distribution is the SUM of bin counts (trivially
  * lossless — the oracle hash-checks rollup-vs-raw equality), and any
  * quantile reads off the merged bins' cumulative counts with error
  * bounded by one bin width. Everything is integer (bin ids, counts,
  * ceil-threshold comparisons done cross-multiplied in longs), so the
  * whole mart → rollup → quantile path hashes bit-exact against DuckDB.
  *
  * Fixed-width bins (same `floor(value / width)` rule as q_histogram)
  * rather than t-digest/KLL: the adaptive sketches trade determinism for
  * relative-error tails, and their merge is order-sensitive — a
  * partitioning-dependent result can't be oracle-hashed and silently
  * drifts between runs at scale. When the value range is known (GPU
  * utilization, latency ms, scores — the telemetry cases), fixed bins
  * are smaller, mergeable by +, and exactly reproducible. Unknown-range
  * data needs a range scan first; that is one cheap extra pass, paid
  * once at mart-build time.
  *
  * Quantile rule: the q-quantile is the smallest bin whose cumulative
  * count reaches ceil(q · total) — for integers, cum ≥ ceil(a/b) iff
  * cum·b ≥ a, so the comparison is `cum * qDen >= qNum * total`: no
  * floats anywhere. The reported value is the bin's UPPER edge
  * ((bin+1)·width): a conservative estimate, at most one bin width
  * above the true quantile.
  */
object Quantiles {

  /** Fine-grain histogram mart: one row per (grain, bin) with the row
    * count. This is the table you persist; size ≤ #groups × #occupied
    * bins. One partial-aggregated shuffle on (grain, bin).
    */
  def histMart(df: DataFrame, grainCols: Seq[String], value: Column,
               binWidth: Double): DataFrame = {
    require(binWidth > 0, s"histMart: binWidth $binWidth must be > 0")
    df.filter(value.isNotNull)
      .groupBy(grainCols.map(col) :+
        floor(value / binWidth).cast("long").as("bin"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Merge a histogram mart to a coarser grain — bin counts ADD, so the
    * merge is exactly lossless. Reads the mart, not raw data.
    */
  def rollup(mart: DataFrame, toCols: Seq[String]): DataFrame =
    mart.groupBy(toCols.map(col) :+ col("bin"): _*)
      .agg(sum(col("n")).as("n"))

  /** Read quantiles off a histogram: for each (name, num, den) with
    * 0 < num ≤ den, the smallest bin whose cumulative count reaches
    * ceil(num/den · total), reported as the bin's upper edge. The
    * cumulative window is per-GROUP over OCCUPIED BINS — bounded by
    * range/width (hundreds), not by row count, so the sort is noise at
    * any data scale.
    */
  def quantiles(hist: DataFrame, grainCols: Seq[String], binWidth: Double,
                qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "quantiles: empty quantile list")
    qs.foreach { case (nm, num, den) =>
      require(num > 0 && num <= den && den > 0,
        s"quantiles: $nm = $num/$den out of (0, 1]")
    }
    val g = grainCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("bin"))
    val cum = hist
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(g: _*)))
    val aggs = qs.map { case (nm, num, den) =>
      round((min(when(col("cum") * den >= col("total") * num, col("bin")))
        + 1L) * binWidth, 6).as(nm)
    } :+ max(col("total")).as("n_values")
    cum.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
  }
}
