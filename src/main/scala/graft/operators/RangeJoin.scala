package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe PURE range join — pairing rows by value proximity with NO
  * equi key. Spark plans a keyless inequality join as
  * BroadcastNestedLoopJoin (O(n·m) compare, broadcast bound on one
  * side); the standard fix is binning: quantize the join value into
  * bins of width = tolerance, explode the LEFT side into its bin and
  * both neighbors, equi-join on the bin, then apply the exact
  * predicate.
  *
  * Why this is correct and duplicate-free: |l − r| ≤ tol implies their
  * bins differ by at most 1, so r's single bin is always among l's
  * three; and because the RIGHT side keeps exactly one bin per row,
  * every qualifying pair meets in exactly one bin — no dedup pass.
  *
  * Cost: shuffle is 3×|left| + |right| bin-keyed rows (linear), and
  * compare work is per-bin-pair instead of n·m. Bin width = tolerance
  * is the sweet spot: wider bins add false candidates, narrower bins
  * would need more neighbor probes.
  */
object RangeJoin {

  /** Inputs must be name-disjoint AND free of the internal bin column —
    * withColumn would silently REPLACE a caller's `__bin` and the final
    * drop would delete it from the output.
    */
  private def checkColumns(op: String, left: DataFrame,
                           right: DataFrame): Unit = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"$op: rename overlapping columns first: ${overlap.mkString(", ")}")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      s"$op: __bin is reserved for the binning join — rename that column")
  }

  /** All pairs with |leftValCol − rightValCol| ≤ tolerance, columns of
    * both sides carried through. Column names must be disjoint; the
    * value columns must be numeric (cast timestamps to long seconds
    * first).
    */
  def pointsWithin(left: DataFrame, right: DataFrame,
                   leftValCol: String, rightValCol: String,
                   tolerance: Long): DataFrame = {
    require(tolerance > 0, s"tolerance must be positive, got $tolerance")
    checkColumns("pointsWithin", left, right)
    def bin(c: Column): Column = floor(c / tolerance).cast("long")
    val l = left.withColumn("__bin",
      explode(array(bin(col(leftValCol)) - 1, bin(col(leftValCol)),
        bin(col(leftValCol)) + 1)))
    val r = right.withColumn("__bin", bin(col(rightValCol)))
    l.join(r, Seq("__bin"))
      .filter(abs(col(leftValCol) - col(rightValCol)) <= tolerance)
      .drop("__bin")
  }

  /** All pairs of OVERLAPPING intervals ([lStart, lEnd] ∩ [rStart, rEnd]
    * ≠ ∅, both ends inclusive) — the session-overlap / slot-matching
    * join, again without any equi key. Both sides explode into every
    * `binWidth`-wide bin their interval covers; overlapping intervals
    * share at least one covered bin, so the equi-join on the bin finds
    * every pair. Unlike `pointsWithin`, a pair CAN meet in several bins,
    * so the result is deduplicated — callers must ensure input rows are
    * distinct (or carry id columns).
    *
    * Choose `binWidth` near the typical interval length: the explode
    * fan-out per row is interval/binWidth + 1 (cost of long intervals),
    * while too-wide bins put non-overlapping pairs in the same bin
    * (false candidates the exact filter then discards).
    */
  def intervalsOverlapping(left: DataFrame, right: DataFrame,
                           lStart: String, lEnd: String,
                           rStart: String, rEnd: String,
                           binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    checkColumns("intervalsOverlapping", left, right)
    def bins(s: String, e: String): Column =
      sequence(floor(col(s) / binWidth).cast("long"),
        floor(col(e) / binWidth).cast("long"))
    val l = left.filter(col(lStart) <= col(lEnd))
      .withColumn("__bin", explode(bins(lStart, lEnd)))
    val r = right.filter(col(rStart) <= col(rEnd))
      .withColumn("__bin", explode(bins(rStart, rEnd)))
    l.join(r, Seq("__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__bin")
      .distinct()
  }
}
