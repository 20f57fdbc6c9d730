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

  /** All pairs with |leftValCol − rightValCol| ≤ tolerance, columns of
    * both sides carried through. Column names must be disjoint; the
    * value columns must be numeric (cast timestamps to long seconds
    * first).
    */
  def pointsWithin(left: DataFrame, right: DataFrame,
                   leftValCol: String, rightValCol: String,
                   tolerance: Long): DataFrame = {
    require(tolerance > 0, s"tolerance must be positive, got $tolerance")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"pointsWithin: rename overlapping columns first: ${overlap.mkString(", ")}")
    def bin(c: Column): Column = floor(c / tolerance).cast("long")
    val l = left.withColumn("__bin",
      explode(array(bin(col(leftValCol)) - 1, bin(col(leftValCol)),
        bin(col(leftValCol)) + 1)))
    val r = right.withColumn("__bin", bin(col(rightValCol)))
    l.join(r, Seq("__bin"))
      .filter(abs(col(leftValCol) - col(rightValCol)) <= tolerance)
      .drop("__bin")
  }
}
