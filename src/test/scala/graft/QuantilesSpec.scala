package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._

/** Histogram-quantile-mart properties beyond the oracle comparison:
  * hand-derivable read-off values, the one-bin-width error bound vs the
  * exact percentile, lossless rollup, and edge quantiles.
  */
class QuantilesSpec extends SparkSpecBase {
  import spark.implicits._

  test("quantile read-off is hand-derivable on 1..100 with width 10") {
    val df = (1 to 100).map(v => ("a", v.toDouble)).toDF("g", "v")
    val hist = Quantiles.histMart(df, Seq("g"), col("v"), 10.0)
    // bins: floor(v/10) -> bin 0 holds 1..9 (9 values), bins 1..9 hold
    // 10 each, bin 10 holds {100}. p50: ceil(0.5*100)=50; cum(bin4)=49,
    // cum(bin5)=59 -> bin 5, upper edge 60. p99: ceil(99)=99 ->
    // cum(bin9)=99 -> bin 9, edge 100. p100 -> last bin 10, edge 110.
    val r = Quantiles.quantiles(hist, Seq("g"), 10.0,
        Seq(("p50", 1, 2), ("p99", 99, 100), ("p100", 1, 1)))
      .select("p50", "p99", "p100", "n_values")
      .as[(Double, Double, Double, Long)].head()
    assert(r == ((60.0, 100.0, 110.0, 100L)), s"got $r")
  }

  test("estimates sit within one bin width ABOVE the exact quantile") {
    val rnd = new scala.util.Random(7)
    val vals = (1 to 5000).map(_ => ("g", rnd.nextGaussian() * 25 + 100))
    val df = vals.toDF("g", "v")
    val w = 5.0
    val hist = Quantiles.histMart(df, Seq("g"), col("v"), w)
    val (p50, p90) = Quantiles.quantiles(hist, Seq("g"), w,
        Seq(("p50", 1, 2), ("p90", 9, 10)))
      .select("p50", "p90").as[(Double, Double)].head()
    val Array(e50, e90) = df.stat.approxQuantile("v", Array(0.5, 0.9), 0.0)
    assert(p50 >= e50 && p50 <= e50 + w, s"p50 $p50 vs exact $e50 (w=$w)")
    assert(p90 >= e90 && p90 <= e90 + w, s"p90 $p90 vs exact $e90")
  }

  test("read-offs are monotone in q on random data") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 2000).map(i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextDouble() * 500 - 100))
      .toDF("g", "v")
    val hist = Quantiles.histMart(df, Seq("g"), col("v"), 7.0)
    Quantiles.quantiles(hist, Seq("g"), 7.0,
        Seq(("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10), ("p100", 1, 1)))
      .select("p10", "p50", "p90", "p100")
      .as[(Double, Double, Double, Double)].collect().foreach {
        case (a, b, c, d) =>
          assert(a <= b && b <= c && c <= d,
            s"quantile read-offs not monotone: $a $b $c $d")
      }
  }

  test("rollup of a fine mart equals the direct coarse histogram") {
    val rows = for (g <- Seq("x", "y"); d <- 1 to 20; i <- 1 to 50)
      yield (g, d, (i * d % 97).toDouble)
    val df = rows.toDF("g", "d", "v").repartition(9)
    val fine = Quantiles.histMart(df, Seq("g", "d"), col("v"), 10.0)
    val rolled = Quantiles.rollup(fine, Seq("g"))
      .orderBy("g", "bin").as[(String, Long, Long)].collect()
    val direct = Quantiles.histMart(df, Seq("g"), col("v"), 10.0)
      .orderBy("g", "bin").as[(String, Long, Long)].collect()
    assert(rolled.toSeq == direct.toSeq,
      "bin-count rollup must equal the histogram built at coarse grain")
  }
}
