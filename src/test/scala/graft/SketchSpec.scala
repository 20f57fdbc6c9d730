package graft

import org.apache.spark.sql.functions._

/** Bounds for the sketch operators whose estimates have no DuckDB
  * surface (driver checks them rows-only): count-min frequency
  * estimates and the Bloom prefilter inside crossExactMatchesBloom.
  */
class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("count-min sketch never undercounts and respects the eps bound") {
    // skewed corpus: token t0 appears 1000×, t1..t199 appear i× each
    val rows = (0 until 200).flatMap { i =>
      val n = if (i == 0) 1000 else i
      Seq.fill(n)(s"t$i")
    }
    val toks = rows.toDF("tok")
    val total = rows.size.toLong
    val eps = 0.01
    val cms = toks.stat.countMinSketch("tok", eps, 0.99, 42)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (t, c) =>
      val e = cms.estimateCount(t)
      assert(e >= c, s"$t undercounted: $e < $c")
      assert(e - c <= (eps * total).toLong + 1,
        s"$t overcount ${e - c} breaks eps bound ${(eps * total).toLong}")
    }
    // determinism: same seed and data → identical estimates
    val cms2 = toks.repartition(7).stat.countMinSketch("tok", eps, 0.99, 42)
    exact.keys.foreach(t =>
      assert(cms.estimateCount(t) == cms2.estimateCount(t),
        s"estimate for $t depends on partitioning"))
  }

  test("crossExactMatchesBloom == crossExactMatches (FPs die in the join)") {
    val corpus = (1L to 400L).map(i => (i, s"corpus doc number $i body"))
      .toDF("doc_id", "text")
    // eval: 10 true copies (normalization-invariant re-casing) + 10 clean
    val evalSet = ((1L to 10L).map(i => (1000L + i, s"CORPUS Doc Number ${i * 3} BODY")) ++
      (11L to 20L).map(i => (1000L + i, s"held-out eval question $i")))
      .toDF("doc_id", "text")
    // fpp 0.5 forces real false positives through the prefilter
    val bloomed = graft.dedup.Dedup
      .crossExactMatchesBloom(corpus, evalSet, "text", "doc_id", fpp = 0.5)
      .orderBy("eval_id", "corpus_id").collect().toSeq
    val exact = graft.dedup.Dedup
      .crossExactMatches(corpus, evalSet, "text", "doc_id")
      .orderBy("eval_id", "corpus_id").collect().toSeq
    assert(bloomed == exact)
    assert(exact.size == 10) // the planted copies, nothing else
  }

  test("approx_percentile tracks the exact interpolated percentile") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfDir)
    val r = ev.agg(
      percentile(col("value"), lit(0.95)).as("exact"),
      approx_percentile(col("value"), lit(0.95), lit(1000)).as("approx"),
      expr("percentile(value, 0.5)").as("exact50"),
      approx_percentile(col("value"), lit(0.5), lit(1000)).as("approx50"))
      .collect()(0)
    // accuracy=1000 bounds rank error at n/1000; translate to a loose
    // value tolerance via the spread
    val spread = ev.agg(max(col("value")) - min(col("value")))
      .collect()(0).getDouble(0)
    assert(math.abs(r.getDouble(1) - r.getDouble(0)) <= spread * 0.02,
      s"p95 approx ${r.getDouble(1)} vs exact ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(3) - r.getDouble(2)) <= spread * 0.02,
      s"p50 approx ${r.getDouble(3)} vs exact ${r.getDouble(2)}")
  }
}
