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

  test("unified Sketches.rollup dispatches to all three mart families") {
    import graft.operators.{Kmv, Quantiles, Sketches}
    val df = (1 to 400).map(i => (i % 4, s"k${i % 97}", (i % 50).toDouble))
      .toDF("g", "key", "v")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq.map {
        case a: Array[_] => a.toSeq
        case x => x
      }).toSet
    // HLL: dispatch == direct union rollup
    val hm = Sketches.hllMart(df, Seq("g"), "key")
    assert(rows(Sketches.rollup(hm, Seq.empty)) ==
      rows(Sketches.rollupMart(hm, Seq.empty)))
    // KMV: dispatch reads build-k from the mart
    val km = Kmv.mart(df, Seq("g"), col("key"), k = 32)
    assert(rows(Sketches.rollup(km, Seq.empty)) ==
      rows(Kmv.rollup(km, Seq.empty, k = 32)))
    // histogram: dispatch == bin-count sum
    val qm = Quantiles.histMart(df, Seq("g"), col("v"), binWidth = 5.0)
    assert(rows(Sketches.rollup(qm, Seq.empty)) ==
      rows(Quantiles.rollup(qm, Seq.empty)))
    // legacy KMV mart without kmv_k and unknown schemas fail loudly
    intercept[IllegalArgumentException] {
      Sketches.rollup(km.drop("kmv_k"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sketches.rollup(df, Seq.empty)
    }
  }

  test("HLL sketch mart: parquet round-trip is bit-exact and rollup " +
    "estimates match the direct single-pass sketch") {
    import graft.operators.Sketches
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("dt", to_date(date_trunc("day", col("ts"))))
    val mart = Sketches.hllMart(ev, Seq("dt", "event_type"), "user_id")

    // persistence: the binary sketch column round-trips parquet untouched
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-mart").toString
    mart.write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    val inMem = mart.select(col("dt"), col("event_type"), md5(col("hll")))
      .orderBy("dt", "event_type").collect().toSeq
    val onDisk = reread.select(col("dt"), col("event_type"), md5(col("hll")))
      .orderBy("dt", "event_type").collect().toSeq
    assert(inMem == onDisk, "sketch binary changed across the parquet round-trip")

    // merge-vs-direct: union of per-day sketches must estimate the same as
    // one sketch built over the whole period (register-wise max is lossless)
    val rolled = Sketches.rollupMart(reread, Seq("event_type"))
      .select(col("event_type"), Sketches.estimate(col("hll")).as("est"))
      .orderBy("event_type").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("hll"))
      .select(col("event_type"), Sketches.estimate(col("hll")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled == direct,
      s"merged-sketch estimates diverge from direct: $rolled vs $direct")

    // accuracy: within 3x the HLL relative standard error (1.04/sqrt(2^12))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tol = 3 * 1.04 / math.sqrt(1 << 12)
    exact.foreach { case (k, n) =>
      val est = rolled(k).toDouble
      assert(math.abs(est - n) <= math.max(1.0, tol * n),
        s"$k: estimate $est vs exact $n breaks the ${tol * 100}%% bound")
    }
  }
}
