package graft

import graft.ml.IsolationForest

class IsolationForestSpec extends SparkSpecBase {
  import spark.implicits._

  // 60 inliers in a tight cluster + 2 far outliers
  private lazy val data = {
    val rng = new scala.util.Random(7)
    val inliers = Seq.fill(60)((10.0 + rng.nextGaussian(),
      20.0 + rng.nextGaussian(), 5.0 + rng.nextGaussian()))
    val outliers = Seq((100.0, -50.0, 80.0), (-80.0, 120.0, -60.0))
    (inliers ++ outliers).toDF("f1", "f2", "f3")
  }
  private val feats = Seq("f1", "f2", "f3")

  test("avgPathC matches the ICDM'08 normalizer") {
    assert(IsolationForest.avgPathC(1) == 0.0)
    assert(IsolationForest.avgPathC(2) == 1.0)
    // c(256) ≈ 10.244 (2*(ln(255)+γ) - 2*255/256)
    assert(math.abs(IsolationForest.avgPathC(256) - 10.244) < 0.01)
  }

  test("quantile interpolates linearly") {
    val a = Array(0.0, 1.0, 2.0, 3.0)
    assert(IsolationForest.quantile(a, 0.5) == 1.5)
    assert(IsolationForest.quantile(a, 0.0) == 0.0)
    assert(IsolationForest.quantile(a, 1.0) == 3.0)
  }

  test("outliers get the most negative scores and are flagged") {
    val model = IsolationForest.fit(data, feats, contamination = 0.05)
    val scored = model.transform(data)
      .select($"f1", $"anomaly_score", $"anomaly_flag").collect()
    val byScore = scored.sortBy(_.getDouble(1))
    // the two planted outliers have f1 = 100 / -80
    val worst2 = byScore.take(2).map(_.getDouble(0)).toSet
    assert(worst2 == Set(100.0, -80.0))
    assert(byScore.take(2).forall(_.getInt(2) == 1))
    // inlier majority unflagged
    assert(scored.count(_.getInt(2) == 0) >= 55)
  }

  test("fit is deterministic under a fixed seed") {
    val m1 = IsolationForest.fit(data, feats, seed = 42L)
    val m2 = IsolationForest.fit(data, feats, seed = 42L)
    val x = Array(10.0, 20.0, 5.0)
    assert(m1.scoreSamples(x) == m2.scoreSamples(x))
    assert(m1.offset == m2.offset)
  }

  test("save/load roundtrip preserves scores exactly") {
    val dir = java.nio.file.Files.createTempDirectory("iforest").toString
    val model = IsolationForest.fit(data, feats)
    model.save(spark, dir)
    val loaded = IsolationForest.load(spark, dir)
    val probes = Seq(Array(10.0, 20.0, 5.0), Array(100.0, -50.0, 80.0))
    probes.foreach(p =>
      assert(model.decisionFunction(p) == loaded.decisionFunction(p)))
    assert(loaded.psi == model.psi && loaded.featureCols == feats)
  }

  test("score_samples is in [-1, 0) and lower for outliers") {
    val model = IsolationForest.fit(data, feats)
    val in = model.scoreSamples(Array(10.0, 20.0, 5.0))
    val out = model.scoreSamples(Array(100.0, -50.0, 80.0))
    assert(in < 0 && in >= -1 && out < 0 && out >= -1)
    assert(out < in)
  }

  test("transform preserves row count and adds exactly two columns") {
    val model = IsolationForest.fit(data, feats)
    val t = model.transform(data)
    assert(t.count() == data.count())
    assert(t.columns.toSet == data.columns.toSet ++ Set("anomaly_score", "anomaly_flag"))
  }
}
