package graft

import graft.text.HashClassifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class HashClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  // Two vocabularies with zero overlap: "good" docs talk about code,
  // "bad" docs are keyword spam. A linear classifier over hashed token
  // features must separate them.
  private lazy val labeled: DataFrame = Seq(
    (1L, "the function returns a sorted list of results", true),
    (2L, "this method computes the median over a sliding window", true),
    (3L, "parse the config file and validate every field", true),
    (4L, "buy cheap pills online casino winner jackpot", false),
    (5L, "casino jackpot winner cheap pills buy now", false),
    (6L, "winner winner jackpot casino pills cheap online", false)
  ).toDF("doc_id", "body", "pos")

  private lazy val weights: Array[Double] =
    HashClassifier.collectWeights(
      HashClassifier.fit(labeled, "body", "pos", dim = 64), dim = 64)

  test("fit produces log-odds weights: positive-class tokens weigh > 0") {
    val w = HashClassifier.fit(labeled, "body", "pos", dim = 64)
      .collect()
    assert(w.nonEmpty)
    // every occupied bucket has counts consistent with one class or both
    w.foreach { r =>
      val (cp, cn, wt) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      if (cp > 0 && cn == 0) assert(wt > 0, s"pos-only bucket weighs $wt")
      if (cn > 0 && cp == 0) assert(wt < 0, s"neg-only bucket weighs $wt")
    }
  }

  test("scores separate the classes the model was fit on") {
    val scored = HashClassifier.score(labeled, "body", weights)
      .select("doc_id", "pos", "q_score").collect()
      .map(r => (r.getBoolean(1), r.getDouble(2)))
    val posMin = scored.filter(_._1).map(_._2).min
    val negMax = scored.filterNot(_._1).map(_._2).max
    assert(posMin > 0.5 && negMax < 0.5,
      s"expected separation at 0.5, got posMin=$posMin negMax=$negMax")
  }

  test("unseen vocabulary scores with the smoothing default, not a crash") {
    val unseen = Seq((9L, "zzz qqq xxx never seen tokens"))
      .toDF("doc_id", "body")
    val s = HashClassifier.score(unseen, "body", weights)
      .select("q_score").as[Double].head()
    assert(s > 0.0 && s < 1.0)
  }

  test("token-less docs score exactly sigmoid(0) = 0.5") {
    val empty = Seq((9L, "   ")).toDF("doc_id", "body")
    val s = HashClassifier.score(empty, "body", weights)
      .select("q_score").as[Double].head()
    assert(s == 0.5)
  }

  test("collectWeights fills every bucket; occupied ones match the frame") {
    val frame = HashClassifier.fit(labeled, "body", "pos", dim = 64)
    val byBucket = frame.collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(3)).toMap
    assert(weights.length == 64)
    byBucket.foreach { case (b, wt) => assert(weights(b) == wt) }
    // unoccupied buckets carry one shared default
    val defaults = weights.indices.filterNot(byBucket.contains)
      .map(weights).distinct
    assert(defaults.size <= 1)
  }

  test("scoring plan is a shuffle-free projection") {
    val plan = HashClassifier.score(labeled, "body", weights)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }

  // Hand-checkable calibration fixture: one key, 4 docs with known
  // scores 0.2 / 0.4 / 0.6 / 0.8 and labels F / T / F / T.
  //   thr 30%: keeps 0.4,0.6,0.8 → tp=2 fp=1 fn=0 → F1 = 4/5 = 0.8
  //   thr 50%: keeps 0.6,0.8     → tp=1 fp=1 fn=1 → F1 = 2/4 = 0.5
  //   thr 70%: keeps 0.8         → tp=1 fp=0 fn=1 → F1 = 2/3
  private lazy val calib = Seq(
    ("web", false, 0.2), ("web", true, 0.4),
    ("web", false, 0.6), ("web", true, 0.8)
  ).toDF("source", "pos", "q_score")

  test("thresholdSweep computes hand-checked confusion counts and F1") {
    val sweep = HashClassifier.thresholdSweep(calib, "source", "pos",
      stepPct = 20)
    val rows = sweep.collect().map(r => r.getInt(1) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(7))).toMap
    assert(rows.keySet == Set(20, 40, 60, 80))
    assert(rows(40) == ((2L, 1L, 0L, 0.8)))          // keeps >= 0.4
    assert(rows(60) == ((1L, 1L, 1L, 0.5)))          // keeps >= 0.6
    assert(rows(80) == ((1L, 0L, 1L, 0.666667)))     // keeps >= 0.8
    // threshold 20 keeps everything: recall 1, precision 1/2
    val t20 = sweep.filter(col("thr_pct") === 20)
      .select("precision", "recall").head()
    assert(t20.getDouble(0) == 0.5 && t20.getDouble(1) == 1.0)
  }

  test("thresholdSweep excludes null labels/scores, keeping tp+fn = |positives|") {
    // nulls in either column previously fell to otherwise(0) in tp, fp,
    // AND fn alike — silently breaking the confusion partition. They are
    // now excluded rows: counts must equal the all-non-null fixture's.
    val withNulls = calib.unionByName(Seq(
      ("web", null.asInstanceOf[java.lang.Boolean], java.lang.Double.valueOf(0.9)),
      ("web", java.lang.Boolean.TRUE, null.asInstanceOf[java.lang.Double])
    ).toDF("source", "pos", "q_score"))
    val sweep = HashClassifier.thresholdSweep(withNulls, "source", "pos",
      stepPct = 20)
    val rows = sweep.collect().map(r => r.getInt(1) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // identical to the clean fixture: 2 positives, 2 negatives
    assert(rows(40) == ((2L, 1L, 0L)))
    assert(rows(60) == ((1L, 1L, 1L)))
    rows.values.foreach { case (tp, _, fn) =>
      assert(tp + fn == 2L, s"tp+fn must partition the non-null positives: $rows")
    }
  }

  test("bestThresholds picks max F1, ties toward the lowest threshold") {
    val sweep = HashClassifier.thresholdSweep(calib, "source", "pos",
      stepPct = 20)
    val best = HashClassifier.bestThresholds(sweep, "source").collect()
    assert(best.length == 1)
    assert(best.head.getInt(1) == 40, s"expected thr 40, got ${best.head}")
    assert(best.head.getDouble(7) == 0.8)

    // a key where EVERY threshold scores the same F1 resolves to the
    // lowest threshold on the grid
    val flat = Seq(("k", true, 0.9), ("k", true, 0.95))
      .toDF("source", "pos", "q_score")
    val b2 = HashClassifier.bestThresholds(
      HashClassifier.thresholdSweep(flat, "source", "pos", stepPct = 10),
      "source").collect()
    assert(b2.length == 1 && b2.head.getInt(1) == 10)
  }

  test("bestThresholds plan is window-free (broadcast argmax)") {
    val plan = HashClassifier.bestThresholds(
        HashClassifier.thresholdSweep(calib, "source", "pos"), "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no Window:\n$plan")
  }
}
