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
}
