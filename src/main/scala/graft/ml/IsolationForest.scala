package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Isolation-forest anomaly detection (Liu/Ting/Zhou, ICDM 2008) with the
  * same knobs and conventions the reference exposes via sklearn
  * (reference: ml/train_cluster_anomaly_model.py:39-47,
  * ml/score_cluster_anomalies.py:38-48): StandardScaler features,
  * `n_estimators`, `contamination`, a fixed seed, `score_samples`-style
  * continuous scores (lower = more anomalous) and a ±1 predict derived
  * from the contamination quantile of the train scores.
  *
  * Scale design: the model TRAINS on a collected sample (the reference's
  * input is the gold daily aggregate — one row per day, README.md:279 —
  * and isolation forests subsample to ψ≤256 rows by design, §4 of the
  * paper), so the collect boundary is explicit in `fit` and bounded by
  * `maxSamples`. SCORING is distributed: the fitted forest is a small
  * immutable structure captured in a UDF closure (Spark broadcasts it with
  * the task), so `transform` scales to arbitrarily many rows with no
  * driver involvement. Exact sklearn bit-parity is impossible (different
  * RNG streams); parity is behavioral (SURVEY.md §7 risks).
  */
object IsolationForest {

  /** One tree, flattened to parallel arrays (node i: children l/r, split
    * feature -1 ⇔ external node of `size` training rows).
    */
  final case class Tree(feature: Array[Int], threshold: Array[Double],
                        left: Array[Int], right: Array[Int],
                        size: Array[Int]) {
    def pathLength(x: Array[Double]): Double = {
      var node = 0
      var depth = 0.0
      while (feature(node) >= 0) {
        node = if (x(feature(node)) < threshold(node)) left(node) else right(node)
        depth += 1.0
      }
      depth + IsolationForest.avgPathC(size(node))
    }
  }

  /** c(n): average unsuccessful-search path length in a BST of n nodes —
    * the normalizer from the ICDM'08 paper (eq. 1).
    */
  def avgPathC(n: Int): Double =
    if (n <= 1) 0.0
    else if (n == 2) 1.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n

  final case class Model(trees: Seq[Tree], psi: Int, offset: Double,
                         featureCols: Seq[String],
                         mean: Array[Double], std: Array[Double]) {

    private def scale(x: Array[Double]): Array[Double] = {
      val out = new Array[Double](x.length)
      var i = 0
      while (i < x.length) {
        out(i) = if (std(i) > 0) (x(i) - mean(i)) / std(i) else x(i) - mean(i)
        i += 1
      }
      out
    }

    /** sklearn `score_samples`: -s(x) ∈ [-1, 0); lower = more anomalous. */
    def scoreSamples(raw: Array[Double]): Double = {
      val x = scale(raw)
      var sum = 0.0
      trees.foreach(t => sum += t.pathLength(x))
      val e = sum / trees.size
      -math.pow(2.0, -e / avgPathC(psi))
    }

    /** sklearn `decision_function`: score_samples - offset; < 0 ⇒ anomaly. */
    def decisionFunction(raw: Array[Double]): Double = scoreSamples(raw) - offset

    /** Adds `anomaly_score` (decision_function) and `anomaly_flag` (0/1)
      * columns. Distributed — the model rides to executors in the UDF
      * closure; no collect.
      */
    def transform(df: DataFrame): DataFrame = {
      val m = this
      val scoreUdf = udf((xs: Seq[Double]) => m.decisionFunction(xs.toArray))
      df.withColumn("anomaly_score",
          scoreUdf(array(featureCols.map(c => col(c).cast("double")): _*)))
        .withColumn("anomaly_flag", (col("anomaly_score") < 0).cast("int"))
    }

    /** Persist as two parquet datasets: flattened tree nodes + params
      * (SURVEY.md §2.8 M5 — reference uses joblib files,
      * ml/train_cluster_anomaly_model.py:50-52).
      */
    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      val nodes = trees.zipWithIndex.flatMap { case (t, ti) =>
        t.feature.indices.map(ni =>
          (ti, ni, t.feature(ni), t.threshold(ni), t.left(ni), t.right(ni),
            t.size(ni)))
      }
      nodes.toDF("tree", "node", "feature", "threshold", "left", "right", "size")
        .repartition(1).write.mode("overwrite").parquet(s"$path/nodes")
      Seq((psi, offset, featureCols, mean.toSeq, std.toSeq))
        .toDF("psi", "offset", "feature_cols", "mean", "std")
        .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  def load(spark: SparkSession, path: String): Model = {
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val nodes = spark.read.parquet(s"$path/nodes")
      .collect()
      .groupBy(_.getInt(0))
      .toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        val sorted = rows.sortBy(_.getInt(1))
        Tree(sorted.map(_.getInt(2)).toArray, sorted.map(_.getDouble(3)).toArray,
          sorted.map(_.getInt(4)).toArray, sorted.map(_.getInt(5)).toArray,
          sorted.map(_.getInt(6)).toArray)
      }
    Model(nodes, meta.getInt(0), meta.getDouble(1),
      meta.getSeq[String](2).toSeq,
      meta.getSeq[Double](3).toArray, meta.getSeq[Double](4).toArray)
  }

  /** Linear-interpolated quantile (numpy default — what sklearn's offset_
    * percentile uses).
    */
  private[graft] def quantile(sorted: Array[Double], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = pos.toInt
    val hi = math.min(lo + 1, sorted.length - 1)
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  /** Fit scaler + forest. EVERY driver boundary is bounded regardless of
    * input size:
    *  - scaler stats (mean, population std — sklearn StandardScaler
    *    ddof=0): one distributed aggregation;
    *  - tree samples: a deterministic pool of ≤ 16·maxSamples rows
    *    selected by md5 order of the feature tuple (TakeOrdered — no full
    *    sort, no full collect; unbiased w.r.t. feature values and stable
    *    across partitioning), from which each tree draws its seeded
    *    ψ-row subsample;
    *  - offset_ (contamination quantile of train score_samples): scored
    *    distributed through the model UDF, reduced with Spark's exact
    *    interpolated `percentile` — same linear interpolation as
    *    sklearn's np.percentile.
    * Rows with any NULL feature are dropped (sklearn would raise).
    */
  def fit(df: DataFrame, featureCols: Seq[String], nEstimators: Int = 100,
          contamination: Double = 0.05, seed: Long = 42L,
          maxSamples: Int = 256): Model = {
    val feat = df.select(featureCols.map(c => col(c).cast("double")): _*)
      .na.drop()
    val stats = feat.agg(
      array(featureCols.map(c => avg(col(c))): _*).as("mu"),
      array(featureCols.map(c => stddev_pop(col(c))): _*).as("sigma"))
      .collect()(0)
    val mean = stats.getSeq[Double](0).toArray
    val std = stats.getSeq[Double](1).toArray

    // bounded deterministic sample pool (hash-ordered TakeOrdered)
    val poolSize = maxSamples * 16
    val sortCols = md5(concat_ws(",",
      featureCols.map(c => col(c).cast("string")): _*)) +: featureCols.map(col)
    val pool = feat
      .orderBy(sortCols: _*)
      .limit(poolSize)
      .collect()
      .map(r => Array.tabulate(featureCols.length)(i =>
        if (std(i) > 0) (r.getDouble(i) - mean(i)) / std(i)
        else r.getDouble(i) - mean(i)))
    val rng = new Random(seed)
    val psi = math.min(maxSamples, pool.length)
    val heightLimit = math.ceil(math.log(math.max(psi, 2)) / math.log(2)).toInt

    val trees = Seq.tabulate(nEstimators) { _ =>
      val sample =
        if (pool.length <= psi) pool
        else rng.shuffle(pool.toSeq).take(psi).toArray
      buildTree(sample, heightLimit, rng, featureCols.length)
    }

    // offset_ distributed: score via UDF, exact interpolated percentile
    val m0 = Model(trees, psi, 0.0, featureCols, mean, std)
    val scoreUdf = udf((xs: Seq[Double]) => m0.scoreSamples(xs.toArray))
    val offset = feat
      .select(scoreUdf(array(featureCols.map(col): _*)).as("s"))
      .agg(percentile(col("s"), lit(contamination)))
      .collect()(0).getDouble(0)
    m0.copy(offset = offset)
  }

  /** Recursive random-split tree build over the (already scaled) sample. */
  private def buildTree(sample: Array[Array[Double]], heightLimit: Int,
                        rng: Random, nFeatures: Int): Tree = {
    val feature = scala.collection.mutable.ArrayBuffer[Int]()
    val threshold = scala.collection.mutable.ArrayBuffer[Double]()
    val left = scala.collection.mutable.ArrayBuffer[Int]()
    val right = scala.collection.mutable.ArrayBuffer[Int]()
    val size = scala.collection.mutable.ArrayBuffer[Int]()

    def leaf(n: Int): Int = {
      val id = feature.length
      feature += -1; threshold += 0.0; left += -1; right += -1; size += n
      id
    }

    def grow(rows: Array[Array[Double]], depth: Int): Int = {
      if (depth >= heightLimit || rows.length <= 1) return leaf(rows.length)
      // features with spread; if none (all rows identical) → leaf
      val candidates = (0 until nFeatures).filter { f =>
        var mn = rows(0)(f); var mx = rows(0)(f)
        rows.foreach { r => if (r(f) < mn) mn = r(f); if (r(f) > mx) mx = r(f) }
        mx > mn
      }
      if (candidates.isEmpty) return leaf(rows.length)
      val f = candidates(rng.nextInt(candidates.length))
      var mn = rows(0)(f); var mx = rows(0)(f)
      rows.foreach { r => if (r(f) < mn) mn = r(f); if (r(f) > mx) mx = r(f) }
      val split = mn + rng.nextDouble() * (mx - mn)
      val id = feature.length
      feature += f; threshold += split; left += -1; right += -1; size += rows.length
      val l = grow(rows.filter(_(f) < split), depth + 1)
      val r = grow(rows.filter(_(f) >= split), depth + 1)
      left(id) = l; right(id) = r
      id
    }

    grow(sample, 0)
    Tree(feature.toArray, threshold.toArray, left.toArray, right.toArray,
      size.toArray)
  }
}
