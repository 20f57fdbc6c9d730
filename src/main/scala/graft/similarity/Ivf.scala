package graft.similarity

import graft.functions.VectorExpressions.vecDot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search: partition the
  * corpus into `nlist` Voronoi cells around k-means centroids, then search
  * only the `nprobe` cells nearest each query.
  *
  * This is the classic coarse-quantizer ANN layout (FAISS-style IVF-Flat).
  * Versus the sign-bit LSH variant in VectorOps: LSH buckets are free to
  * compute but data-oblivious; IVF cells adapt to the data distribution,
  * so recall at equal candidate budget is higher on clustered embeddings.
  *
  * Scale design:
  *  - k-means runs DISTRIBUTED: assignment is a map with the (tiny) k×dim
  *    centroid matrix in the task closure; the update step is one
  *    hash aggregation over (cell, dim) — shuffle carries k×dim partial
  *    sums per map task, never vectors. Iterations are bounded (default 3;
  *    Lloyd converges fast for coarse quantizers).
  *  - Init is deterministic (k lowest-id vectors), so the whole index —
  *    and therefore query results — is reproducible run-to-run.
  *  - Search is an equi-join corpus⋈queries on cell id: the corpus
  *    shuffles ONCE by cell; each cell ranks locally; no cross product.
  *    Candidate count ≈ (nprobe/nlist) × corpus — the knob that trades
  *    recall for cost.
  */
object Ivf {

  /** Deterministic k-means (Lloyd) over (id, vec) rows. Returns the k×dim
    * centroid matrix, ordered by centroid id.
    *
    * Init is farthest-first traversal (maxmin): start from the lowest-id
    * vector, then repeatedly take the point farthest from the chosen set
    * (ties broken by id). Deterministic, and unlike lowest-k-ids it can't
    * seed every centroid inside one dense cluster. Costs k distributed
    * max-passes — k is the (small) nlist, so this is bounded.
    */
  /** Index of the L2-nearest centroid (length-guarded: compares over the
    * common prefix on ragged input). Shared driver-side loop for Ivf and
    * Pq — one definition, one behavior.
    */
  private[similarity] def nearestIdx(v: Array[Double],
                                     centroids: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0; var i = 0
      val cv = centroids(c)
      val n = math.min(cv.length, v.length)
      while (i < n) { val t = v(i) - cv(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic farthest-first (maxmin) init over a point set: start
    * from the first point, repeatedly take the point farthest from the
    * chosen set (ties by index). Shared by Ivf.kmeansFit and
    * Pq.fitCodebooks.
    */
  private[similarity] def farthestFirstInit(points: Array[Array[Double]],
                                            k: Int): Array[Array[Double]] = {
    val init = scala.collection.mutable.ArrayBuffer(points(0))
    val minD = Array.fill(points.length)(Double.MaxValue)
    while (init.length < k) {
      val latest = init.last
      var farIdx = 0; var farD = -1.0
      var j = 0
      while (j < points.length) {
        var d = 0.0; var i = 0
        val v = points(j)
        val n = math.min(latest.length, v.length)
        while (i < n) { val t = v(i) - latest(i); d += t * t; i += 1 }
        if (d < minD(j)) minD(j) = d
        if (minD(j) > farD) { farD = minD(j); farIdx = j }
        j += 1
      }
      init += points(farIdx)
    }
    init.toArray
  }

  def kmeansFit(corpus: DataFrame, k: Int, iters: Int = 3,
                initSample: Int = 1024): Array[Array[Double]] = {
    // Farthest-first over a bounded deterministic sample (lowest ids),
    // entirely on the driver: k distributed argmax passes collapse to one
    // bounded collect (initSample × dim doubles). Lloyd then refines
    // distributed, so init only needs coverage, not optimality.
    // The fit's actions run on the narrow session (round 19): each
    // Lloyd round is one k-row keyed aggregate whose parallelism comes
    // from the corpus scan, so AQE's extra stage job per round (and
    // per sample collect) buys nothing at any scale — the same
    // argument as Coreset's greedy rounds.
    val c = graft.operators.NarrowExec.narrowed(corpus, 1)
    val sample = c.orderBy("id").limit(math.max(k, initSample))
      .select("vec").collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= k, s"corpus smaller than k=$k")
    var centroids: Array[Array[Double]] = farthestFirstInit(sample, k)
    var it = 0
    while (it < iters) {
      val assigned = assignCells(c, centroids)
      // update: element-wise mean per cell via the typed VectorAvg
      // aggregate — shuffle carries one (sums, count) buffer per task per
      // cell, not n×dim exploded rows; result is k rows (tiny collect).
      val means = assigned
        .groupBy("cell")
        .agg(graft.functions.VectorAggregates.vectorAvgCol(col("vec"))
          .as("mean"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        val m = r.getSeq[Double](1)
        if (m.nonEmpty) next(r.getInt(0)) = m.toArray
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Persist a trained coarse quantizer (one parquet row per centroid
    * dim-ordered) so arriving batches and query services reuse the SAME
    * cell geometry instead of refitting — the index posture every FAISS
    * deployment uses: fit once on a sample, assign forever. Cell
    * assignments stay comparable across batches only while the centroids
    * are fixed, which is exactly what makes an incremental IVF (append
    * new vectors' cells to the inverted lists) possible at all.
    */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
                    centroids: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("centroid_id", "vec")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a quantizer written by saveCentroids, ordered by centroid id
    * (bit-identical to what was saved — doubles round-trip parquet
    * exactly).
    */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                    path: String): Array[Array[Double]] =
    spark.read.parquet(path)
      .orderBy("centroid_id")
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** Adds `cell` = index of the L2-nearest centroid. The centroid matrix
    * rides in the UDF closure (k×dim doubles — broadcast with the task).
    */
  def assignCells(vectors: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val cs = centroids
    val nearest = udf((v: Seq[Double]) => {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val cv = cs(c)
        val n = math.min(cv.length, v.length)
        while (i < n) { val t = v(i) - cv(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    })
    vectors.withColumn("cell", nearest(col("vec")))
  }

  /** `nprobe` nearest cells per vector (for the query side). */
  private[similarity] def probeCells(vectors: DataFrame,
                                     centroids: Array[Array[Double]],
                                     nprobe: Int): DataFrame = {
    val cs = centroids
    val probes = udf((v: Seq[Double]) => {
      cs.indices.map { c =>
        var d = 0.0; var i = 0
        val cv = cs(c)
        val n = math.min(cv.length, v.length)
        while (i < n) { val t = v(i) - cv(i); d += t * t; i += 1 }
        (d, c)
      }.sorted.take(nprobe).map(_._2)
    })
    vectors.withColumn("cell", explode(probes(col("vec"))))
  }

  /** Approximate top-k: index the corpus into nlist cells, probe nprobe
    * cells per query, rank candidates exactly by rounded cosine with id
    * tiebreak (deterministic). Input frames: (id, vec double-array).
    */
  def topKIvf(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              kmeansIters: Int = 3): DataFrame = {
    val centroids = kmeansFit(corpus, nlist, kmeansIters)
    topKIvfIndexed(queries, assignCells(corpus, centroids), centroids, k,
      nprobe)
  }

  /** Search against a FIXED pre-trained quantizer — the INCREMENTAL
    * maintenance entry. `corpusCells` is the inverted index as data:
    * (id, vec, cell) rows, which is exactly what lets arriving batches
    * be appended without refitting — assign the new batch with
    * [[assignCells]] against the loaded centroids and union it in; cell
    * ids stay comparable because the geometry never moved
    * ([[saveCentroids]] scaladoc). At nprobe = centroids.length every
    * cell is probed and scoring is exact, so the result is provably the
    * brute-force top-k over whatever the index currently holds — the
    * exact-equivalence mode q_ann_ivf_incremental hash-checks; the
    * assignment-stability and index-equivalence properties are
    * IvfSpec's.
    */
  def topKIvfIndexed(queries: DataFrame, corpusCells: DataFrame,
                     centroids: Array[Array[Double]], k: Int,
                     nprobe: Int): DataFrame = {
    val c = corpusCells
      .select(col("id").as("cid_"), col("vec").as("cvec"), col("cell"))
      .withColumn("cnrm", sqrt(vecDot(col("cvec"), col("cvec"))))
    val q = probeCells(queries, centroids, nprobe)
      .select(col("id").as("qid"), col("vec").as("qvec"), col("cell"))
      .withColumn("qnrm", sqrt(vecDot(col("qvec"), col("qvec"))))
    val scored = q.join(c, Seq("cell"))
      .filter(col("qid") =!= col("cid_"))
      .withColumn("cos",
        round(vecDot(col("qvec"), col("cvec")) / (col("qnrm") * col("cnrm")), 6))
    Ranking.topKRanked(scored, "qid", "cos", "cid_", k)
      .select(col("qid"), col("rn"), col("cid_").as("vec_id"), col("cos"))
  }
}
