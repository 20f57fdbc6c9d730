package graft.similarity

import graft.functions.VectorExpressions.vecDot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN — the MEMORY-bound scale path. IVF-Flat
  * (Ivf.scala) cuts the candidate count; PQ cuts the bytes per
  * candidate: each vector is split into `m` subvectors, each subvector
  * replaced by the id of its nearest per-subspace codeword, so a
  * 64-dim float64 vector (512 B) becomes `m` small ints (8 B at m=8,
  * ksub=16) — a 64× smaller scan. Search uses asymmetric distance
  * computation (ADC): the query precomputes an m×ksub table of partial
  * inner products, and each candidate scores as m table lookups — no
  * per-candidate float vector is ever read.
  *
  * Scale design:
  *  - Codebooks train DRIVER-SIDE on a bounded deterministic sample
  *    (lowest `initSample` ids) — the standard FAISS posture (codebooks
  *    train on ~100k samples regardless of corpus size), so fitting
  *    costs ONE bounded collect, not 3·m distributed Lloyd jobs. Init
  *    is per-subspace farthest-first; everything is deterministic.
  *  - Encoding is one distributed pass; the m×ksub×dsub codebook rides
  *    the task closure (m·ksub·dsub doubles — KBs).
  *  - The ADC scan is corpus-distributed with the (small, by contract)
  *    query set broadcast; the scan stream narrows to (qid, cid, score)
  *    immediately after the lookup sum, so the shuffled/ranked data is
  *    3 columns regardless of dim.
  *  - The `rerank` shortlist per query is re-scored EXACTLY on the true
  *    vectors (rows = rerank × |queries| — tiny), which caps the recall
  *    loss of quantization to what the shortlist misses.
  */
object Pq {

  /** Per-subspace codebooks: (m, ksub, dsub) array. Deterministic:
    * sample = lowest `initSample` ids, farthest-first init, `iters`
    * Lloyd rounds per subspace on the driver.
    */
  def fitCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
                   iters: Int = 3, initSample: Int = 1024)
      : Array[Array[Array[Double]]] = {
    val sample = corpus.orderBy("id").limit(initSample)
      .select("vec").collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    require(sample.length >= ksub, s"sample ${sample.length} < ksub=$ksub")
    val dsub = dim / m
    // init + Lloyd loops are Ivf's (one definition, length-guarded)
    (0 until m).toArray.map { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub,
        (s + 1) * dsub))
      var centroids = Ivf.farthestFirstInit(sub, ksub)
      var it = 0
      while (it < iters) {
        // Lloyd on the sample: assign each sample point, recompute means
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Int](ksub)
        sub.foreach { v =>
          val c = Ivf.nearestIdx(v, centroids)
          counts(c) += 1
          var i = 0
          while (i < dsub) { sums(c)(i) += v(i); i += 1 }
        }
        centroids = centroids.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else sums(c).map(_ / counts(c))
        }
        it += 1
      }
      centroids
    }
  }

  /** (id, code array<int> of length m): per-subspace nearest codeword.
    * One distributed pass; codebooks ride the closure.
    */
  def encode(vectors: DataFrame,
             codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val cb = codebooks
    val m = cb.length
    val dsub = cb(0)(0).length
    val enc = udf((v: Seq[Double]) => {
      val va = v.toArray
      val out = new Array[Int](m)
      var s = 0
      while (s < m) {
        out(s) = Ivf.nearestIdx(
          java.util.Arrays.copyOfRange(va, s * dsub, (s + 1) * dsub), cb(s))
        s += 1
      }
      out
    })
    vectors.select(col("id"), enc(col("vec")).as("code"))
  }

  /** Exact cosine re-rank of a (qid, cid_) shortlist — the tail every
    * approximate searcher here shares. Shortlist rows are tiny
    * (rerank × |queries|); queries broadcast.
    */
  private def rerankExact(shortlist: DataFrame, queries: DataFrame,
                          corpus: DataFrame, k: Int): DataFrame = {
    val cv = corpus.select(col("id").as("cid_"), col("vec").as("cvec"))
      .withColumn("cnrm", sqrt(vecDot(col("cvec"), col("cvec"))))
    val qv = queries.select(col("id").as("qid"), col("vec").as("qvec"))
      .withColumn("qnrm", sqrt(vecDot(col("qvec"), col("qvec"))))
    val scored = shortlist
      .join(cv, "cid_")
      .join(broadcast(qv), "qid")
      .withColumn("cos",
        round(vecDot(col("qvec"), col("cvec")) / (col("qnrm") * col("cnrm")), 6))
    Ranking.topKRanked(scored, "qid", "cos", "cid_", k)
      .select(col("qid"), col("rn"), col("cid_").as("vec_id"), col("cos"))
  }

  /** Per-query flattened m×ksub LUT of partial inner products. */
  private def lutFor(cb: Array[Array[Array[Double]]])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val m = cb.length
    val ksub = cb(0).length
    val dsub = cb(0)(0).length
    udf((q: Seq[Double]) => {
      val qa = q.toArray
      val out = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < ksub) {
          var d = 0.0; var i = 0
          val cv = cb(s)(c)
          while (i < dsub) { d += qa(s * dsub + i) * cv(i); i += 1 }
          out(s * ksub + c) = d
          c += 1
        }
        s += 1
      }
      out
    })
  }

  /** ADC scorer: sum of m LUT lookups per candidate code. */
  private def adcFor(m: Int, ksub: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((code: Seq[Int], l: Seq[Double]) => {
      var s = 0; var acc = 0.0
      while (s < m) { acc += l(s * ksub + code(s)); s += 1 }
      acc
    })

  /** Persist codebooks as (subspace, codeword, vec) parquet rows — the
    * fit-once-assign-forever posture [[Ivf.saveCentroids]] established:
    * codes stay comparable across batches only while the codebooks are
    * fixed, which is what makes an incremental PQ index (encode the
    * arriving batch, append to the code table) possible at all.
    */
  def saveCodebooks(spark: org.apache.spark.sql.SparkSession,
                    codebooks: Array[Array[Array[Double]]],
                    path: String): Unit = {
    import spark.implicits._
    (for {
      (sub, s) <- codebooks.zipWithIndex
      (v, c) <- sub.zipWithIndex
    } yield (s, c, v.toSeq)).toSeq
      .toDF("subspace", "codeword", "vec")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load codebooks written by [[saveCodebooks]], ordered (subspace,
    * codeword) — bit-identical to what was saved (doubles round-trip
    * parquet exactly), so encodings under the loaded books equal
    * encodings under the trained ones.
    */
  def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
                    path: String): Array[Array[Array[Double]]] =
    spark.read.parquet(path)
      .orderBy("subspace", "codeword")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.map(_._2))

  /** Approximate top-k by PQ-ADC with exact re-rank. Queries must be a
    * SMALL frame (it is broadcast with its LUTs); corpus is (id, vec).
    * Output (qid, rn, vec_id, cos) matches the other top-k operators.
    */
  def topKPq(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 8, ksub: Int = 16, rerank: Int = 50,
             iters: Int = 3): DataFrame = {
    val cb = fitCodebooks(corpus, m, ksub, iters)
    topKPqIndexed(queries, encode(corpus, cb), corpus, cb, k, rerank)
  }

  /** ADC search against a FIXED pre-trained quantizer — the INCREMENTAL
    * maintenance entry, mirroring [[Ivf.topKIvfIndexed]]. `corpusCodes`
    * is the PQ index as data ((id, code) rows): arriving batches append
    * via [[encode]] under the loaded codebooks + union — encode is a
    * pure per-row map, so an incrementally-grown code table is
    * trivially identical to a full re-encode (PqSpec pins it through
    * the save/load round-trip). `corpusVecs` (id, vec) serves only the
    * exact re-rank of the bounded shortlist. With rerank ≥ |corpus| the
    * shortlist is everything and the result is provably brute-force —
    * the exact-equivalence mode q_ann_pq_incremental hash-checks.
    */
  def topKPqIndexed(queries: DataFrame, corpusCodes: DataFrame,
                    corpusVecs: DataFrame,
                    codebooks: Array[Array[Array[Double]]], k: Int,
                    rerank: Int = 50): DataFrame = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val codes = corpusCodes.select(col("id").as("cid_"), col("code"))
    val qt = queries.select(col("id").as("qid"), col("vec").as("qvec"))
      .withColumn("lut", lutFor(codebooks)(col("qvec")))
      .select("qid", "lut")
    // ADC scan: corpus codes stay distributed, queries broadcast; the
    // stream narrows to 3 columns immediately after the lookup sum, and
    // the shortlist prune is the bounded-heap TopKPerKey (map-side
    // partial before the exchange) — never a per-query Window sort
    val scoredAll = codes.crossJoin(broadcast(qt))
      .filter(col("qid") =!= col("cid_"))
      .select(col("qid"), col("cid_"),
        adcFor(m, ksub)(col("code"), col("lut")).as("ascore"))
    val shortlist = Ranking.topKIds(scoredAll, "qid", "ascore", "cid_", rerank)
    rerankExact(shortlist, queries, corpusVecs, k)
  }

  /** FAISS-style IVFPQ: the two scale levers composed — IVF cells bound
    * the CANDIDATE COUNT (only `nprobe`/`nlist` of the corpus is ever
    * scored per query), PQ codes bound the BYTES PER CANDIDATE (m small
    * ints instead of the float vector). The candidate generation is a
    * cell equi-join (never a cross join), the ADC stream narrows to
    * 3 columns, and the shortlist re-ranks exactly — so versus topKPq
    * the scan is nprobe/nlist the size, and versus topKIvf each
    * candidate costs m lookups instead of a dim-length dot product.
    */
  def topKIvfPq(queries: DataFrame, corpus: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4, m: Int = 8,
                ksub: Int = 16, rerank: Int = 50,
                iters: Int = 3): DataFrame = {
    val centroids = Ivf.kmeansFit(corpus, nlist, iters)
    val cb = fitCodebooks(corpus, m, ksub, iters)
    // inverted lists: (cell, cid_, code) — one id-keyed join fuses the
    // cell assignment and the code; both are single passes over corpus
    val codes = encode(corpus, cb).select(col("id"), col("code"))
      .join(Ivf.assignCells(corpus, centroids).select("id", "cell"), "id")
      .select(col("id").as("cid_"), col("cell"), col("code"))
    topKIvfPqIndexed(queries, codes, corpus, centroids, cb, k, nprobe, rerank)
  }

  /** IVFPQ search against FIXED pre-trained quantizers — the INCREMENTAL
    * maintenance entry completing the indexed family
    * ([[Ivf.topKIvfIndexed]] / [[topKPqIndexed]]; round 16).
    * `corpusCodes` is the inverted-list index as data: (cid_, cell,
    * code) rows — arriving batches extend it with [[Ivf.assignCells]] +
    * [[encode]] under the LOADED centroids/codebooks and a union; both
    * are pure per-row maps, so the grown index is trivially identical
    * to a full re-index (cell geometry and code geometry never move —
    * the save/load scaladocs). `corpusVecs` (id, vec) serves only the
    * exact re-rank of the bounded shortlist. With nprobe = nlist and
    * rerank ≥ |corpus| every cell is probed and the shortlist is
    * everything, so the result is provably brute-force — the
    * exact-equivalence mode q_ann_ivfpq_incremental hash-checks. This
    * is also the operating-point probe's entry (graft.AnnProbe): fit
    * once, sweep (nprobe, rerank) without refitting.
    */
  def topKIvfPqIndexed(queries: DataFrame, corpusCodes: DataFrame,
                       corpusVecs: DataFrame,
                       centroids: Array[Array[Double]],
                       codebooks: Array[Array[Array[Double]]], k: Int,
                       nprobe: Int = 4, rerank: Int = 50): DataFrame = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val codes = corpusCodes.select(col("cid_"), col("cell"), col("code"))
    // LUT computed ONCE per query (before the nprobe explode) and
    // joined to the probe rows — computing it after probeCells would
    // recompute the m×ksub table and broadcast it nprobe times over
    val lutQ = queries.select(col("id").as("qid"),
      lutFor(codebooks)(col("vec")).as("lut"))
    val qt = Ivf.probeCells(queries, centroids, nprobe)
      .select(col("id").as("qid"), col("cell"))
      .join(lutQ, "qid")
    val scoredAll = codes.join(broadcast(qt), Seq("cell"))
      .filter(col("qid") =!= col("cid_"))
      .select(col("qid"), col("cid_"),
        adcFor(m, ksub)(col("code"), col("lut")).as("ascore"))
    val shortlist = Ranking.topKIds(scoredAll, "qid", "ascore", "cid_", rerank)
    rerankExact(shortlist, queries, corpusVecs, k)
  }

  /** The committed r16 sweep — present both as a repo file and as the
    * classpath resource graft/ann_probe_100x.json (same bytes), so the
    * chooser works for library callers launched anywhere.
    */
  val DefaultCurvePath: String = "probes/r16/ann_probe_100x.json"

  /** One (nprobe, rerank) operating point off a measured recall curve:
    * the chooser that turns the committed probe evidence into an API.
    *
    * @param nprobe        IVF cells probed per query
    * @param rerank        ADC shortlist re-scored exactly per query
    * @param expectedRecall measured recall@k at this point on the curve
    * @param expectedSec   measured sweep seconds at the curve's scale
    *                      (RELATIVE guidance between points, not a
    *                      latency promise at yours)
    * @param meetsTarget   false when no curve point reached the target
    *                      and this is the best available instead
    * @param provenanceMatch false when the caller declared an index
    *                      (via `forNlist`/`forCorpusSize`) whose scale
    *                      decade differs from the curve's stamp, or the
    *                      curve carries no stamp to check — the pick is
    *                      an EXTRAPOLATION and should be re-measured
    *                      (run graft.AnnProbe at the caller's scale)
    */
  final case class IvfPqOperatingPoint(nprobe: Int, rerank: Int,
                                       expectedRecall: Double,
                                       expectedSec: Double,
                                       meetsTarget: Boolean,
                                       provenanceMatch: Boolean = true)

  /** Recommend (nprobe, rerank) for a target recall@k by reading a
    * committed [[graft.AnnProbe]] curve artifact — the r16 sweep
    * (probes/r16/ann_probe_100x.json, 200k-vector corpus, nlist 64)
    * measured that RERANK SATURATES AT 256 (the exact re-rank recovers
    * everything the shortlist holds; growing it past the true-neighbor
    * count buys nothing) and NPROBE 2-4 IS THE KNEE (recall 0.988 →
    * 0.999 for ~10% more scan); this chooser encodes that evidence
    * instead of leaving it a table a user must re-derive.
    *
    * Selection: the LEAST-WORK curve point whose measured recall
    * reaches `targetRecall` — minimal nprobe first (scan volume is
    * linear in it), minimal rerank second (shortlist re-score size).
    * Measured seconds are REPORTED, not used for ordering: probe-scale
    * wall times are noisy at the ±0.1 s level, and ordering by them
    * would pick rerank 1024 over the saturated 256 on a 0.07 s wobble.
    * If NO point reaches the target (the curve tops out at its corpus's
    * ceiling), the highest-recall point is returned with
    * `meetsTarget = false` — callers wanting exactness should use
    * nprobe = nlist / rerank ≥ |corpus| (the provable brute-force
    * mode), not a curve lookup.
    *
    * The artifact is read DRIVER-SIDE (Jackson, on Spark's classpath;
    * a few KB — no session needed). To regenerate the curve at your
    * own scale/nlist, run `graft.AnnProbe` (SPARK_GRAFT_ANN_DIR /
    * _QUERIES / _NLIST / _OUT knobs) and point `curvePath` at its
    * output; the committed r16 artifact ships both in probes/ and as a
    * CLASSPATH RESOURCE (graft/ann_probe_100x.json), so library callers
    * not launched from the repo root still get the default curve — the
    * file path wins when it exists, the resource is the fallback for
    * the DEFAULT path only (an explicit missing path stays an error).
    *
    * PROVENANCE (round 18, VERDICT r17 watch item): recall-vs-nprobe
    * knees are corpus- and nlist-specific, and AnnProbe stamps both
    * (`n_corpus`, `nlist`) into the artifact. Declare your index via
    * `forNlist`/`forCorpusSize` and the chooser CHECKS instead of
    * silently extrapolating: an nlist mismatch REFUSES (nprobe is a
    * fraction of nlist — a pick carried across nlist is meaningless),
    * and a corpus-size decade mismatch (or a stampless curve) returns
    * `provenanceMatch = false` so the caller knows the pick is an
    * extrapolation to re-measure. Omitting both keeps the advisory
    * r16 behavior.
    */
  def recommendParams(targetRecall: Double,
                      curvePath: String = DefaultCurvePath,
                      forNlist: Option[Int] = None,
                      forCorpusSize: Option[Long] = None)
      : IvfPqOperatingPoint = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"recommendParams: targetRecall must be in (0, 1], got $targetRecall")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val f = new java.io.File(curvePath)
    val root =
      if (f.isFile) mapper.readTree(f)
      else if (curvePath == DefaultCurvePath) {
        // library caller outside the repo root: the committed default
        // curve ships on the classpath (ADVICE r17 — a CWD-relative
        // default made every non-repo-root caller fail spuriously)
        val in = getClass.getResourceAsStream("/graft/ann_probe_100x.json")
        require(in != null, "recommendParams: default curve resource " +
          "graft/ann_probe_100x.json missing from the classpath — " +
          "regenerate with graft.AnnProbe (see scaladoc)")
        try mapper.readTree(in) finally in.close()
      } else throw new IllegalArgumentException(
        s"recommendParams: no curve artifact at $curvePath — " +
          "regenerate with graft.AnnProbe (see scaladoc)")
    val gridNode = root.path("grid")
    require(gridNode.isArray && gridNode.size() > 0,
      s"recommendParams: $curvePath has no grid[] — not an AnnProbe artifact")
    val grid = (0 until gridNode.size()).map { i =>
      val p = gridNode.get(i)
      require(p.hasNonNull("nprobe") && p.hasNonNull("rerank") &&
        p.hasNonNull("recall_at_10") && p.hasNonNull("sec"),
        s"recommendParams: grid[$i] missing fields in $curvePath")
      (p.get("nprobe").asInt(), p.get("rerank").asInt(),
        p.get("recall_at_10").asDouble(), p.get("sec").asDouble())
    }
    // provenance stamps (AnnProbe writes both; hand-built or pre-r16
    // artifacts may lack them — then a declared index can't be checked)
    val curveNlist =
      if (root.hasNonNull("nlist")) Some(root.get("nlist").asInt()) else None
    val curveCorpus =
      if (root.hasNonNull("n_corpus")) Some(root.get("n_corpus").asLong())
      else None
    forNlist.foreach { n =>
      curveNlist.foreach { cn =>
        require(cn == n, s"recommendParams: curve $curvePath was measured " +
          s"at nlist=$cn but the caller's index has nlist=$n — nprobe is " +
          "a fraction of nlist, so the curve's picks do not transfer. " +
          "Regenerate with graft.AnnProbe at your nlist.")
      }
    }
    // true unless a declared index property can't be confirmed against
    // the stamp: nlist needs a stamp to verify (mismatch already threw
    // above); corpus size matches at DECADE granularity — knee shape is
    // stable within a decade, not across one (the r16 curve is 2·10⁵)
    def decade(n: Long): Long = math.floor(math.log10(n.toDouble)).toLong
    val provenance =
      forNlist.forall(_ => curveNlist.isDefined) &&
        forCorpusSize.forall(n =>
          curveCorpus.exists(c => decade(c) == decade(n)))
    val reaching = grid.filter(_._3 >= targetRecall)
    val (np, rr, rec, sec) =
      if (reaching.nonEmpty) reaching.minBy(p => (p._1, p._2))
      else grid.maxBy(p => (p._3, -p._1, -p._2))
    IvfPqOperatingPoint(np, rr, rec, sec, meetsTarget = reaching.nonEmpty,
      provenanceMatch = provenance)
  }
}
