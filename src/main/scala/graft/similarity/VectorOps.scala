package graft.similarity

import graft.functions.VectorExpressions.vecDot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity operators over an `Array[Float]` embedding column:
  * cosine/dot/norm plus brute-force and LSH-bucketed top-k search.
  *
  * The hot inner product is the native codegen'd `VecDot` Catalyst
  * expression (graft.functions.VectorExpressions) — a primitive loop over
  * ArrayData, ~40× faster than the interpreted higher-order-function
  * formulation on pair joins. Norms are computed ONCE per vector behind a
  * `repartition` barrier, so each candidate pair costs exactly one dot
  * product; cosine = dot / (|a|·|b|) in that exact operation order, which
  * is what the DuckDB oracle computes too (fp-identical at round-6).
  *
  * Scale design: brute-force top-k broadcasts the (small) query set against
  * the corpus — linear in corpus size, embarrassingly parallel. The
  * bucketed variant (sign-bit LSH) turns ANN into an equi-join on the
  * bucket key: the corpus shuffles once by bucket and each bucket ranks
  * locally — no cross product anywhere. Ranking always uses the ROUNDED
  * similarity plus vec_id tiebreak so results are deterministic and
  * engine-independent, and always goes through `Ranking.topKRanked`
  * (bounded-heap TopKPerKey, map-side pruned) — never a per-query
  * Window, which would funnel each query's whole candidate stream
  * through one task.
  */
object VectorOps {

  /** Cast a float vector to double (exact widening) for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def l2norm(v: Column): Column = sqrt(vecDot(v, v))

  def cosine(a: Column, b: Column): Column =
    vecDot(a, b) / (l2norm(a) * l2norm(b))

  /** Sign-bit LSH bucket over the first `bits` dimensions: '1' where the
    * component is ≥ 0. Axis-aligned hyperplanes — deterministic and
    * reproducible in any engine.
    */
  def signBucket(v: Column, bits: Int = 8): Column =
    array_join(transform(slice(v, 1, bits),
      x => when(x >= 0, "1").otherwise("0")), "")

  /** (prefix+id, prefix+vec, prefix+nrm) with the norm materialized behind
    * an exchange so downstream pair joins evaluate only one VecDot each.
    */
  private def withNorm(df: DataFrame, p: String,
                       passthrough: Seq[String] = Nil): DataFrame =
    df.select(Seq(col("id").as(s"${p}id"), col("vec").as(s"${p}vec"),
        l2norm(col("vec")).as(s"${p}nrm")) ++
        passthrough.map(c => col(c).as(s"$p$c")): _*)
      .repartition(col(s"${p}id"))

  private def pairCos(p1: String, p2: String): Column =
    round(vecDot(col(s"${p1}vec"), col(s"${p2}vec")) /
      (col(s"${p1}nrm") * col(s"${p2}nrm")), 6)

  /** Exact top-k neighbors for each query vector (brute force, the recall
    * baseline). `queries`/`corpus`: (id, vec) with vec already double.
    */
  def topKBruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries, "q")
    val c = withNorm(corpus, "c")
    val scored = q.hint("broadcast")
      .join(c, col("qid") =!= col("cid"))
      .withColumn("cos", pairCos("q", "c"))
    Ranking.topKRanked(scored, "qid", "cos", "cid", k)
      .select(col("qid"), col("rn"), col("cid").as("vec_id"), col("cos"))
  }

  /** HARD-NEGATIVE mining: for each labeled query, the k most-similar
    * corpus vectors with a DIFFERENT label — the negatives that actually
    * move a contrastive/embedding loss (random negatives are mostly
    * trivial; the near-but-wrong ones carry the gradient). Inputs carry
    * (id, vec, label). Brute-force shape with the (small) query side
    * broadcast — at scale, swap the corpus scan for the IVF/PQ shortlist
    * and re-rank, exactly as the top-k operators do.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    k: Int): DataFrame = {
    // the shared norm/cosine plumbing (one norm per vector behind the
    // repartition barrier, oracle-pinned rounding) with labels riding
    // the passthrough
    val q = withNorm(queries, "q", Seq("label"))
    val c = withNorm(corpus, "c", Seq("label"))
    val scored = q.hint("broadcast")
      .join(c, col("qlabel") =!= col("clabel"))
      .withColumn("cos", pairCos("q", "c"))
    Ranking.topKRanked(scored, "qid", "cos", "cid", k, carry = Seq("clabel"))
      .select(col("qid"), col("rn"), col("cid").as("neg_id"),
        col("clabel").as("neg_label"), col("cos"))
  }

  /** Hard negatives AT SCALE: the IVF shortlist replaces hardNegatives'
    * full corpus scan — each query scores only its `nprobe` nearest
    * cells (≈ nprobe/nlist of the corpus), the different-label
    * constraint applies before ranking, and the rank comes from the
    * same TopKPerKey tail as every top-k here. With nprobe = nlist the
    * candidate set is the whole corpus and the result equals
    * `hardNegatives` exactly (IvfSpec pins that identity); below it,
    * recall follows the IVF trade like topKIvf.
    */
  def hardNegativesIvf(queries: DataFrame, corpus: DataFrame, k: Int,
                       nlist: Int = 16, nprobe: Int = 4,
                       kmeansIters: Int = 3): DataFrame = {
    val centroids = Ivf.kmeansFit(corpus.select("id", "vec"), nlist,
      kmeansIters)
    val c = Ivf.assignCells(corpus, centroids)
      .select(col("id").as("cid"), col("vec").as("cvec"),
        col("label").as("clabel"), col("cell"))
      .withColumn("cnrm", l2norm(col("cvec")))
    val q = Ivf.probeCells(queries, centroids, nprobe)
      .select(col("id").as("qid"), col("vec").as("qvec"),
        col("label").as("qlabel"), col("cell"))
      .withColumn("qnrm", l2norm(col("qvec")))
    val scored = q.join(c, Seq("cell"))
      .filter(col("qlabel") =!= col("clabel"))
      .withColumn("cos", round(vecDot(col("qvec"), col("cvec")) /
        (col("qnrm") * col("cnrm")), 6))
    Ranking.topKRanked(scored, "qid", "cos", "cid", k, carry = Seq("clabel"))
      .select(col("qid"), col("rn"), col("cid").as("neg_id"),
        col("clabel").as("neg_label"), col("cos"))
  }

  /** Approximate top-k: candidates limited to the query's LSH bucket, then
    * ranked exactly. Recall < 1, cost linear with one bucket-key shuffle.
    */
  def topKBucketed(queries: DataFrame, corpus: DataFrame, k: Int,
                   bits: Int = 8): DataFrame = {
    val q = withNorm(queries, "q")
      .withColumn("bucket", signBucket(col("qvec"), bits))
    val c = withNorm(corpus, "c")
      .withColumn("bucket", signBucket(col("cvec"), bits))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", pairCos("q", "c"))
    Ranking.topKRanked(scored, "qid", "cos", "cid", k)
      .select(col("qid"), col("rn"), col("cid").as("vec_id"), col("cos"))
  }

  /** Two-stage approximate top-k: shortlist in Johnson-Lindenstrauss
    * projected space, then exact re-rank on the full vectors — the
    * standard retrieval shape at scale. Stage 1 carries ONLY
    * (id, kDim-dim projection) through the broadcast join, `64/kDim`×
    * narrower than the full vectors, and ranks by rounded projected
    * cosine; stage 2 re-joins the full vectors BY ID for the `shortlist`
    * survivors per query and re-ranks exactly. Both stages break ties by
    * id on rounded similarities, so the result is deterministic and
    * engine-independent (the DuckDB oracle rebuilds the projection from
    * the md5-parity rule).
    *
    * Recall comes from `shortlist ≫ k`: JL to 16 dims perturbs cosine by
    * ~±1/√16, so the true top-k sit near the top of the projected order
    * but not exactly at it. IvfSpec-style recall is pinned in
    * VectorOpsSpec against `topKBruteForce`.
    */
  def topKProjected(queries: DataFrame, corpus: DataFrame, k: Int,
                    shortlist: Int = 50, kDim: Int = 16): DataFrame = {
    import graft.functions.VectorExpressions.randomProject
    def projected(df: DataFrame, p: String): DataFrame = df.select(
      col("id").as(s"${p}id"),
      randomProject(col("vec"), kDim).as(s"${p}pv"))
      .withColumn(s"${p}pnrm", l2norm(col(s"${p}pv")))
    val shortScored = projected(queries, "q").hint("broadcast")
      .join(projected(corpus, "c"), col("qid") =!= col("cid"))
      .withColumn("pcos", round(vecDot(col("qpv"), col("cpv")) /
        (col("qpnrm") * col("cpnrm")), 6))
    val short = Ranking.topKIds(shortScored, "qid", "pcos", "cid", shortlist)
    val q = withNorm(queries, "q")
    val c = withNorm(corpus, "c")
    val scored = short.join(q.hint("broadcast"), "qid").join(c, "cid")
      .withColumn("cos", pairCos("q", "c"))
    Ranking.topKRanked(scored, "qid", "cos", "cid", k)
      .select(col("qid"), col("rn"), col("cid").as("vec_id"), col("cos"))
  }

  /** Near-duplicate pairs (ida < idb) with cosine ≥ threshold (threshold
    * applies to the rounded value) — the DEFAULT, scale-safe path.
    *
    * Candidate generation is OR-amplified random-hyperplane LSH, the same
    * banded structure `Dedup.minhashLshPairs` uses for text: every vector
    * gets `bands` keys (band b = signs of `rowsPerBand` deterministic
    * md5-derived ±1 hyperplanes — functions.SignLshOps), candidates share
    * ≥1 band key (equi-join on (band, key), union across bands, dedup),
    * and only candidates are cosine-verified. The band join carries
    * (id, band, key) rows only — vectors re-join by id afterwards — so
    * every shuffle is linear in corpus size; pair work is
    * sum-of-squares of band-bucket sizes, never corpus².
    *
    * Tuning: P(pair survives) = 1−(1−p^r)^B with p = 1−θ/π. The default
    * 32×6 holds recall ≈1 down to cosine ≈0.45 (measured 14/14 on the
    * sf0.01 fixture vs `nearDupPairsBrute`; VectorOpsSpec pins ≥0.9 on
    * perturbed near-dups). Near-orthogonal corpora at such low thresholds
    * are LSH's hardest regime (p1≈0.65 vs p2≈0.5) — selectivity improves
    * sharply for the typical near-dup thresholds ≥0.8, where fewer, longer
    * bands (e.g. 16×12) cut candidates by orders of magnitude; raise
    * `rowsPerBand` with the threshold.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   bands: Int = 32, rowsPerBand: Int = 6): DataFrame = {
    // NO withNorm repartition barrier here (unlike the top-k paths): the
    // barrier's full-vector corpus exchange costs more than it saves —
    // without it the norm inlines into the verify projection and is
    // recomputed per CANDIDATE (one extra VecDot per side), but those
    // flops are cache-local while the exchange serializes every vector.
    // Measured at sf0.1 (median-of-3, isolated): 1.53s with the barrier
    // → 1.16s without; the same reasoning holds at scale because the
    // barrier is O(corpus·dim) network while the recompute is
    // O(candidates·dim) arithmetic.
    val t = corpus.select(col("id"), col("vec"), l2norm(col("vec")).as("nrm"))
    val banded = t.select(col("id"),
      posexplode(graft.functions.VectorExpressions
        .signLshBandKeys(col("vec"), bands, rowsPerBand)).as(Seq("band", "key")))
    val cand = banded.select(col("id").as("ida"), col("band"), col("key"))
      .join(banded.select(col("id").as("idb"), col("band").as("band_b"),
          col("key").as("key_b")),
        col("band") === col("band_b") && col("key") === col("key_b") &&
          col("ida") < col("idb"))
      .select("ida", "idb")
      .distinct()
    cand
      .join(t.select(col("id").as("ida"), col("vec").as("avec"),
        col("nrm").as("anrm")), "ida")
      .join(t.select(col("id").as("idb"), col("vec").as("bvec"),
        col("nrm").as("bnrm")), "idb")
      .withColumn("cos", pairCos("a", "b"))
      .filter(col("cos") >= threshold)
      .select(col("ida"), col("idb"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * coarse-cluster the embedding space, then within each cluster drop
    * every vector that has an EARLIER (lower-id) neighbor at or above the
    * cosine threshold. This is the one-pass greedy prune — cheaper and
    * more aggressive than connected-components clustering (a vector is
    * dropped even when its earlier neighbor was itself dropped), and the
    * standard way to thin semantically-redundant regions of a corpus
    * that near-dup TEXT dedup cannot see.
    *
    * Clusters are deterministic sign-bit LSH buckets over the first
    * `bits` dimensions (`signBucket` — axis-aligned, reproducible in any
    * engine, so the DuckDB oracle rebuilds them exactly) standing in for
    * SemDeDup's k-means cells; 2^bits plays the role of k. Pairs are
    * generated only WITHIN a bucket: one bucket-keyed exchange (shared by
    * both join sides via ReuseExchange), pair work bounded by the sum of
    * squared bucket sizes. At 100 TB, size `bits` so corpus/2^bits rows
    * fit a partition, and pre-split any pathological bucket (vectors
    * hugging the axes) on a second hyperplane family.
    *
    * Returns the DROP LIST (id, dup_of, cos): `dup_of` = the minimum
    * earlier similar id, `cos` the rounded cosine to it. Materialize the
    * pruned corpus with a `Components.cleanCorpus`-style anti-join.
    */
  def semanticDedup(corpus: DataFrame, threshold: Double,
                    bits: Int = 8): DataFrame = {
    val t = corpus.select(col("id"), col("vec"),
      l2norm(col("vec")).as("nrm"), signBucket(col("vec"), bits).as("bucket"))
    val a = t.select(col("bucket"), col("id").as("aid"),
      col("vec").as("avec"), col("nrm").as("anrm"))
    val b = t.select(col("bucket"), col("id").as("bid"),
      col("vec").as("bvec"), col("nrm").as("bnrm"))
    a.join(b, Seq("bucket"))
      .filter(col("aid") < col("bid"))
      .withColumn("cos", pairCos("a", "b"))
      .filter(col("cos") >= threshold)
      .groupBy("bid")
      .agg(min("aid").as("dup_of"), min_by(col("cos"), col("aid")).as("cos"))
      .select(col("bid").as("id"), col("dup_of"), col("cos"))
  }

  /** SEMANTIC decontamination: flag corpus vectors whose cosine to ANY
    * eval-set vector reaches `threshold` — the embedding-space twin of
    * the n-gram decontamination family (Dedup.crossExactMatches /
    * crossNearMatches), catching paraphrased test-set leakage that no
    * lexical overlap check can see.
    *
    * Shape: eval sets are small and fixed (thousands), the corpus is the
    * 100-TB side — so the eval side BROADCASTS and the corpus streams
    * through one narrow stage: broadcast nested-loop, cosine, θ-filter,
    * partial-aggregated count/max per corpus id. No corpus-sized shuffle
    * exists; only the (rare) flagged ids reach the exchange. The
    * |corpus|×|eval| dot products are the honest cost of EXACT semantic
    * decontam; if the eval side ever grows past broadcast range, swap
    * candidate generation for the banded sign-LSH of nearDupPairs and
    * keep the same verify.
    *
    * Returns (id, n_eval_hits, max_cos) per flagged corpus vector.
    */
  def semanticDecontam(corpus: DataFrame, evalSet: DataFrame,
                       threshold: Double): DataFrame = {
    val ev = evalSet.select(col("id").as("eid"), col("vec").as("evec"))
    corpus.select(col("id"), col("vec"))
      .crossJoin(broadcast(ev))
      .select(col("id"),
        round(cosine(col("vec"), col("evec")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("id")
      .agg(count(lit(1)).as("n_eval_hits"), max(col("cos")).as("max_cos"))
  }

  /** Int8 symmetric per-vector quantization profile — the embedding
    * compression step of a training/serving pipeline (store q = round(v /
    * scale) with scale = max|v| / 127; 4-8× smaller, reconstruction
    * v ≈ q·scale). Emits per-vector audit columns rather than the raw
    * int8 payload so the result is engine-comparable: the quantized
    * checksum/extremes and the L1 reconstruction error.
    *
    * By construction |v_i / scale| ≤ 127, so no clamp is needed; zero
    * vectors (scale = 0) are excluded on both engines rather than
    * special-cased. Narrow per-row transform — no shuffle, scales
    * embarrassingly. The HOF lambdas here are interpreted, but at 64
    * dims × one pass per row that is microseconds/row — a native
    * expression would be over-engineering (contrast VecDot, which runs
    * once per candidate PAIR).
    */
  def quantizeInt8Stats(corpus: DataFrame): DataFrame = {
    val scale = array_max(transform(col("vec"), x => abs(x))) / lit(127.0)
    val q = transform(col("vec"), x => round(x / col("scale")).cast("long"))
    corpus
      .select(col("id"), col("vec"), scale.as("scale"))
      .filter(col("scale") > 0)
      .withColumn("qv", q)
      .select(
        col("id"),
        round(col("scale"), 8).as("scale8"),
        aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        array_min(col("qv")).as("q_min"),
        array_max(col("qv")).as("q_max"),
        round(aggregate(
          zip_with(col("qv"), col("vec"),
            (qi, vi) => abs(qi.cast("double") * col("scale") - vi)),
          lit(0.0), (acc, x) => acc + x), 6).as("recon_err"))
  }

  /** All pairs (ida < idb) with cosine ≥ threshold — EXACT quadratic
    * verification, the recall baseline for `nearDupPairs`. Not the scale
    * path: it is a driver collect + O(n²) scan by design.
    *
    * Implementation: broadcast the corpus (id, vec, norm) and scan pairs
    * in a mapPartitions loop. The declarative nested-loop-join
    * formulation materializes every candidate pair as an UnsafeRow
    * carrying both full vectors (~4M row copies × 0.5 KB on the 2k-vector
    * fixture) and was ~10× slower for identical output; here only
    * above-threshold pairs ever become rows. Broadcast bound: corpus must
    * fit in executor memory (n×dim×8B — 1 GB ≈ 2M×64d); beyond that,
    * use the bucketed default.
    */
  def nearDupPairsBrute(corpus: DataFrame, threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = corpus.select(col("id").cast("long"), col("vec")).rdd
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val all = rows.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(
      all.map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        (id, v, math.sqrt(s))
      })
    val n = all.length
    spark.sparkContext.parallelize(0 until n,
        math.min(n, spark.sparkContext.defaultParallelism))
      .flatMap { ai =>
        val entries = bc.value
        val (ida, va, na) = entries(ai)
        (ai + 1 until n).iterator.flatMap { bi =>
          val (idb, vb, nb) = entries(bi)
          var dot = 0.0; var i = 0
          val len = math.min(va.length, vb.length)
          while (i < len) { dot += va(i) * vb(i); i += 1 }
          // exactly Spark's round(): BigDecimal.valueOf (string-based,
          // NOT the exact-binary constructor) + HALF_UP
          val cos = java.math.BigDecimal.valueOf(dot / (na * nb))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          if (cos >= threshold) Some((ida, idb, cos)) else None
        }
      }
      .toDF("ida", "idb", "cos")
  }
}
