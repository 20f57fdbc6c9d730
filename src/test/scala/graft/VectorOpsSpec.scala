package graft

import graft.functions.VectorExpressions.vecDot
import graft.similarity.VectorOps
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(1.0, 0.0, 0.0)),
    (2L, Seq(0.0, 1.0, 0.0)),
    (3L, Seq(2.0, 0.0, 0.0)),   // parallel to 1 → cosine 1.0
    (4L, Seq(1.0, 1.0, 0.0))
  ).toDF("id", "vec")

  test("vecDot matches hand-computed dot product (interpreted + codegen)") {
    val r = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(vecDot($"a", $"b").as("d")).collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("vecDot is null-safe and handles length mismatch via common prefix") {
    val df = Seq((Seq(1.0, 2.0), Option(Seq(3.0)))).toDF("a", "b")
    assert(df.select(vecDot($"a", $"b")).collect()(0).getDouble(0) == 3.0)
    val dfN = Seq((Seq(1.0), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(dfN.select(vecDot($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("cosine of parallel vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(3.0, 0.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 2.0), 0.0)
    ).toDF("a", "b", "want")
    df.collect() // force
    val got = df.select(VectorOps.cosine($"a", $"b").as("c"), $"want").collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("topKBruteForce ranks by cosine desc with id tiebreak") {
    val res = VectorOps.topKBruteForce(vecs.where($"id" === 1), vecs, k = 2)
      .orderBy("rn").collect()
    assert(res.length == 2)
    assert(res(0).getAs[Long]("vec_id") == 3L) // cosine 1.0
    assert(res(1).getAs[Long]("vec_id") == 4L) // cosine ~0.707
  }

  test("topKBucketed only searches within the sign bucket") {
    val res = VectorOps.topKBucketed(vecs.where($"id" === 1), vecs, k = 3, bits = 3)
    // all candidates share bucket "100"... vec2=(0,1,0) bucket "010"? signs:
    // x>=0 → all components >=0 → every vector here is bucket "111"
    assert(res.count() == 3)
  }

  test("nearDupPairs finds the parallel pair at threshold 0.99") {
    // parallel vectors agree on EVERY hyperplane sign, so all 32 band
    // keys collide — the banded join must surface exactly this pair
    val p = VectorOps.nearDupPairs(vecs, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p == Set((1L, 3L)))
    val b = VectorOps.nearDupPairsBrute(vecs, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b == p)
  }

  test("banded nearDupPairs ⊆ brute and recall ≥ 0.9 on PERTURBED near-dups") {
    // Perturbed (not scaled) near-dups: v' = v + noise gives cosine
    // ~0.55-0.8 with genuinely different sign patterns per hyperplane —
    // the regime where round 3's single-band bucketing had zero recall.
    val rnd = new scala.util.Random(42)
    def gauss(dim: Int) = Seq.fill(dim)(rnd.nextGaussian())
    val planted = (0 until 30).flatMap { i =>
      val v = gauss(64)
      val noisy = v.zip(gauss(64)).map { case (x, g) => x + 1.0 * g }
      Seq((i.toLong * 2, v), (i.toLong * 2 + 1, noisy))
    }
    val distractors = (0 until 40).map(i => (1000L + i, gauss(64)))
    val df = (planted ++ distractors).toDF("id", "vec")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorOps.nearDupPairsBrute(df, 0.45))
    val banded = pairs(VectorOps.nearDupPairs(df, 0.45))
    assert(banded.subsetOf(brute), "LSH must never invent a pair")
    assert(brute.nonEmpty, "fixture must plant above-threshold pairs")
    val recall = (banded & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (${banded.size}/${brute.size})")
  }

  test("strict 16×12 banding: recall ≥ 0.9 at θ=0.8 on the planted corpus") {
    // the scale-representative regime: realistic threshold, longer bands
    // (q_embed_neardup_strict's configuration) on the query's own
    // planted fixture — weak-noise copies (cos ≈ 0.93) must be found,
    // strong-noise copies (cos ≤ 0.76) and background pairs must not
    val df = graft.queries.SimilarityQueries
      .plantedCorpus(spark, sfDir).select("id", "vec")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorOps.nearDupPairsBrute(df, 0.8))
    val banded = pairs(
      VectorOps.nearDupPairs(df, 0.8, bands = 16, rowsPerBand = 12))
    assert(banded.subsetOf(brute), "LSH must never invent a pair")
    assert(brute.nonEmpty, "fixture must plant above-threshold pairs")
    // every true pair is a planted (id, id+100000) twin with an even id
    assert(brute.forall { case (a, b) => b == a + 100000L && a % 2 == 0 })
    val recall = (banded & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (${banded.size}/${brute.size})")
  }

  test("plantedCorpus perturbation is pinned to BASE-id md5 parity") {
    // Cross-engine pin: the DuckDB oracle seeds noise with the BASE id
    // (md5("p:<base>:<dim>")), so this test recomputes the expected signs
    // with java.security.MessageDigest — independent of Spark's md5 and of
    // any Spark-vs-Spark recall test. It fails if the builder ever seeds
    // with the shifted id again (the r5 alias-capture bug, 247-vs-241 rows).
    def parity(seed: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(seed.getBytes("UTF-8"))
      val firstHex = (d(0) >> 4) & 0xf
      if (firstHex % 2 == 0) 1.0 else -1.0
    }
    val df = graft.queries.SimilarityQueries.plantedCorpus(spark, sfDir)
    val byId = df.filter(col("id").isin(0L, 1L, 100000L, 100001L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((baseId, alpha) <- Seq(0L -> 0.05, 1L -> 0.17)) {
      val base = byId(baseId)
      val pert = byId(baseId + 100000L)
      assert(base.length == 64 && pert.length == 64)
      base.indices.foreach { i =>
        val want = base(i) + alpha * parity(s"p:$baseId:$i")
        assert(math.abs(pert(i) - want) < 1e-12,
          s"id $baseId dim $i: got ${pert(i)}, want $want")
      }
    }
  }

  test("semanticDedup drops greedily against earlier ids within a bucket") {
    // angles 0°, 25°, 50° in the (+,+) quadrant — one sign bucket.
    // cos(0°,25°) = cos(25°,50°) ≈ 0.906 ≥ 0.8; cos(0°,50°) ≈ 0.643 < 0.8.
    // -25° has cosine 0.906 to vector 0 but lives in bucket "10" — bucket
    // blindness is the accepted approximation, it must NOT be dropped.
    def v(deg: Double) = {
      val r = math.toRadians(deg); Seq(math.cos(r), math.sin(r))
    }
    val corpus = Seq((0L, v(0)), (1L, v(25)), (2L, v(50)), (3L, v(-25)))
      .toDF("id", "vec")
    val drops = VectorOps.semanticDedup(corpus, 0.8, bits = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 drops against 1 even though 1 itself dropped — the greedy
    // SemDeDup rule (earlier neighbor, surviving or not), NOT connected
    // components (which would put 0,1,2 in one cluster anyway) and NOT
    // transitive-closure-free pair filtering.
    assert(drops == Map(1L -> 0L, 2L -> 1L))
  }

  test("quantizeInt8Stats: hand-checked scale/extremes, zero vector excluded") {
    // max|v| = 12.7 → scale 0.1; q = [127, -64, 0] (round(-6.35/0.1) =
    // round(-63.5) → -64, half away from zero — the DuckDB tie rule too)
    val df = Seq(
      (1L, Seq(12.7, -6.35, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0))  // scale 0 → excluded
    ).toDF("id", "vec")
    val rows = VectorOps.quantizeInt8Stats(df).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(0) == 1L)
    assert(math.abs(r.getDouble(1) - 0.1) < 1e-9)     // scale8
    assert(r.getLong(2) == 63L)                        // q_sum
    assert(r.getLong(3) == -64L && r.getLong(4) == 127L)
    // recon err: |127*0.1-12.7| + |-64*0.1+6.35| + 0 = ~0.05
    assert(math.abs(r.getDouble(5) - 0.05) < 1e-6)
  }

  test("randomProject matches hand-computed md5-parity projection") {
    // independent recomputation via MessageDigest (not Spark's md5), the
    // same cross-engine pin style as the plantedCorpus test: w(j,i) = +1
    // iff the first hex digit of md5("j:i") is even; p_j = <v,w_j>/sqrt(k)
    def parity(seed: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(seed.getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
    }
    val v = Seq(1.0, 2.0, 3.0)
    val k = 2
    val want = (0 until k).map { j =>
      v.zipWithIndex.map { case (x, i) => x * parity(s"$j:$i") }.sum /
        math.sqrt(k.toDouble)
    }
    val got = Seq(Tuple1(v)).toDF("v")
      .select(graft.functions.VectorExpressions.randomProject($"v", k).as("p"))
      .collect()(0).getSeq[Double](0)
    assert(got.length == k)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("randomProject nulls out on null input or null element") {
    val dfNull = Seq(Tuple1(Option.empty[Seq[Double]])).toDF("v")
    assert(dfNull.select(
      graft.functions.VectorExpressions.randomProject($"v", 4))
      .collect()(0).isNullAt(0))
    val dfElem = Seq(Tuple1(Seq(Option(1.0), Option.empty[Double]))).toDF("v")
    assert(dfElem.select(
      graft.functions.VectorExpressions.randomProject($"v", 4))
      .collect()(0).isNullAt(0))
  }

  test("randomProject signs agree with sign-LSH band keys (shared family)") {
    // hyperplane j is the same row in both: the sign of projection j must
    // equal bit j of the band-key string (bands=1, r=k reads rows 0..k-1)
    val k = 8
    val df = vecs.select($"id",
      graft.functions.VectorExpressions.randomProject($"vec", k).as("p"),
      graft.functions.VectorExpressions.signLshBandKeys($"vec", 1, k).as("keys"))
    df.collect().foreach { r =>
      val p = r.getSeq[Double](1)
      val key = r.getSeq[String](2).head
      p.zip(key).foreach { case (x, bit) =>
        assert((x >= 0) == (bit == '1'),
          s"id ${r.getLong(0)}: projection sign disagrees with band bit")
      }
    }
  }

  test("topKProjected finds every planted twin as top-1 (shortlist 10)") {
    // the regime the two-stage shape exists for: real near-dups at
    // cos≈0.93 survive the 64→16 JL projection far above the ≤0.51
    // background, so even a small shortlist keeps them for the exact
    // re-rank (measured hit rate 1.0 at shortlist=10 on this fixture)
    val planted = graft.queries.SimilarityQueries
      .plantedCorpus(spark, sfDir).select("id", "vec")
    val q = planted.filter(col("id") % 2 === 0 && col("id") < 100000L)
    val top1 = VectorOps.topKProjected(q, planted, 1, shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("vec_id")))
    assert(top1.nonEmpty)
    val hit = top1.count { case (qid, nid) => nid == qid + 100000L }
    assert(hit.toDouble / top1.length >= 0.95,
      s"planted top-1 hit rate ${hit.toDouble / top1.length} < 0.95")
  }

  test("topKProjected re-rank cosines are exact (agree with brute force)") {
    // stage 2 must produce the same rounded cosine the exact baseline
    // computes for any (query, neighbor) pair it returns
    val c = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        VectorOps.asDouble(col("embedding")).as("vec"))
    val q = c.filter(col("id") < 10)
    val bruteCos = VectorOps.topKBruteForce(q, c, 100)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("cos")).toMap
    val proj = VectorOps.topKProjected(q, c, 3, shortlist = 50).collect()
    assert(proj.nonEmpty)
    proj.foreach { r =>
      val key = (r.getLong(0), r.getAs[Long]("vec_id"))
      bruteCos.get(key).foreach { bc =>
        assert(bc == r.getAs[Double]("cos"),
          s"$key: projected re-rank cos ${r.getAs[Double]("cos")} != brute $bc")
      }
    }
  }

  test("signBucket is deterministic on first `bits` dims") {
    val b = Seq((Seq(1.0, -2.0, 3.0, -4.0))).toDF("v")
      .select(VectorOps.signBucket($"v", 4).as("b")).collect()(0).getString(0)
    assert(b == "1010")
  }

  test("semanticDecontam flags only corpus vectors near an eval vector") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),   // hit: eval e1 is a near-copy
      (2L, Seq(0.0, 1.0, 0.0)),   // miss: orthogonal to both evals
      (3L, Seq(0.9, 0.1, 0.0)),   // hit: cos to e1 ≈ 0.995
      (4L, Seq(-1.0, 0.0, 0.0))   // miss: anti-parallel
    ).toDF("id", "vec")
    val evalSet = Seq(
      (100L, Seq(0.99, 0.01, 0.0)),
      (101L, Seq(0.0, 0.0, 1.0))  // matches nothing
    ).toDF("id", "vec")
    val got = VectorOps.semanticDecontam(corpus, evalSet, 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_eval_hits"), r.getAs[Double]("max_cos"))).toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L)._1 == 1L && got(1L)._2 > 0.99)
    assert(got(3L)._1 == 1L)
  }
}
