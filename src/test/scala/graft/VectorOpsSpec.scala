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
    val p = VectorOps.nearDupPairs(vecs, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p == Set((1L, 3L)))
    // exact baseline agrees on this all-one-bucket fixture
    val b = VectorOps.nearDupPairsBrute(vecs, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b == p)
  }

  test("bucketed nearDupPairs ⊆ brute baseline; misses only cross-bucket pairs") {
    // two clusters of scaled copies (cosine exactly 1 within a cluster,
    // same sign pattern → same bucket) + one near-dup of cluster 0 whose
    // first component flips sign → different bucket → bucketed misses it
    val base = Seq(Seq(1.0, 2.0, -1.0, 0.5), Seq(-1.0, 1.0, 2.0, -0.5))
    val rows = (for (b <- base.indices; j <- 0 until 3)
      yield ((b * 10 + j).toLong, base(b).map(_ * (1.0 + 0.5 * j)))) :+
      (99L, Seq(-0.001, 2.0, -1.0, 0.5))
    val df = rows.toDF("id", "vec")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorOps.nearDupPairsBrute(df, 0.8))
    val bucketed = pairs(VectorOps.nearDupPairs(df, 0.8, bits = 4))
    assert(bucketed.subsetOf(brute))
    assert(bucketed == Set((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L)))
    // the sign-flipped near-dup is exactly the recall loss
    assert((brute -- bucketed).forall(_._2 == 99L))
    assert(brute.contains((0L, 99L)))
  }

  test("signBucket is deterministic on first `bits` dims") {
    val b = Seq((Seq(1.0, -2.0, 3.0, -4.0))).toDF("v")
      .select(VectorOps.signBucket($"v", 4).as("b")).collect()(0).getString(0)
    assert(b == "1010")
  }
}
