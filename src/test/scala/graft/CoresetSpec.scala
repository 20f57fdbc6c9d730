package graft

import graft.similarity.Coreset

class CoresetSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-derived line: greedy picks the endpoints then bisects") {
    // points at x = 0, 1, 9, 10, 4 (ids 1..5). Seed = id 1 (x=0);
    // farthest = x=10 (id 4, dist 10); next max-min = x=9? min(9,1)=1 —
    // no: candidates x=1 (min 1), x=9 (min 1), x=4 (min(4,6)=4) → id 5.
    // Round 4: x=1 min(1,3)=1, x=9 min(9,1,5)=1 → tie at 1 → smaller
    // id wins: id 2 (x=1) before id 3 (x=9).
    val pts = Seq((1L, Seq(0.0)), (2L, Seq(1.0)), (3L, Seq(9.0)),
      (4L, Seq(10.0)), (5L, Seq(4.0))).toDF("id", "vec")
    val got = Coreset.kCenterGreedy(pts, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1, 1L, 0.0), (2, 4L, 10.0), (3, 5L, 4.0),
      (4, 2L, 1.0), (5, 3L, 1.0)), s"got ${got.toSeq}")
  }

  test("random-corpus parity with a driver-side greedy; dist sequence " +
    "non-increasing; repartition-invariant") {
    val rnd = new scala.util.Random(47)
    val pts = (1L to 60L).map(i =>
      (i, Seq.fill(6)(rnd.nextGaussian())))
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // independent driver-side greedy with the operator's contract:
    // smallest-id seed, ROUNDED min-distance, (md desc, id asc) pick
    var chosen = List(pts.minBy(_._1))
    var expect = List((1, pts.minBy(_._1)._1, 0.0))
    for (i <- 2 to 10) {
      val cand = pts.filterNot(p => chosen.exists(_._1 == p._1))
        .map(p => (p, r6(chosen.map(c => dist(p._2, c._2)).min)))
      val best = cand.maxBy { case (p, d) => (d, -p._1) }
      chosen ::= best._1
      expect ::= ((i, best._1._1, best._2))
    }
    val want = expect.reverse
    val got = Coreset.kCenterGreedy(pts.toDF("id", "vec"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toList
    assert(got == want, s"diverged from driver greedy:\n$got\nvs\n$want")
    // max-min distances never increase as the cover densifies
    val ds = got.drop(1).map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, s"got $ds")
    // pure function of the data, not its partitioning
    val got2 = Coreset.kCenterGreedy(
        pts.toDF("id", "vec").repartition(7), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toList
    assert(got2 == want)
  }

  test("save/load/extend == full greedy (prefix-deterministic " +
    "recurrence); vectors round-trip bit-identically") {
    val rnd = new scala.util.Random(53)
    val pts = (1L to 40L).map(i => (i, Seq.fill(5)(rnd.nextGaussian())))
      .toDF("id", "vec")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toList
    val full = rows(Coreset.kCenterGreedy(pts, k = 9))
    val dir = java.nio.file.Files.createTempDirectory("coreset")
      .resolve("centers").toString
    Coreset.saveCenters(Coreset.kCenterGreedy(pts, k = 4), pts, dir)
    val loaded = spark.read.parquet(dir)
    // persisted vectors round-trip exactly (the extend contract)
    val lv = loaded.orderBy("rank").select("vec").collect()
      .map(_.getSeq[Double](0).toList).toList
    val direct = Coreset.kCenterGreedy(pts, k = 4).join(pts, "id")
      .orderBy("rank").select("vec").collect()
      .map(_.getSeq[Double](0).toList).toList
    assert(lv == direct)
    val extended = rows(Coreset.kCenterGreedyExtend(pts, loaded, k = 9)
      .orderBy("rank"))
    assert(extended == full,
      s"extend diverged from full greedy:\n$extended\nvs\n$full")
    // degenerate extension: k == prior size returns the prior as-is
    val same = rows(Coreset.kCenterGreedyExtend(pts, loaded, k = 4)
      .orderBy("rank"))
    assert(same == full.take(4))
  }

  test("bounds fail loudly: k > corpus, k > MaxK") {
    val tiny = Seq((1L, Seq(0.0)), (2L, Seq(1.0))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(tiny, k = 3)
    }
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(tiny, k = Coreset.MaxK + 1)
    }
  }
}
