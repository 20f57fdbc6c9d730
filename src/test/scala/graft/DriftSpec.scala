package graft

import graft.operators.Drift

class DriftSpec extends SparkSpecBase {
  import spark.implicits._

  private def vals(xs: Seq[Double]) = xs.toDF("v")

  test("psiBins matches hand-computed PSI terms") {
    // ref: 50/50 across the split; cur: 25/75
    val ref = vals(Seq.fill(10)(1.0) ++ Seq.fill(10)(25.0))
    val cur = vals(Seq.fill(5)(1.0) ++ Seq.fill(15)(25.0))
    val got = Drift.psiBins(ref, cur, "v", Seq(20.0)).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 2)
    assert(got(0) == ((0, 0.5, 0.25, math.floor((0.25 - 0.5) *
      math.log(0.25 / 0.5) * 1e6 + 0.5) / 1e6)))
    assert(got(1)._4 == math.floor((0.75 - 0.5) *
      math.log(0.75 / 0.5) * 1e6 + 0.5) / 1e6)
    // PSI terms are non-negative by construction
    assert(got.forall(_._4 >= 0.0))
  }

  test("identical distributions give zero PSI; empty bins floor at eps") {
    val ref = vals(Seq(1.0, 25.0, 50.0))
    val same = Drift.psiBins(ref, ref, "v", Seq(20.0, 40.0)).collect()
    assert(same.forall(_.getDouble(3) == 0.0))
    // cur misses bin 0 entirely → its cur_frac floors at eps and the
    // term stays finite
    val cur = vals(Seq(25.0, 50.0))
    val got = Drift.psiBins(ref, cur, "v", Seq(20.0, 40.0)).collect()
    val bin0 = got.find(_.getInt(0) == 0).get
    assert(bin0.getDouble(2) == 1e-6 && !bin0.getDouble(3).isInfinite)
  }
}
