package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan assertions: the scale-critical plan properties must hold,
  * not just the results. A regression that turns a broadcast join into a
  * shuffle or un-pushes a parquet filter passes value checks but fails
  * here.
  */
class PlanSpec extends SparkSpecBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("star-schema join broadcasts every dimension (fact never shuffles for joins)") {
    val p = plan(q("q_join_star"))
    assert("BroadcastHashJoin".r.findAllIn(p).length == 3, p.take(800))
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to SMJ")
  }

  test("pricing summary pushes the shipdate filter into the parquet scan") {
    val p = plan(q("q1_pricing_summary"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      p.take(1200))
  }

  test("pricing summary scan reads only referenced columns") {
    val p = plan(q("q1_pricing_summary"))
    // ReadSchema must include the 6 used columns and exclude unused ones
    assert(p.contains("l_returnflag") && !p.contains("l_comment"),
      "column pruning lost")
  }

  test("gold daily aggregate does partial (map-side) aggregation") {
    val p = plan(q("q_gold_daily"))
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r
      .findAllIn(p).length >= 2, "no partial+final aggregate pair")
  }

  test("sessionize reuses one hash exchange for both window passes and the groupBy") {
    val p = plan(q("q_sessionize"))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n${p.take(1500)}")
  }

  test("narrow projection/filter queries stay inside whole-stage codegen") {
    // codegen stages hide inside un-materialized AdaptiveSparkPlan;
    // disable AQE just for this plan inspection.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = q("q_case_arith").queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
      assert(p.contains("WholeStageCodegen subtree"), p.take(400))
      assert(!p.startsWith("Found 0 WholeStageCodegen"),
        "codegen lost on narrow transform")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("broadcast-dim query does not shuffle the fact side before the join") {
    val p = plan(q("q_join_broadcast_dim"))
    assert(p.contains("BroadcastHashJoin"))
    // only exchanges allowed: the post-join aggregate + final sort
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1)
  }

  test("exact dedup shuffles fingerprints, not text") {
    val p = plan(q("q_dedup_exact"))
    // the exchange partitions on the md5 fingerprint hash agg key; the
    // text column must be projected away before it
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx > 0)
    assert(!p.substring(0, exchangeIdx).contains("text#") ||
      p.substring(0, exchangeIdx).indexOf("md5") >= 0)
  }
}
