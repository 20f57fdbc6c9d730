package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val orders = Tables.orders(spark, sfDir)

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("native top-k equals the window formulation exactly") {
    val native = TopKPerKey.perKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val window = viaWindow(3)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(native.length == window.length)
    assert(native.toSeq == window.toSeq)
  }

  test("plan contains partial and final operators around one exchange") {
    val df = TopKPerKey.perKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).length == 2, plan.take(900))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(900))
  }

  test("map-side partial prunes before the shuffle") {
    // 1 key, 1000 rows in 4 partitions, k=2: the partial phase may keep
    // at most 2 rows per partition → ≤8 rows cross the exchange. We
    // can't read shuffle metrics cheaply here, but the result must still
    // be the exact global top-2.
    val df = (1 to 1000).map(i => ("only", i.toLong)).toDF("g", "v")
      .repartition(4)
    val top = TopKPerKey.perKey(df, Seq("g"), Seq(("v", false)), 2)
      .select("v").collect().map(_.getLong(0)).sorted
    assert(top.toSeq == Seq(999L, 1000L))
  }

  test("tiny partial flush bound still yields the exact answer") {
    // Force the map-side heaps to flush constantly (bound of 3 retained
    // rows across many keys): extra partial emissions are merged away by
    // the final pass, so results must be identical to the window plan.
    val prev = spark.conf.getOption(TopKPerKey.PartialFlushRowsKey)
    spark.conf.set(TopKPerKey.PartialFlushRowsKey, "3")
    try {
      val df = (1 to 2000).map(i => (i % 97, i.toLong)).toDF("g", "v")
        .repartition(4)
      val native = TopKPerKey.perKey(df, Seq("g"), Seq(("v", false)), 2)
        .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
      val w = Window.partitionBy("g").orderBy(col("v").desc)
      val window = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
        .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
      assert(native == window)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(TopKPerKey.PartialFlushRowsKey, v)
        case None => spark.conf.unset(TopKPerKey.PartialFlushRowsKey)
      }
    }
  }

  test("global top-k with no keys") {
    val df = (1 to 100).map(i => i.toLong).toDF("v")
    val top = TopKPerKey.perKey(df, Nil, Seq(("v", true)), 5)
      .collect().map(_.getLong(0)).sorted
    assert(top.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("groups smaller than k return all their rows") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
    val res = TopKPerKey.perKey(df, Seq("g"), Seq(("v", false)), 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(res == Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }
}
