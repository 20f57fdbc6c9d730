package graft

import graft.functions.VectorAggregates
import org.apache.spark.sql.functions._

class VectorAggSpec extends SparkSpecBase {
  import spark.implicits._

  test("VectorAvg computes element-wise means across partitions") {
    val df = Seq(
      ("a", Seq(1.0, 10.0)), ("a", Seq(3.0, 20.0)),
      ("b", Seq(5.0, 5.0))
    ).toDF("g", "vec").repartition(4)
    val r = df.groupBy("g")
      .agg(VectorAggregates.vectorAvgCol($"vec").as("m"))
      .collect().map(row => row.getString(0) -> row.getSeq[Double](1)).toMap
    assert(r("a") == Seq(2.0, 15.0))
    assert(r("b") == Seq(5.0, 5.0))
  }

  test("VectorAvg ignores nulls and handles an all-null group") {
    val df = Seq(
      ("a", Some(Seq(2.0, 4.0))), ("a", None), ("c", None)
    ).toDF("g", "vec")
    val r = df.groupBy("g")
      .agg(VectorAggregates.vectorAvgCol($"vec").as("m"))
      .collect().map(row => row.getString(0) -> row.getSeq[Double](1)).toMap
    assert(r("a") == Seq(2.0, 4.0))
    assert(r("c").isEmpty)
  }

  test("VectorAvg agrees with the posexplode formulation on the fixture") {
    val emb = Tables.embeddings(spark, sfDir)
      .select($"label", graft.similarity.VectorOps.asDouble($"embedding").as("vec"))
    val viaAgg = emb.groupBy("label")
      .agg(VectorAggregates.vectorAvgCol($"vec").as("m"))
      .select($"label", posexplode($"m").as(Seq("d", "v")))
      .select($"label", $"d", round($"v", 9).as("v"))
      .collect().map(r => (r.get(0).toString, r.getInt(1)) -> r.getDouble(2)).toMap
    val viaExplode = emb
      .select($"label", posexplode($"vec").as(Seq("d", "v")))
      .groupBy("label", "d").agg(round(avg("v"), 9).as("v"))
      .collect().map(r => (r.get(0).toString, r.getInt(1)) -> r.getDouble(2)).toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.foreach { case (k, v) =>
      assert(math.abs(v - viaExplode(k)) < 1e-9, s"mismatch at $k")
    }
  }
}
