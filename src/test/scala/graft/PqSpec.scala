package graft

import graft.similarity.{Pq, VectorOps}
import org.apache.spark.sql.functions.col

class PqSpec extends SparkSpecBase {

  private lazy val corpus = graft.Tables.embeddings(spark, sfDir)
    .select(col("vec_id").as("id"),
      VectorOps.asDouble(col("embedding")).as("vec"))

  test("codebooks and codes are deterministic and well-formed") {
    val cb1 = Pq.fitCodebooks(corpus, m = 8, ksub = 16)
    val cb2 = Pq.fitCodebooks(corpus, m = 8, ksub = 16)
    assert(cb1.length == 8 && cb1.forall(_.length == 16))
    assert(cb1.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq)
    val codes = Pq.encode(corpus, cb1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 8 &&
      c.forall(x => x >= 0 && x < 16)))
    // 8 codes of 4 bits replace 64 float64s — the 64x scan reduction
    assert(codes.nonEmpty)
  }

  test("PQ-ADC top-k recall vs brute force is high after exact re-rank") {
    val queries = corpus.filter(col("id") < 10)
    val exact = VectorOps.topKBruteForce(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Pq.topKPq(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall below floor; got $approx")
    // results are deterministic run to run
    val again = Pq.topKPq(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(approx == again)
  }

  test("IVFPQ composes the cell filter with ADC and keeps useful recall") {
    val queries = corpus.filter(col("id") < 10)
    val exact = VectorOps.topKBruteForce(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Pq.topKIvfPq(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // each query still yields k results (probed cells are never empty:
    // the query's own cell is always among its nprobe nearest)
    assert(approx.groupBy(_._1).forall(_._2.size == 3))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall below floor; got $approx")
  }
}
