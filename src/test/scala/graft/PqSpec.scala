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

  test("codebooks round-trip the lake bit-identically; incremental " +
    "index == full re-encode; indexed search == topKPq") {
    val base = corpus.filter(col("id") % 3 =!= 0)
    val batch = corpus.filter(col("id") % 3 === 0)
    val trained = Pq.fitCodebooks(base, m = 8, ksub = 16)
    val dir = java.nio.file.Files.createTempDirectory("pq-books")
      .resolve("cb").toString
    Pq.saveCodebooks(spark, trained, dir)
    val loaded = Pq.loadCodebooks(spark, dir)
    assert(loaded.flatten.flatten.toSeq == trained.flatten.flatten.toSeq,
      "doubles must round-trip parquet bit-identically")
    // encode is a pure per-row map: base+batch under loaded books ==
    // one-pass re-encode of the whole corpus under trained books
    def codeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val incremental = codeSet(Pq.encode(base, loaded)
      .unionByName(Pq.encode(batch, loaded)))
    val rebuilt = codeSet(Pq.encode(corpus, trained))
    assert(incremental == rebuilt)
    // searching the incrementally-grown index under loaded books ==
    // topKPq given the same codebooks (one definition of the scan path)
    val queries = corpus.filter(col("id") < 10)
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaIndex = res(Pq.topKPqIndexed(queries,
      Pq.encode(base, loaded).unionByName(Pq.encode(batch, loaded)),
      corpus, loaded, k = 3))
    val viaFit = res(Pq.topKPqIndexed(queries, Pq.encode(corpus, trained),
      corpus, trained, k = 3))
    assert(viaIndex == viaFit)
  }
}
