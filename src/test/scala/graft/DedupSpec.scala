package graft

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  // d1/d2 exact dups modulo case+whitespace; d3 near-dup of d1 (one word
  // changed); d4 unrelated.
  private lazy val docs: DataFrame = Seq(
    (1L, "The quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the QUICK brown   fox jumps over the lazy dog near the river bank"),
    (3L, "The quick brown fox jumps over the lazy cat near the river bank"),
    (4L, "completely different content about gpu clusters and telemetry data")
  ).toDF("doc_id", "body")

  test("exactGroups collapses case/whitespace duplicates") {
    val g = Dedup.exactGroups(docs, "body", "doc_id").collect()
    assert(g.length == 3) // {1,2}, {3}, {4}
    val dup = g.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("canonical_id") == 1L)
  }

  test("jaccardPairs finds the near-dup pair above threshold") {
    val p = Dedup.jaccardPairs(docs, "body", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((1L, 2L))) // exact dup → jaccard 1.0
    assert(p.contains((1L, 3L))) // one word differs in 13 → high overlap
    assert(!p.exists(t => t._1 == 4L || t._2 == 4L))
  }

  test("jaccard of exact dup is 1.0") {
    val j = Dedup.jaccardPairs(docs, "body", "doc_id", threshold = 0.99)
      .where($"ida" === 1 && $"idb" === 2).collect()
    assert(j.length == 1 && j(0).getAs[Double]("jaccard") == 1.0)
  }

  test("minhashLshPairs finds exact dup and skips unrelated docs") {
    val p = Dedup.minhashLshPairs(docs, "body", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((1L, 2L)))
    assert(!p.exists(t => t._1 == 4L || t._2 == 4L))
  }

  test("simhash: identical docs hash equal; near-dups within small hamming") {
    val h = Dedup.simhashDocs(docs, "body", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L)) // tokens identical after normalization
    val hamming13 = java.lang.Long.bitCount(h(1L) ^ h(3L))
    val hamming14 = java.lang.Long.bitCount(h(1L) ^ h(4L))
    assert(hamming13 < hamming14)
  }

  test("simhashPairs returns the trivial pair at hamming 0") {
    val p = Dedup.simhashPairs(docs, "body", "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p == Set((1L, 2L)))
  }

  test("jaccardPairs with maxShingleFreq drops ubiquitous shingles") {
    // cap=1: every shared shingle is dropped, so no pairs survive
    val p = Dedup.jaccardPairs(docs, "body", "doc_id", threshold = 0.1,
      maxShingleFreq = 1).collect()
    assert(p.isEmpty)
  }
}
