package graft

import graft.text.Packing

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  // 4 tokens per doc; budget 10 → exclusive prefix sums 0,4,8,12,16 →
  // packs 0,0,0,1,1 (doc 3 starts at token 12: concatenate-then-chunk
  // assigns by FIRST token position, so a doc may straddle the boundary)
  private lazy val docs = (0 until 5)
    .map(i => (i.toLong, "a b c d")).toDF("doc_id", "text")

  test("pack assignment follows the exclusive token prefix sum") {
    val got = Packing.packBySize(docs, "doc_id", "text", packTokens = 10)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 0L, 0L), (1L, 4L, 0L), (2L, 8L, 0L),
      (3L, 12L, 1L), (4L, 16L, 1L)))
  }

  test("packStats aggregates docs, tokens and id span per pack") {
    val got = Packing.packStats(docs, "doc_id", "text", packTokens = 10)
      .orderBy("pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 3L, 12L, 0L, 2L), (1L, 2L, 8L, 3L, 4L)))
  }

  test("empty docs get zero tokens but still land in a pack") {
    val mixed = Seq((0L, "x y"), (1L, "   "), (2L, "z")).toDF("doc_id", "text")
    val got = Packing.packBySize(mixed, "doc_id", "text", packTokens = 100)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 0L), (0L, 0L), (1L, 0L)))
  }

  test("non-positive budget is rejected") {
    intercept[IllegalArgumentException] {
      Packing.packBySize(docs, "doc_id", "text", packTokens = 0)
    }
  }
}
