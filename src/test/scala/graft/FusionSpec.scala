package graft

import graft.similarity.Fusion

class FusionSpec extends SparkSpecBase {
  import spark.implicits._

  test("rrf fuses ranks as exact integers with zero-filled misses") {
    val lex = Seq((1, 10L, 1), (1, 11L, 2), (2, 20L, 1)).toDF("q", "id", "rn")
    val sem = Seq((1, 11L, 1), (1, 12L, 2)).toDF("q", "id", "rn")
    val out = Fusion.rrf(Seq("lex" -> lex, "sem" -> sem), Seq("q"), "id")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    // item 11: lex rank 2, sem rank 1 → 1e6 div 62 + 1e6 div 61
    assert(out((1, 11L)) == ((2, 1, 1000000L / 62 + 1000000L / 61)))
    assert(out((1, 10L)) == ((1, 0, 1000000L / 61)))
    assert(out((1, 12L)) == ((0, 2, 1000000L / 62)))
    assert(out((2, 20L)) == ((1, 0, 1000000L / 61)))
    assert(out.size == 4)
  }

  test("rrf over three lists; ranks beyond the others still fuse") {
    val l1 = Seq((1, 5L, 3)).toDF("q", "id", "rn")
    val l2 = Seq((1, 5L, 7)).toDF("q", "id", "rn")
    val l3 = Seq((1, 6L, 1)).toDF("q", "id", "rn")
    val out = Fusion.rrf(Seq("a" -> l1, "b" -> l2, "c" -> l3), Seq("q"), "id")
      .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(out(5L) == 1000000L / 63 + 1000000L / 67)
    assert(out(6L) == 1000000L / 61)
  }

  test("rrf rejects duplicate list names and empty input") {
    val df = Seq((1, 1L, 1)).toDF("q", "id", "rn")
    intercept[IllegalArgumentException] {
      Fusion.rrf(Seq("x" -> df, "x" -> df), Seq("q"), "id")
    }
    intercept[IllegalArgumentException] {
      Fusion.rrf(Nil, Seq("q"), "id")
    }
  }
}
