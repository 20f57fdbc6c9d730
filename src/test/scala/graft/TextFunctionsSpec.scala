package graft

import graft.text.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[T]("r")

  /** Array columns come back as mutable.ArraySeq; normalize to List. */
  private def arr(c: org.apache.spark.sql.Column, text: String): List[String] =
    Seq(text).toDF("t").select(c.as("r")).collect()(0)
      .getAs[scala.collection.Seq[String]]("r").toList

  test("tokens lower-cases, trims, drops empties") {
    val r = arr(tokens(col("t")), "  The  quick   Fox ")
    assert(r == Seq("the", "quick", "fox"))
  }

  test("tokenCount of empty string is 0") {
    assert(one[Int](tokenCount(col("t")), "") == 0)
    assert(one[Int](tokenCount(col("t")), "a b c") == 3)
  }

  test("punctRatio counts only the explicit class") {
    // "a,b." → 2 punct / 4 chars = 0.5
    assert(one[Double](punctRatio(col("t")), "a,b.") == 0.5)
    assert(one[Double](punctRatio(col("t")), "abcd") == 0.0)
  }

  test("avgWordLen averages token lengths") {
    // "ab cdef" → (2+4)/2 = 3.0
    assert(one[Double](avgWordLen(col("t")), "ab cdef") == 3.0)
  }

  test("langIdHeuristic picks dominant marker language, priority on ties") {
    assert(one[String](langIdHeuristic(col("t")), "the cat and the dog") == "en")
    assert(one[String](langIdHeuristic(col("t")), "le chat et la mer") == "fr")
    assert(one[String](langIdHeuristic(col("t")), "el perro y los gatos") == "es")
    assert(one[String](langIdHeuristic(col("t")), "der hund und die katze") == "de")
    assert(one[String](langIdHeuristic(col("t")), "xyzzy qwerty") == "und")
  }

  test("fingerprint is invariant to case and whitespace, not content") {
    val a = one[String](fingerprint(col("t")), "Hello   World")
    val b = one[String](fingerprint(col("t")), "hello world")
    val c = one[String](fingerprint(col("t")), "hello there")
    assert(a == b)
    assert(a != c)
  }

  test("shingles: distinct word n-grams; short docs yield empty array") {
    val r = arr(shingles(col("t"), 3), "a b c d")
    assert(r == Seq("a b c", "b c d"))
    assert(arr(shingles(col("t"), 3), "a b").isEmpty)
  }

  test("minhash signature has k components and is deterministic") {
    val c = minhashSignature(shingles(col("t"), 2), 8)
    val r1 = arr(c, "a b c d e")
    val r2 = arr(c, "a b c d e")
    assert(r1.length == 8)
    assert(r1 == r2)
  }

  test("lshBands: identical docs share all band keys, disjoint docs none") {
    val sig = minhashSignature(shingles(col("t"), 2), 12)
    val bandsC = lshBands(sig, 4, 3)
    val x = arr(bandsC, "a b c d e f")
    val y = arr(bandsC, "a b c d e f")
    val z = arr(bandsC, "q r s t u v")
    assert(x == y && x.length == 4)
    assert(x.intersect(z).isEmpty)
  }

  test("rollingHash is order-sensitive; md5 fingerprint is not") {
    val ab = one[Long](rollingHash(col("t")), "alpha beta")
    val ba = one[Long](rollingHash(col("t")), "beta alpha")
    val ab2 = one[Long](rollingHash(col("t")), "Alpha  Beta") // normalized
    assert(ab != ba)
    assert(ab == ab2)
    assert(one[Long](rollingHash(col("t")), "") == 0L)
  }

  test("bpeTokenCount splits letter runs, digit runs, and single symbols") {
    // hello | , | world | 42 | !
    assert(one[Int](bpeTokenCount(col("t")), "hello, world42!") == 5)
    assert(one[Int](bpeTokenCount(col("t")), "") == 0)
    assert(one[Int](bpeTokenCount(col("t")), "abc def") == 2)
  }

  test("qualityScore is in [0,1] and higher for natural prose") {
    val prose = "the quick brown fox jumps over the lazy dog and runs to the forest"
    val junk = "..... ,,,,, !!!!!"
    val p = one[Double](qualityScore(col("t")), prose)
    val j = one[Double](qualityScore(col("t")), junk)
    assert(p >= 0.0 && p <= 1.0 && j >= 0.0 && j <= 1.0)
    assert(p > j)
  }

  test("LmScore.scoreDocs matches a hand-computed bigram model") {
    // corpus: "a b a b" + "a b c" → c("a b")=3, c("b a")=1, c("b c")=1;
    // contexts: c_ctx(a)=3, c_ctx(b)=2.
    //   doc 1: nll = (2·ln(3/3) + 1·ln(2/1)) / 3 = ln2/3 ≈ 0.231049
    //   doc 2: nll = (ln(3/3) + ln(2/1)) / 2 = ln2/2 ≈ 0.346574
    // doc 3 has one token → no bigrams → absent from the output
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = graft.text.LmScore.scoreDocs(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - math.log(2.0) / 3) < 1e-6)
    assert(got(2L)._1 == 2L)
    assert(math.abs(got(2L)._2 - math.log(2.0) / 2) < 1e-6)
  }

  test("script counts and dominantScript classify mixed-script text") {
    import spark.implicits._
    import graft.text.TextFunctions._
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "hello world"),            // pure latin
      (2L, "привет мир"),             // pure cyrillic
      (3L, "你好世界"),                // pure cjk
      (4L, "مرحبا"),                  // pure arabic
      (5L, "hello привет"),           // 5 latin < 6 cyrillic → cyrillic
      (6L, "12345 !!!")               // no letters → unknown
    ).toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        latinCount(col("text")).as("lat"),
        cyrillicCount(col("text")).as("cyr"),
        cjkCount(col("text")).as("cjk"),
        arabicCount(col("text")).as("ara"),
        dominantScript(col("text")).as("script"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getString(5)))).toMap
    assert(got(1L) == ((10, 0, 0, 0, "latin")))
    assert(got(2L) == ((0, 9, 0, 0, "cyrillic")))
    assert(got(3L) == ((0, 0, 4, 0, "cjk")))
    assert(got(4L) == ((0, 0, 0, 5, "arabic")))
    assert(got(5L) == ((5, 6, 0, 0, "cyrillic")))
    assert(got(6L) == ((0, 0, 0, 0, "unknown")))
  }

  test("importanceWeights ranks target-like raw docs first") {
    import spark.implicits._
    val target = (1L to 20L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (101L, "the cat sat on the mat again"),   // shares target bigrams
      (102L, "zz qq xx ww vv uu tt ss"),        // alien distribution
      (103L, "the dog sat on the mat")          // partial overlap
    ).toDF("doc_id", "text")
    val w = graft.text.LmScore.importanceWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(101L) > w(103L) && w(103L) > w(102L), w.toString)
  }

  test("LmScore ranks repetitive text as more probable than shuffled text") {
    // the filter property: under a model trained on mostly-regular text,
    // a document of unseen-order tokens scores a higher avg nll
    import spark.implicits._
    val regular = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val weird = Seq((99L, "mat the on sat cat the"))
    val docs = (regular ++ weird).toDF("doc_id", "text")
    val nll = graft.text.LmScore.scoreDocs(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(99L) > nll(1L))
  }
}
