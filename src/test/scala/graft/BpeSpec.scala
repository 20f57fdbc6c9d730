package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private def count(word: String, merges: Seq[(String, String)]): Int =
    Seq(Seq(word)).toDF("w")
      .select(Bpe.bpeMergeCount(col("w"), merges).as("n"))
      .collect().head.getInt(0)

  test("merges apply in priority order, left to right, non-overlapping") {
    val merges = Seq("a" -> "b", "ab" -> "c")
    assert(count("abc", merges) == 1)   // a+b -> ab, ab+c -> abc
    assert(count("cab", merges) == 2)   // c, ab (rule 2 needs ab BEFORE c)
    assert(count("aab", merges) == 2)   // a, ab
    assert(count("xyz", merges) == 3)   // no rule applies
    // non-overlapping leftmost: aaa under (a,a) -> aa, a
    assert(count("aaa", Seq("a" -> "a")) == 2)
  }

  test("multi-step merges from the committed table segment the fixture vocab") {
    // spark: s+p..., par+k built bottom-up in the committed merges
    val m = Bpe.defaultMerges
    assert(m.nonEmpty && m.contains("s" -> "park"))
    assert(count("spark", m) == 1)
    assert(count("window", m) == 1)
    // a word outside the training vocab still tokenizes (into pieces)
    val pieces = count("sparkle", m)
    assert(pieces >= 2 && pieces <= 7, s"got $pieces")
  }

  test("segmentation pieces reassemble the word and count == size(pieces)") {
    val m = Bpe.defaultMerges
    val df = Seq(Seq("spark", "windows", "zq")).toDF("w")
      .select(Bpe.bpeMergePieces(col("w"), m).as("p"),
        Bpe.bpeMergeCount(col("w"), m).as("n"))
    val row = df.collect().head
    val pieces = row.getSeq[String](0)
    assert(pieces.mkString("") == "sparkwindowszq") // lossless concatenation
    assert(pieces.size == row.getInt(1))
    assert(pieces.head == "spark") // whole-word merge from the table
  }

  test("doc-level count is the sum over words") {
    val m = Bpe.defaultMerges
    val docCount = Seq(Seq("spark", "window", "xyz")).toDF("w")
      .select(Bpe.bpeMergeCount(col("w"), m).as("n")).collect().head.getInt(0)
    assert(docCount == count("spark", m) + count("window", m) + count("xyz", m))
  }

  test("tokenIds maps pieces through the induced vocab; OOV chars get -1") {
    val m = Bpe.defaultMerges
    val v = Bpe.vocab(m)
    assert(v.take(36).forall(_.length == 1) && v.drop(36).size == m.size)
    val ids = Seq(Seq("spark", "a", "é")).toDF("w")
      .select(Bpe.tokenIds(col("w"), m).as("ids"))
      .collect().head.getSeq[Int](0)
    assert(ids.head == v.indexOf("spark")) // whole-word merge product id
    assert(ids(1) == 0)                    // 'a' is base symbol 0
    assert(ids.last == -1)                 // 'é' outside the base alphabet
  }

  test("parseMerges skips comments/blanks and rejects malformed rules") {
    val ok = Bpe.parseMerges(Iterator("# header", "", "a b", "ab c"))
    assert(ok == Seq("a" -> "b", "ab" -> "c"))
    intercept[IllegalArgumentException] {
      Bpe.parseMerges(Iterator("a b c"))
    }
  }

  test("loadMerges preserves file line order") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    val f = java.nio.file.Paths.get(dir, "merges.txt")
    java.nio.file.Files.writeString(f, "e r\nt h\nth e\n")
    assert(Bpe.loadMerges(spark, f.toString) ==
      Seq("e" -> "r", "t" -> "h", "th" -> "e"))
  }

  test("trainMerges: hand-checked pair-frequency rounds and tie-break") {
    // 'ab' pairs: (a,b) freq 3+2=5 beats (b,c) 3 -> first merge (a,b);
    // then (ab,c) 3 beats (c,c)... no cc; second merge (ab,c)
    val wf = Seq(("abc", 3L), ("ab", 2L))
    assert(Bpe.trainMerges(wf, 2) == Seq("a" -> "b", "ab" -> "c"))
    // tie: (a,b) and (c,d) both freq 2 -> lexicographically smallest wins
    val tie = Seq(("ab", 2L), ("cd", 2L))
    assert(Bpe.trainMerges(tie, 1) == Seq("a" -> "b"))
    // stop: no pair reaches minPairFreq
    assert(Bpe.trainMerges(Seq(("ab", 1L)), 5) == Nil)
  }

  test("trainMerges segments by CODEPOINT, never by UTF-16 code unit") {
    // an astral-plane char (U+1D11E, a surrogate pair in UTF-16) must be
    // ONE symbol: with 3 copies of the 2-symbol word the only pair is
    // (clef, x) — a code-unit split would instead produce lone
    // surrogates and merge inside the character, diverging from both
    // the native replay (codepoint-based mergeWord) and the DuckDB
    // oracle (substring() counts codepoints)
    val clef = new String(Character.toChars(0x1D11E))
    val wf = Seq((clef + "x", 3L))
    assert(Bpe.trainMerges(wf, 1) == Seq(clef -> "x"))
    // ties break in UTF-8 BYTE order (DuckDB's collation): U+F900 (BMP,
    // bytes EF A4 80) sorts BELOW the astral clef (bytes F0 9D 84 9E),
    // though UTF-16 code-unit order would say the opposite
    val bmp = "豈"
    val tie = Seq((clef + "a", 2L), (bmp + "b", 2L))
    assert(Bpe.trainMerges(tie, 1) == Seq(bmp -> "b"),
      "tie must resolve in UTF-8 byte order, not UTF-16 code-unit order")
  }

  test("trainer reproduces the committed fixture merges bit-for-bit") {
    // the provenance loop closed: resources/graft/bpe_merges.txt IS
    // trainMerges(wordFrequencies(documents, text), 32) on the sf0.1
    // corpus it was trained on (the resource header's provenance) —
    // trainer -> merges -> replay -> DuckDB refold oracle. sf0.001/sf0.01
    // share the 31-word vocabulary but not the frequency ranking, so the
    // reproduction is pinned at the training scale.
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val trained = Bpe.trainMerges(Bpe.wordFrequencies(docs, "text"), 32)
    assert(trained == Bpe.defaultMerges,
      s"trained ${trained.take(5)}... != committed ${Bpe.defaultMerges.take(5)}...")
  }
}
