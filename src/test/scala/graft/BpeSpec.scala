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
}
