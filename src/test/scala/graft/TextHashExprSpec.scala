package graft

import graft.functions.TextHashExpressions._
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** The native hash expressions must be bit-identical to their HOF
  * (built-in-composed) twins in TextFunctions — the twins define the
  * DuckDB-oracle semantics.
  */
class TextHashExprSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g a b c d e f g",
    "single",
    "x y z").toDF("t")

  test("wordShingles == TextFunctions.shingles") {
    val cmp = docs.select(
      wordShingles(TextFunctions.tokens(col("t")), 3).as("native"),
      TextFunctions.shingles(col("t"), 3).as("hof")).collect()
    cmp.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("minhashSig == TextFunctions.minhashSignature") {
    val sh = TextFunctions.shingles(col("t"), 2)
    val cmp = docs.filter(size(sh) > 0).select(
      minhashSig(sh, 12).as("native"),
      TextFunctions.minhashSignature(sh, 12).as("hof")).collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("empty shingle array: non-null signature, lshBandKeys doesn't NPE, parity holds") {
    // "single" and "x y z" yield zero 4-shingles — legal public-SQL input.
    val sh = TextFunctions.shingles(col("t"), 4)
    val cmp = docs.filter(size(sh) === 0).select(
      minhashSig(sh, 6).as("native"),
      TextFunctions.minhashSignature(sh, 6).as("hof"),
      lshBandKeys(sh, 3, 2).as("bands")).collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      val native = r.getSeq[String](0)
      assert(native.forall(_ != null))
      assert(native == r.getSeq[String](1))
      val bands = r.getSeq[String](2)
      assert(bands.length == 3 && bands.forall(_ != null))
    }
  }

  test("lshBandKeys == TextFunctions.lshBands ∘ minhashSignature") {
    val sh = TextFunctions.shingles(col("t"), 2)
    val cmp = docs.filter(size(sh) > 0).select(
      lshBandKeys(sh, 4, 3).as("native"),
      TextFunctions.lshBands(TextFunctions.minhashSignature(sh, 12), 4, 3)
        .as("hof")).collect()
    cmp.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("textStats == HOF tokenCount/avgWordLen/fingerprint on tricky inputs") {
    val tricky = Seq(
      "the quick brown fox", " \t leading  and\ttrailing \t ",
      "UPPER Case MiXeD", "único über naïve café", "", "   ",
      "a", "punct. heavy, text! here?").toDF("t")
    val cmp = tricky.select(
      textStats(col("t")).as("ts"),
      TextFunctions.tokenCount(col("t")).as("nt"),
      TextFunctions.avgWordLen(col("t")).as("awl"),
      TextFunctions.fingerprint(col("t")).as("fp")).collect()
    cmp.foreach { r =>
      val ts = r.getStruct(0)
      assert(ts.getInt(0) == r.getInt(1), s"n_tokens mismatch: $r")
      assert(math.abs(ts.getDouble(1) -
        BigDecimal(ts.getDouble(1)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) >= 0 &&
        math.abs(BigDecimal(ts.getDouble(1)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble - r.getDouble(2)) < 1e-12,
        s"avg_word_len mismatch: $r")
      assert(ts.getString(2) == r.getString(3), s"fp mismatch: $r")
    }
  }

  test("langQualityProfile derivations == HOF qualityScore/langIdHeuristic/" +
    "tokenCount on tricky inputs") {
    val tricky = Seq(
      "the quick brown fox and the lazy dog in a field of rye",
      "le chat et la souris dans les des un jardin",
      "el que los y de un dia", "der die und das ein zu haus",
      "un mot", // "un" counts for BOTH fr and es — the overlap case
      " \t tabs\tand\nnewlines  vertical \f feed \r cr ",
      "UPPER Case MiXeD tHe AnD", "único über naïve café à côté",
      "", "   ", "a", "punct. heavy, text! here? lots; of: marks....",
      "....,,,!!!???", "𝕬 non-bmp 𝖙𝖊𝖝𝖙 the and of",
      "the the the the the and and of to a in").toDF("t")
    val cmp = tricky.select(
      TextFunctions.textProfile(col("t")).as("p"),
      TextFunctions.qualityFromProfile(
        TextFunctions.textProfile(col("t"))).as("q_prof"),
      TextFunctions.langIdFromProfile(
        TextFunctions.textProfile(col("t"))).as("l_prof"),
      TextFunctions.tokenCount(col("t")).as("nt"),
      TextFunctions.qualityScore(col("t")).as("q_hof"),
      TextFunctions.langIdHeuristic(col("t")).as("l_hof"),
      length(col("t")).as("len"),
      (length(col("t")) - length(regexp_replace(col("t"), "[.,!?;:]", "")))
        .as("np")).collect()
    cmp.foreach { r =>
      val p = r.getStruct(0)
      assert(p.getInt(2) == r.getInt(3), s"n_tokens mismatch: $r")
      assert(r.getDouble(1) == r.getDouble(4), s"quality mismatch: $r")
      assert(r.getString(2) == r.getString(5), s"lang mismatch: $r")
      assert(p.getInt(0) == r.getInt(6), s"n_chars mismatch: $r")
      assert(p.getInt(1) == r.getInt(7), s"n_punct mismatch: $r")
    }
  }

  test("simhash60 is deterministic, content-sensitive, and 60-bit") {
    val h = docs.select(simhash60(TextFunctions.tokens(col("t"))).as("h"))
      .collect().map(_.getLong(0))
    assert(h.distinct.length == h.length)      // distinct docs → distinct hashes
    assert(h.forall(v => v >= 0 && v < (1L << 60)))
    val h2 = docs.select(simhash60(TextFunctions.tokens(col("t"))).as("h"))
      .collect().map(_.getLong(0))
    assert(h.toSeq == h2.toSeq)
  }

  test("simhash60Tail reads the OTHER md5 half; driver-side vote parity") {
    import graft.functions.TextHashExpressions.simhash60Tail
    val head = docs.select(simhash60(TextFunctions.tokens(col("t"))).as("h"))
      .collect().map(_.getLong(0))
    val tail = docs.select(simhash60Tail(TextFunctions.tokens(col("t"))).as("h"))
      .collect().map(_.getLong(0))
    assert(tail.forall(v => v >= 0 && v < (1L << 60)))
    assert(head.toSeq != tail.toSeq, "tail must differ from head half")
    // driver-side reference: md5 hex digits 16-30, strict-majority vote
    def ref(tokens: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](60)
      tokens.foreach { tk =>
        val hex = md.digest(tk.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        for (d <- 0 until 15) {
          val v = Integer.parseInt(hex.charAt(15 + d).toString, 16)
          for (b <- 0 until 4)
            votes(d * 4 + b) += (v >> (3 - b)) & 1
        }
      }
      (0 until 60).foldLeft(0L)((h, b) =>
        if (votes(b) * 2 > tokens.size) h | (1L << (59 - b)) else h)
    }
    val texts = docs.select(col("t")).collect().map(_.getString(0))
    val want = texts.map(t =>
      ref(t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq))
    assert(tail.toSeq == want.toSeq, "diverged from the driver-side vote")
  }

  test("sortedIntersectCount == size(array_intersect) on sorted inputs") {
    val pairs = Seq(
      (Seq("a", "b", "c", "d"), Seq("b", "d", "e")),
      (Seq("a"), Seq("a")),
      (Seq("a", "b"), Seq("c", "d")),          // disjoint
      (Seq[String](), Seq("a")),                // empty side
      (Seq("x", "y", "z"), Seq("x", "y", "z"))) // identical
    val cmp = pairs.toDF("a", "b").select(
      sortedIntersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    cmp.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
  }

  test("sortedIntersectCount skips null elements instead of NPEing") {
    val df = Seq((Seq(Some("a"), Some("b"), None),
                  Seq(Some("b"), None, Some("z")))).toDF("a", "b")
    val n = df.select(sortedIntersectCount(col("a"), col("b")).as("n"))
      .collect().head.getInt(0)
    assert(n == 1) // only "b" matches; nulls never pair
  }

  test("winnow_fps rejects non-positive k/w at analysis time") {
    val df = Seq(Seq("a", "b", "c")).toDF("t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(winnowFps(col("t"), 3, 0)).collect()
    }
    assert(e.getMessage.contains("w >= 1"), e.getMessage)
  }

  test("nfcNormalize composes decomposed sequences; NFC text passes through") {
    val cases = Seq(
      "café" -> "café",          // e + combining acute → é
      "naïve" -> "naïve",        // i + combining diaeresis → ï
      "plain ascii" -> "plain ascii",       // already NFC: identity
      "café" -> "café")           // precomposed stays put
    val out = cases.map(_._1).toDF("t")
      .select(nfcNormalize(col("t")).as("n")).collect().map(_.getString(0))
    assert(out.toSeq == cases.map(_._2))
    // the fingerprints of decomposed and precomposed forms now agree
    val fps = Seq("café", "café").toDF("t")
      .select(md5(nfcNormalize(col("t")))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("winnowFps == HOF winnowing element-wise (order included)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "one two three"),            // exactly k tokens → 1 gram, ng < w
      (4L, "one two three four five"),  // 3 grams, still ng < w
      (5L, "a b c d e f g h i j k l m n o p"),
      (6L, "xy")                        // under k tokens → filtered out
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val native = rows(graft.dedup.Dedup
      .winnowFingerprints(docs, "text", "doc_id"))
    val hof = rows(graft.dedup.Dedup
      .winnowFingerprintsHof(docs, "text", "doc_id"))
    assert(native == hof) // element-wise, order included
    assert(!native.contains(6L) && !hof.contains(6L))
    assert(native(1L) == native(2L)) // identical docs, identical fps
    assert(native(3L).size == 1)     // sub-window doc keeps its global min
  }

  test("deflateRatio separates boilerplate from high-entropy text") {
    val rng = new scala.util.Random(42)
    val fixtures = Seq(
      "rep"  -> ("lorem ipsum dolor sit amet " * 40),      // pure boilerplate
      "rand" -> Seq.fill(200)(rng.alphanumeric.take(8).mkString).mkString(" "),
      "one"  -> "a",                                        // shorter than any deflate frame
      "empty" -> "")
    val out = fixtures.toDF("k", "t")
      .select(col("k"), deflateRatio(col("t")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("rep") < 0.1, out)      // repetition collapses
    assert(out("rand") > 0.5, out)     // incompressible stays near/above 1
    assert(out("rep") < out("rand"))
    assert(out("one") >= 1.0)          // framing overhead dominates 1 byte
    assert(out("empty") == 1.0)        // defined no-evidence value
    // deterministic across evaluations (ThreadLocal deflater reset works)
    val again = fixtures.toDF("k", "t")
      .select(col("k"), deflateRatio(col("t")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == again)
  }
}
