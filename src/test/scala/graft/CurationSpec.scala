package graft

import graft.text.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("repetitionStats: hand-computed token and bigram shares") {
    val docs = Seq(
      (1L, "a a a a b"),        // top a: 4/5; bigrams (a a)×3,(a b) → dup 2/4
      (2L, "x y z"),            // all distinct: top 1/3, dup 0
      (3L, "only"),             // single token: no bigrams → dup 0
      (4L, "  "),               // empty after tokenize → dropped
      (5L, "v w x y z q r s")   // 8 varied tokens: clean long doc
    ).toDF("doc_id", "body")
    val got = Curation.repetitionStats(docs, "body", "doc_id")
      .orderBy("id").collect()
    assert(got.length == 4)
    val d1 = got(0)
    assert(d1.getAs[Long]("n_tokens") == 5L)
    assert(d1.getAs[Double]("top_token_frac") == 0.8)
    assert(d1.getAs[Double]("dup_bigram_frac") == 0.5)
    assert(d1.getAs[Int]("is_repetitive") == 1)
    val d2 = got(1)
    assert(d2.getAs[Double]("top_token_frac") == 0.333333)
    assert(d2.getAs[Double]("dup_bigram_frac") == 0.0)
    // 1/3 > 0.3 but the doc sits under the length floor: a 3-token title
    // is not "repetitive" no matter its shares
    assert(d2.getAs[Int]("is_repetitive") == 0)
    val d3 = got(2)
    assert(d3.getAs[Long]("n_tokens") == 1L)
    assert(d3.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(d3.getAs[Double]("top_token_frac") == 1.0)
    assert(d3.getAs[Int]("is_repetitive") == 0)
    val d5 = got(3)
    assert(d5.getAs[Int]("is_repetitive") == 0) // long AND clean
  }

  test("repetitionStats native kernel matches the shuffled formulation") {
    // parity on the real fixture plus the hand-case shapes (repetitive,
    // all-distinct, single-token, dropped-empty); the kernel must also
    // leave the operator exchange-free
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .unionByName(Seq(
        (910001L, "a a a a b"),
        (910002L, "x y z"),
        (910003L, "only"),
        (910004L, "  ")).toDF("doc_id", "text"))
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
    val fast = Curation.repetitionStats(docs, "text", "doc_id")
      .collect().map(key).toMap
    val ref = Curation.repetitionStatsShuffled(docs, "text", "doc_id")
      .collect().map(key).toMap
    assert(fast.keySet == ref.keySet)
    val diff = fast.keys.filter(k => fast(k) != ref(k))
    assert(diff.isEmpty,
      s"native/shuffled divergence: " +
        diff.take(3).map(k => s"$k fast=${fast(k)} ref=${ref(k)}").mkString("; "))
    val plan = Curation.repetitionStats(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetitionStats must be a pure map, found exchange in:\n${plan.take(800)}")
  }

  test("redact replaces every email/phone/ip occurrence with its tag") {
    val df = Seq(
      "mail a@b.co and c.d@e.org plus 555-1234 at 10.0.0.1 twice 555-0000"
    ).toDF("t")
    val r = df.select(Curation.redact($"t").as("r")).collect()(0).getString(0)
    assert(r == "mail <EMAIL> and <EMAIL> plus <PHONE> at <IP> twice <PHONE>")
    val counts = df.select(
      Curation.piiCount($"t", Curation.defaultPiiPatterns(0)._1).as("e"),
      Curation.piiCount($"t", Curation.defaultPiiPatterns(1)._1).as("p"),
      Curation.piiCount($"t", Curation.defaultPiiPatterns(2)._1).as("i"))
      .collect()(0)
    assert(counts.getInt(0) == 2 && counts.getInt(1) == 2 && counts.getInt(2) == 1)
    // clean text passes through untouched
    val clean = Seq("no pii here at all").toDF("t")
      .select(Curation.redact($"t")).collect()(0).getString(0)
    assert(clean == "no pii here at all")
  }

  test("chunkTokens: window starts, lengths and final short chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b")                                      // shorter than one window
    ).toDF("doc_id", "body")
    val got = Curation.chunkTokens(docs, "body", "doc_id",
        chunkSize = 4, stride = 3)
      .orderBy("id", "chunk_idx").collect()
    // doc 1: starts 0,3,6,9 → lens 4,4,4,1 ; doc 2: one chunk of 2
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq == Seq(
      (1L, 0, 4), (1L, 1, 4), (1L, 2, 4), (1L, 3, 1), (2L, 0, 2)))
    // overlapping windows have distinct fingerprints; fp is md5 of the
    // space-joined window (hand-check the first one)
    val fp0 = got(0).getString(3)
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("w1 w2 w3 w4".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(fp0 == want)
    assert(got.map(_.getString(3)).distinct.length == got.length)
  }

  test("chunkTokens rejects non-positive sizes") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "body")
    intercept[IllegalArgumentException] {
      Curation.chunkTokens(docs, "body", "doc_id", chunkSize = 0, stride = 3)
    }
    intercept[IllegalArgumentException] {
      Curation.chunkTokens(docs, "body", "doc_id", chunkSize = 4, stride = 0)
    }
    // stride > chunkSize would leave inter-window gaps uncovered
    intercept[IllegalArgumentException] {
      Curation.chunkTokens(docs, "body", "doc_id", chunkSize = 4, stride = 5)
    }
  }

  test("vocabCoverage matches a hand-ranked vocabulary") {
    // tokens a×3 b×2 c×1, total 6: rank 1 covers 3/6 = 0.5, rank 2
    // covers 5/6 ≈ 0.833333, rank 3 covers 1.0
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Curation.vocabCoverage(docs, targets = Seq(0.5, 0.8, 1.0))
      .collect()
      .map(r => r.getDouble(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got(0.5) == (1, 0.5))
    assert(got(0.8) == (2, 0.833333))
    assert(got(1.0) == (3, 1.0))
    // round 12: rank + cumsum run through DistributedRank's two-phase
    // range sort — the single-partition vocabulary WINDOW must not
    // reappear (Heaps' law makes it unbounded at corpus scale). The
    // ungrouped total-sum aggregate legitimately reduces through a
    // SinglePartition exchange (one partial row per partition), so the
    // guard is specifically: no Window consumes one.
    val lines = Curation.vocabCoverage(docs, targets = Seq(0.5))
      .queryExecution.executedPlan.toString.linesIterator.toSeq
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val consumers = lines.slice(math.max(0, i - 3), i).mkString("\n")
        assert(!consumers.contains("Window"),
          s"vocabCoverage regressed to a single-partition window:\n$consumers")
      }
  }

  test("vocabCoverage rejects out-of-range targets") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Curation.vocabCoverage(docs, targets = Seq(0.5, 1.5))
    }
    intercept[IllegalArgumentException] {
      Curation.vocabCoverage(docs, targets = Seq.empty)
    }
  }

  private def extract(html: String, minWords: Int = 5): String =
    Seq(html).toDF("h")
      .select(Curation.extractMainText(col("h"), minWords).as("x"))
      .collect().head.getString(0)

  test("extractMainText keeps prose paragraphs, drops nav/footer chrome") {
    val html =
      """<html><head><title>My Page</title>
        |<style>p { color: red; }</style>
        |<script>if (1 < 2) { document.write("<p>fake para</p>"); }</script>
        |</head><body>
        |<nav><a href="/">Home</a> <a href="/a">About</a></nav>
        |<!-- ad slot -->
        |<p>This is the first real paragraph with enough words to keep.</p>
        |<ul><li>One</li><li>Two</li></ul>
        |<p>And here is a second paragraph that also clears the bar.</p>
        |<footer>&copy; 2026 Example Corp</footer>
        |</body></html>""".stripMargin
    assert(extract(html) ==
      "This is the first real paragraph with enough words to keep.\n" +
        "And here is a second paragraph that also clears the bar.")
  }

  test("extractMainText decodes entities after tag stripping") {
    val html = "<p>x &lt;tag&gt; stays &amp; costs &quot;5&quot; &#39;here&#39;</p>"
    assert(extract(html) == "x <tag> stays & costs \"5\" 'here'")
    // &amp;lt; decodes the amp only — stays a literal &lt;
    val dbl = "<p>write &amp;lt; for a literal one two three four</p>"
    assert(extract(dbl) == "write &lt; for a literal one two three four")
  }

  test("extractMainText minWords=1 keeps every non-empty line") {
    val html = "<p>solo</p><p>a b</p>"
    assert(extract(html, minWords = 1) == "solo\na b")
  }

  test("extractMainText collapses whitespace and inline tags without gluing") {
    val html = "<p>bold<b>words</b>here   spaced\t\tout one two</p>"
    assert(extract(html) == "bold words here spaced out one two")
  }

  test("extractMainText yields empty string when nothing survives") {
    assert(extract("<nav>Home About</nav><footer>c 2026</footer>") == "")
  }

  test("extractMainText rejects minWords < 1") {
    intercept[IllegalArgumentException] {
      Curation.extractMainText(col("h"), 0)
    }
  }
}
