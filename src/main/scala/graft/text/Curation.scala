package graft.text

import graft.text.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond scoring: repetition-based quality
  * signals, PII redaction, and token-window chunking — the remaining
  * standard stages of a training-data pipeline (filter → redact → chunk).
  *
  * Scale design:
  *  - repetitionStats is a pure per-row MAP since round 12 (native
  *    repetition_counts kernel: one O(doc length) hash pass per row) —
  *    zero shuffle at any scale; the explode + two-keyed-aggregation
  *    formulation survives as the parity reference;
  *  - redact is a narrow per-row projection (codegen'd regexp_replace
  *    chain, no UDF, no shuffle);
  *  - chunkTokens is one generate-and-explode projection per doc — output
  *    rows ≈ tokens/stride, no shuffle until whatever consumes the chunks.
  */
object Curation {

  /** Demonstration redaction patterns (regex → replacement tag). Real
    * deployments plug in their vetted pattern lists (and locale-specific
    * phone formats); the patterns here keep to syntax shared by Java and
    * RE2-family engines, so an external SQL engine computes identical
    * redactions.
    */
  val defaultPiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b555-[0-9]{4}\\b" -> "<PHONE>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>")

  /** Replace every match of every pattern (in order) with its tag. */
  def redact(text: Column,
             patterns: Seq[(String, String)] = defaultPiiPatterns): Column =
    patterns.foldLeft(text) { case (c, (re, tag)) =>
      regexp_replace(c, re, tag)
    }

  /** HTML main-content extraction — the first stage of a crawl-data
    * curation funnel (real corpora arrive as markup, not clean text).
    * Readability/boilerpipe-style heuristic (Kohlschütter et al.,
    * WSDM'10 thresholds blocks on words-per-block; this is that rule
    * with deterministic, engine-portable plumbing):
    *
    *  1. drop <script>/<style> blocks and HTML comments wholesale;
    *  2. turn block-level boundaries (<br>, <hr>, and the closers of
    *     p/div/li/h1-6/tr/table/ul/ol/blockquote/title/section/article/
    *     header/footer/nav/td/th) into line breaks;
    *  3. strip every remaining tag to a space (inline tags must not
    *     glue words);
    *  4. decode the ubiquitous entities (&lt; &gt; &quot; &#39; &nbsp;
    *     then &amp; LAST so &amp;lt; stays literal) — after tag
    *     stripping, so a decoded '<' is content, not markup;
    *  5. normalize whitespace per line and DROP LINES UNDER `minWords`
    *     words — the boilerplate cut: nav menus, copyright footers,
    *     button labels and list chrome are short; prose is not.
    *
    * Every step is a codegen'd regexp_replace on patterns in the
    * Java-regex ∩ RE2 common subset, so the operator is one shuffle-free
    * narrow projection here AND re-runnable verbatim by the DuckDB
    * oracle (the q_text_extract twin) — no UDF, no per-line HOF (the
    * short-line cut is a single (?m) multiline pass over the whole doc).
    */
  def extractMainText(html: Column, minWords: Int = 5): Column = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", ""),
      "(?is)<style[^>]*>.*?</style>", ""),
      "(?s)<!--.*?-->", "")
    val lineBroken = regexp_replace(noBlocks,
      "(?i)<(?:br|hr)[^>]*>|</(?:p|div|li|h[1-6]|tr|table|ul|ol|blockquote" +
        "|title|section|article|header|footer|nav|td|th)[^>]*>", "\n")
    val untagged = regexp_replace(lineBroken, "(?s)<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(untagged) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    // collapse intra-line whitespace, trim line edges ((?m)^ | $ catches
    // the single space a collapse can leave at any line boundary,
    // INCLUDING string start/end, where a \n-adjacency pattern would
    // miss), then erase lines with fewer than minWords space-separated
    // words and squeeze the leftover blank lines
    val normLines = regexp_replace(regexp_replace(decoded,
      "[ \t\r\f]+", " "), "(?m)^ | $", "")
    val pruned =
      if (minWords == 1) normLines
      else regexp_replace(normLines,
        s"(?m)^(?:\\S+(?: \\S+){0,${minWords - 2}})?$$", "")
    trim(regexp_replace(pruned, "\n+", "\n"), " \n")
  }

  /** Matches of one pattern in `text` (regexp_count is codegen'd). */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** Gopher-style repetition signals per document: total tokens, the most
    * frequent token's share, and the duplicate-bigram share — the
    * signals that catch boilerplate/keyword-stuffed documents that
    * length/punctuation scoring misses. `is_repetitive` flags docs over
    * either threshold, but only at `minTokensForFlag` tokens and above:
    * the shares are meaningless on very short docs (every all-distinct
    * 3-token title has top share 1/3), which is why Gopher-style rules
    * apply length floors before repetition cuts.
    *
    * Docs with an empty token list are dropped (no signal to compute);
    * single-token docs report dup_bigram_frac 0.
    */
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String,
                      topTokenThreshold: Double = 0.3,
                      dupBigramThreshold: Double = 0.08,
                      minTokensForFlag: Int = 5): DataFrame =
    // The signals are per-DOCUMENT, so since round 12 this is a pure
    // map: the native repetition_counts kernel computes all four count
    // inputs in one pass per row — zero exchanges, where the shuffled
    // formulation below (kept as parity reference) paid an id
    // repartition, two keyed aggregations and a join. Kernel references
    // inline per consuming field (the accepted q_text_stats trade — the
    // kernel is O(doc length)).
    docs.select(col(idCol).as("id"),
        graft.functions.TextHashExpressions
          .repetitionCounts(tokens(col(textCol))).as("rc"))
      .filter(col("rc.n_tokens") > 0)
      .select(
        col("id"),
        col("rc.n_tokens").as("n_tokens"),
        round(col("rc.top_cnt").cast("double") / col("rc.n_tokens"), 6)
          .as("top_token_frac"),
        round((col("rc.n_bigrams") - col("rc.n_distinct")).cast("double") /
          greatest(col("rc.n_bigrams"), lit(1L)), 6)
          .as("dup_bigram_frac"))
      .withColumn("is_repetitive",
        (col("n_tokens") >= minTokensForFlag &&
          (col("top_token_frac") > topTokenThreshold ||
            col("dup_bigram_frac") > dupBigramThreshold)).cast("int"))

  /** The shuffled formulation repetitionStats replaced — kept as the
    * independently-implemented parity reference for the native kernel
    * (CurationSpec asserts frame equality on the fixture), the
    * stripSelfRepeatsShuffled pattern.
    */
  private[graft] def repetitionStatsShuffled(docs: DataFrame, textCol: String,
                                             idCol: String,
                                             topTokenThreshold: Double = 0.3,
                                             dupBigramThreshold: Double = 0.08,
                                             minTokensForFlag: Int = 5): DataFrame = {
    val t = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .filter(size(col("w")) > 0)
      .repartition(col("id"))
    val tokenCounts = t
      .select(col("id"), explode(col("w")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum("c").as("n_tokens"), max("c").as("top_cnt"))
    val bigramCounts = t
      .select(col("id"),
        explode(when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1),
            i => concat_ws(" ",
              element_at(col("w"), i), element_at(col("w"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("bigram"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct("bigram").as("n_distinct"))
    tokenCounts.join(bigramCounts, Seq("id"), "left")
      .select(
        col("id"),
        col("n_tokens"),
        round(col("top_cnt").cast("double") / col("n_tokens"), 6)
          .as("top_token_frac"),
        coalesce(
          round((col("n_bigrams") - col("n_distinct")).cast("double") /
            greatest(col("n_bigrams"), lit(1L)), 6), lit(0.0))
          .as("dup_bigram_frac"))
      .withColumn("is_repetitive",
        (col("n_tokens") >= minTokensForFlag &&
          (col("top_token_frac") > topTokenThreshold ||
            col("dup_bigram_frac") > dupBigramThreshold)).cast("int"))
  }

  /** Overlapping token-window chunks per document — the pretraining/RAG
    * chunker: windows of `chunkSize` tokens starting every `stride`
    * tokens (overlap = chunkSize - stride). The final window may be
    * shorter; a document shorter than one window yields a single chunk.
    * Emits (id, chunk_idx, n_chunk_tokens, chunk_fp) where chunk_fp is
    * the md5 of the space-joined window (chunk text itself is
    * reconstructable and usually not worth materializing ×overlap).
    */
  def chunkTokens(docs: DataFrame, textCol: String, idCol: String,
                  chunkSize: Int = 20, stride: Int = 16): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      s"chunkSize ($chunkSize) and stride ($stride) must be positive")
    require(stride <= chunkSize,
      s"stride ($stride) > chunkSize ($chunkSize) would silently drop the " +
        "tokens between consecutive windows; a chunker must cover the stream")
    docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("id"), posexplode(
        transform(sequence(lit(0), size(col("w")) - 1, lit(stride)),
          s => struct(
            size(slice(col("w"), s + 1, lit(chunkSize)))
              .as("n_chunk_tokens"),
            md5(concat_ws(" ", slice(col("w"), s + 1, lit(chunkSize))))
              .as("chunk_fp"))))
        .as(Seq("chunk_idx", "ch")))
      .select(col("id"), col("chunk_idx"),
        col("ch.n_chunk_tokens").as("n_chunk_tokens"),
        col("ch.chunk_fp").as("chunk_fp"))
  }

  /** Tokenizer-budget curve: for each coverage target, the smallest
    * frequency-ranked vocabulary whose cumulative token share reaches it
    * — the sizing question every tokenizer build answers before training
    * ("how many entries cover 99% of the stream?").
    *
    * One explode → token-count aggregation (map-side partials, linear
    * shuffle), then global rank and cumulative count over the
    * VOCABULARY — since round 12 via DistributedRank.globalPositions
    * (two-phase range-sorted positions + prefix-summed offsets), so no
    * single-task `Window.orderBy` stage remains even when a web-scale
    * vocabulary (Heaps' law at 100 TB) outgrows one executor. Coverage
    * is exact integer cum/total, so both engines agree bit-for-bit;
    * rank ties break by token string.
    */
  def vocabCoverage(docs: DataFrame, textCol: String = "text",
                    targets: Seq[Double] = Seq(0.5, 0.75, 0.9, 0.95, 0.99))
      : DataFrame = {
    require(targets.nonEmpty && targets.forall(t => t > 0 && t <= 1.0),
      s"coverage targets must be in (0, 1]: $targets")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val ranked = graft.operators.DistributedRank
      .globalPositions(counts, Seq(col("c").desc, col("tok")), sumCol = "c")
      // int like the row_number it replaces (schema parity with the
      // oracle compare; a >2^31-entry vocab would outgrow it either way)
      .withColumn("rank", col("pos").cast("int"))
      .crossJoin(broadcast(counts.agg(sum("c").as("total"))))
      .withColumn("coverage", col("cum").cast("double") / col("total"))
    ranked.join(broadcast(targets.toDF("target")),
        col("coverage") >= col("target"))
      .groupBy("target")
      .agg(min("rank").as("vocab_size"),
        round(min_by(col("coverage"), col("rank")), 6).as("coverage"))
      .orderBy("target")
  }
}
