package graft.text

import org.apache.spark.sql.{Column, SparkSession}

/** Merges-driven byte-pair-encoding token counting — the trainer-accurate
  * replacement for the regex-shaped `TextFunctions.bpeTokenCount`
  * estimate. A BPE tokenizer is fully determined by its ordered merges
  * table (Sennrich et al., ACL'16; the GPT-2 merges.txt format), so
  * counting tokens exactly means replaying those merges per word:
  * decompose to code points, apply each (left, right) rule in priority
  * order as a leftmost non-overlapping adjacent merge, count what
  * remains. The counting itself is the native codegen'd
  * `functions.BpeMergeCount` expression — per row one static JVM call;
  * the merges ride the expression references, not a join.
  *
  * Scale shape: a narrow shuffle-free projection like every text stat
  * here. The merges table is tokenizer state, KBs to ~1 MB — broadcast
  * with the task closure, never a dataset. The committed fixture table
  * (resources/graft/bpe_merges.txt, trained on the documents corpus
  * vocabulary) keeps the oracle cross-checkable; deployments load their
  * tokenizer's real merges via `loadMerges`.
  */
object Bpe {

  /** Parse a GPT-2-style merges listing: one "left right" pair per line
    * in priority order; blank lines and '#' comments skipped.
    */
  def parseMerges(lines: Iterator[String]): Seq[(String, String)] =
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ")
        require(sp.length == 2, s"malformed merge rule '$l' (want 'left right')")
        (sp(0), sp(1))
      }.toSeq

  /** The committed fixture merges (see the resource header for training
    * provenance). */
  lazy val defaultMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "resource graft/bpe_merges.txt missing")
    try parseMerges(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Load a merges table from a lake-resident text file. Reads via
    * wholeTextFiles, NOT spark.read.text: rule priority is line order,
    * and a multi-partition text scan does not guarantee row order.
    * Merges files are small by nature (≤ ~1 MB), so one driver read is
    * the right tool.
    */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] = {
    val files = spark.sparkContext.wholeTextFiles(path).collect()
    require(files.nonEmpty, s"no merges file at $path")
    parseMerges(files.sortBy(_._1).iterator.flatMap(_._2.linesIterator))
  }

  /** Exact BPE token count of a word-token array under `merges`. */
  def bpeMergeCount(tokens: Column,
                    merges: Seq[(String, String)] = defaultMerges): Column =
    graft.functions.TextHashExpressions.bpeMergeCount(tokens, merges)

  /** The BPE pieces themselves, flattened across words in document order
    * — the tokenizer surface a piece→id vocabulary join consumes.
    * `bpeMergeCount` == `size(bpeMergePieces)` by construction (one
    * merge-replay definition serves both).
    */
  def bpeMergePieces(tokens: Column,
                     merges: Seq[(String, String)] = defaultMerges): Column =
    graft.functions.TextHashExpressions.bpeMergeSegment(tokens, merges)

  /** Base single-character symbols for the fixture vocabulary. */
  val defaultBase: Seq[String] =
    "abcdefghijklmnopqrstuvwxyz0123456789".map(_.toString)

  /** The deterministic id space a merges table induces: base symbols
    * first (id = position), then each rule's product in priority order —
    * exactly the vocabulary BPE training itself emits alongside the
    * merges file.
    */
  def vocab(merges: Seq[(String, String)] = defaultMerges,
            base: Seq[String] = defaultBase): Seq[String] =
    base ++ merges.map { case (a, b) => a + b }

  /** One corpus pass → the word-frequency dictionary BPE training runs
    * on. This is the ONLY corpus-sized work in training: the dictionary
    * is vocabulary-sized (≤ ~10⁷ rows at web scale, vs 10¹² corpus
    * tokens), which is exactly how sentencepiece/HF trainers split the
    * problem — aggregate distributed, iterate local. `minCount` drops
    * hapax noise AND bounds the collect for 100-TB vocabularies.
    */
  def wordFrequencies(docs: org.apache.spark.sql.DataFrame, textCol: String,
                      minCount: Long = 1L): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions._
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Classic pair-frequency BPE training (Sennrich et al., ACL'16) over a
    * word-frequency dictionary: each round counts adjacent symbol pairs
    * weighted by word frequency, merges the most frequent pair everywhere
    * (ties → lexicographically smallest (left, right)), and records the
    * rule. Deterministic by construction — the committed fixture
    * resources/graft/bpe_merges.txt is exactly `trainMerges(
    * wordFrequencies(documents, "text"), 32)` on the documents fixture,
    * and BpeSpec pins that reproduction bit-for-bit, closing the loop:
    * trainer → merges → replay (`bpeMergeCount`) → DuckDB refold oracle.
    *
    * Driver-side on purpose: rounds are sequential and the state is the
    * vocabulary-sized segmentation table; distributing the inner loop
    * would shuffle KBs per round. Stops early when no pair reaches
    * `minPairFreq`.
    */
  /** CODEPOINT segmentation — the same unit the native replay
    * (TextHashExpressions.mergeWord) and the DuckDB oracle's
    * substring/length both use. A per-UTF-16-code-unit split would
    * halve astral-plane characters (emoji) into lone surrogates and
    * silently diverge from both the moment a fixture contains one.
    */
  /** UTF-8 byte-order string comparison — DuckDB's default binary
    * collation, and identical to codepoint order (unlike UTF-16
    * code-unit order, which misplaces astral-plane chars).
    */
  private val utf8Order: java.util.Comparator[String] =
    (a: String, b: String) => java.util.Arrays.compare(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def codePointSyms(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  def trainMerges(wordFreqs: Seq[(String, Long)], nMerges: Int,
                  minPairFreq: Long = 2L): Seq[(String, String)] = {
    var segs: Vector[(Vector[String], Long)] =
      wordFreqs.sortBy(_._1).map { case (w, c) =>
        (codePointSyms(w), c)
      }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var done = 0
    var stop = false
    while (done < nMerges && !stop) {
      val pf = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (sym, c) =>
        var i = 0
        while (i < sym.length - 1) {
          val p = (sym(i), sym(i + 1))
          pf(p) = pf.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pf.isEmpty || pf.valuesIterator.max < minPairFreq) stop = true
      else {
        val best = pf.maxBy(_._2)._2
        // ties break to the smallest pair in UTF-8 BYTE order — the
        // collation DuckDB's l ASC, r ASC uses. Java String.compareTo
        // is UTF-16 code-unit order, which disagrees for astral-plane
        // symbols (surrogates sort below high-BMP chars); byte order
        // keeps the trainer and its oracle aligned for any input.
        val p = pf.collect { case (k, v) if v == best => k }
          .min(Ordering.comparatorToOrdering(
            java.util.Comparator
              .comparing((t: (String, String)) => t._1, utf8Order)
              .thenComparing((t: (String, String)) => t._2, utf8Order)))
        merges += p
        val joined = p._1 + p._2
        segs = segs.map { case (sym, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < sym.length) {
            if (i < sym.length - 1 && sym(i) == p._1 && sym(i + 1) == p._2) {
              out += joined; i += 2
            } else { out += sym(i); i += 1 }
          }
          (out.result(), c)
        }
        done += 1
      }
    }
    merges.result()
  }

  /** Trainer token ids: the piece stream mapped through `vocab` (OOV →
    * `oovId`). The literal piece→id map rides the plan — right for
    * vocabularies up to a few thousand entries; a real 50k-entry
    * deployment broadcast-joins a vocab table against the exploded piece
    * stream instead (same ids, one extra narrow join), so the literal
    * stays a fixture convenience, not the scale posture.
    */
  def tokenIds(tokens: Column,
               merges: Seq[(String, String)] = defaultMerges,
               base: Seq[String] = defaultBase, oovId: Int = -1): Column = {
    import org.apache.spark.sql.functions._
    val entries = vocab(merges, base).zipWithIndex
      .flatMap { case (p, i) => Seq(lit(p), lit(i)) }
    val idMap = map(entries: _*)
    transform(bpeMergePieces(tokens, merges),
      p => coalesce(element_at(idMap, p), lit(oovId)))
  }
}
